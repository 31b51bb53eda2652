"""jobs/run_catalog.py — the catalog-scoped ops tick, driven in-process
(the packaged spark-submit drive is the verify-skill surface; this pins
the same behavior in the suite)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import Catalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_job():
    spec = importlib.util.spec_from_file_location(
        "run_catalog_job", os.path.join(REPO, "jobs", "run_catalog.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_catalog_tick(spark, tmp_path, monkeypatch, capsys):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "pages", generate_pages(spark, 120, seed=7, partitions=2)
    )
    cat.create_materialized_view(
        "mv", "SELECT lang, count(*) AS n FROM pages GROUP BY lang"
    )
    # a DIRECT write: the tick must advance the pin and refresh the MV
    cat.table("pages").append(generate_pages(spark, 30, seed=8, partitions=1))
    job = _load_job()
    monkeypatch.setattr(
        sys, "argv",
        ["run_catalog.py", "--catalog", str(tmp_path / "cat"),
         "--refresh-pins", "--fsck"],
    )
    job.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["recovered_txns"] == []
    assert set(out["pins_refreshed"]) == {"mv", "pages"}
    assert out["mviews"]["mv"]["mode"] == "incremental"
    assert out["mviews"]["mv"]["upserted"] >= 1
    assert all(r["ok"] for r in out["fsck"].values())
    # the tick converged the MV onto the appended state
    mv_total = sum(r["n"] for r in cat.read("mv").collect())
    assert mv_total == cat.read("pages").count() == 150
    # second tick: nothing to do
    job.main()
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["mviews"]["mv"]["mode"] == "noop"
