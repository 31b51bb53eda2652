"""Continuous maintenance loop: stream appends -> snapshot-triggered
compaction -> identical scans; crash mid-compaction resumes via the
ledger on the next cycle (VERDICT r02 #8)."""

from __future__ import annotations

import os

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance import MaintenanceLoop
from ecommerce_lakehouse_spark.table import IcehouseTable


def _table_rows(tbl):
    return sorted(
        (r.url, str(r.warc_ts)) for r in tbl.scan().select("url", "warc_ts").collect()
    )


def test_stream_appends_then_loop_compacts(spark, tmp_path):
    """availableNow stream fans small batches into the table; the loop sees
    the new snapshots, compacts, and the scan is unchanged."""
    src_dir = str(tmp_path / "incoming")
    for i in range(4):
        generate_pages(spark, 120, seed=100 + i, partitions=1).write.mode(
            "append"
        ).parquet(src_dir)

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 120, seed=99, partitions=1),
    )
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda batch, bid: tbl.append(batch, txn=("loop-test", bid)))
        .start()
    )
    q.awaitTermination(120)

    before = _table_rows(tbl)
    n_files_before = len(tbl.live_files())
    assert n_files_before >= 5

    loop = MaintenanceLoop(tbl, target_file_bytes=1 << 30)
    assert loop.pending()
    out = loop.run_once()
    assert out["ran"] and out["compacted"]
    assert len(tbl.live_files()) < n_files_before
    assert _table_rows(tbl) == before

    # watermark advanced past the loop's own commit: idle cycle is a no-op
    assert not loop.pending()
    assert loop.run_once() == {"ran": False, "reason": "no new snapshots"}

    # new writer activity retriggers
    tbl.append(generate_pages(spark, 50, seed=200, partitions=1))
    assert loop.pending()


def test_loop_resumes_after_mid_compaction_crash(spark, tmp_path, monkeypatch):
    """Kill the loop after one bin is staged: the next cycle re-runs the same
    deterministic compact job, adopts the staged bin from the ledger, and
    the final scan is identical."""
    import sys

    import ecommerce_lakehouse_spark.maintenance.compact  # noqa: F401

    c = sys.modules["ecommerce_lakehouse_spark.maintenance.compact"]

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 100, seed=300, partitions=1),
    )
    for i in range(5):
        tbl.append(generate_pages(spark, 100, seed=301 + i, partitions=1))
    before = _table_rows(tbl)

    # small bins so the plan has >= 2 bins; crash while rewriting the 2nd
    one_file_bytes = max(f.size_bytes for f in tbl.live_files())
    target = int(one_file_bytes * 2.2)

    calls = {"n": 0}
    real = c._rewrite_bin

    def crashing(table, b, target_bytes, stats_cols, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill mid-compaction")
        return real(table, b, target_bytes, stats_cols, *a, **kw)

    monkeypatch.setattr(c, "_rewrite_bin", crashing)
    loop = MaintenanceLoop(tbl, target_file_bytes=target)
    version_before = tbl.current_version()
    try:
        loop.run_once()
        raised = False
    except RuntimeError:
        raised = True
    assert raised, "expected the simulated crash to propagate"
    # crash before _mark_processed: nothing committed, watermark not advanced
    assert tbl.current_version() == version_before
    assert loop.pending()

    # next cycle: same job id -> ledger adopts the staged bin (the rewrite
    # for bin 1 must NOT run again)
    monkeypatch.setattr(c, "_rewrite_bin", real)
    rewrites_before = calls["n"]
    out = loop.run_once()
    assert out["ran"] and out["compacted"]
    assert _table_rows(tbl) == before
    assert not loop.pending()
    # the adopted bin left its ledger record behind
    jobs = [d for d in os.listdir(os.path.join(tbl.path, "ledger"))
            if d.startswith("compact-")]
    assert jobs


def test_loop_maintains_delete_stack(spark, tmp_path):
    """Round 4: the loop also runs DV maintenance — stacked point deletes
    consolidate and equality deletes convert to positional form, with the
    scan unchanged and writer commits racing in still pending."""
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.table import Predicate, delete_by_key, delete_where

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 400, seed=140, partitions=4),
    )
    urls = [r.url for r in tbl.scan().select("url").orderBy("url").limit(12).collect()]
    for chunk in (urls[:3], urls[3:6], urls[6:8]):
        delete_where(tbl, [Predicate("url", "in", tuple(chunk))])
    delete_by_key(tbl, "url", urls[8:12])
    assert len(tbl.eq_deletes()) == 1
    before = _table_rows(tbl)
    assert len(before) == 388

    loop = MaintenanceLoop(tbl, target_file_bytes=1 << 30, min_dv_files=2)
    out = loop.run_once()
    assert out["ran"] and out.get("deletes_rewritten")
    assert tbl.eq_deletes() == [], "eq deletes must convert to positional"
    reg = tbl.delete_registry()
    assert len({dv for e in reg.values() for dv in e["dvs"]}) <= 2
    assert _table_rows(tbl) == before
    assert tbl.scan().filter(F.col("url").isin(urls)).count() == 0

    # watermark accounting: the loop's own commits don't retrigger work,
    # and a writer commit after the cycle makes it pending again
    assert not loop.pending() or loop.run_once().get("deletes_rewritten") is None
    tbl.append(generate_pages(spark, 10, seed=141, partitions=1))
    assert loop.pending()
