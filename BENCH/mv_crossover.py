#!/usr/bin/env python
"""Materialized-view refresh crossover: incremental (touched-keys →
key-scoped recompute → keyed merge) vs full recompute (one overwrite), as
a function of source-table size with a FIXED small delta (n/20 recrawls
of one lang).

The incremental path pays ~2 s of fixed cost (keys-only touched scan, 3
metadata-sized actions, a keyed merge) but scales with the DELTA; the
full path has near-zero fixed cost but scans the whole table. This sweep
locates the crossover the same way BENCH/bucket_crossover.py does for
bucketed merge routing.

Usage: python BENCH/mv_crossover.py [sizes_csv] [cores] [partitioned]
``partitioned`` (any truthy 3rd arg) lays the source out identity-
partitioned by the group key (lang): the IN-predicate scope then prunes
the recompute to the affected groups' FILES — the layout a 100-TB MV
source should have.
Emits one JSON line per size.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else
                          "8000,60000,250000,1000000").split(",")]
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
partitioned = len(sys.argv) > 3 and sys.argv[3] not in ("", "0", "false")

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from ecommerce_lakehouse_spark.datagen import (  # noqa: E402
    generate_pages,
    generate_recrawl_delta,
)
from ecommerce_lakehouse_spark.operators.merge import dedup_latest  # noqa: E402
from ecommerce_lakehouse_spark.session import get_spark, warm_python_workers  # noqa: E402
from ecommerce_lakehouse_spark.table import Catalog  # noqa: E402

MV_SQL = (
    "SELECT lang, count(*) AS n_pages, sum(length(text)) AS text_bytes, "
    "max(warc_ts) AS latest_ts FROM pages GROUP BY lang"
)


def run(n: int) -> dict:
    spark = get_spark("mv-crossover", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cores)
    work = tempfile.mkdtemp(prefix="mvx-")
    try:
        cat = Catalog(spark, f"{work}/cat")
        props = (
            {"partition.spec": '[{"transform": "identity", "col": "lang"}]'}
            if partitioned else {}
        )
        cat.create_table(
            "pages", generate_pages(spark, n, seed=42, partitions=cores * 2),
            properties=props,
        )
        table_gb = sum(
            f.size_bytes for f in cat.table("pages").live_files()
        ) / 1e9
        t0 = time.time()
        cat.create_materialized_view("lang_stats", MV_SQL)
        build = time.time() - t0
        delta = dedup_latest(
            generate_recrawl_delta(
                spark, n, n_new=0, n_recrawl=max(200, n // 20),
                seed=42, partitions=cores,
            ).filter("lang = 'de'"),
            ["url"], "warc_ts",
        )
        delta.write.mode("overwrite").parquet(f"{work}/delta")
        delta_rows = spark.read.parquet(f"{work}/delta").count()
        with cat.transaction() as txn:
            txn.merge_into(
                "pages", spark.read.parquet(f"{work}/delta"), ["url"]
            )
        t0 = time.time()
        res = cat.refresh_materialized_view("lang_stats")
        inc = time.time() - t0
        t0 = time.time()
        cat.refresh_materialized_view("lang_stats", full=True)
        full = time.time() - t0
        return {
            "n_pages": n, "partitioned": partitioned,
            "scan_path": res.get("scan_path"),
            "table_gb": round(table_gb, 3),
            "delta_rows": delta_rows, "mv_build_sec": round(build, 2),
            "incremental_sec": round(inc, 2), "full_sec": round(full, 2),
            "affected_groups": res["affected"], "mode": res["mode"],
            "inc_over_full": round(inc / full, 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


for n in sizes:
    print(json.dumps(run(n)), flush=True)
