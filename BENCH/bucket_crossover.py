#!/usr/bin/env python
"""Bucketed-vs-unbucketed point-MERGE crossover sweep (VERDICT r04 #5).

BENCH_r04 showed a bucketed point-merge SLOWER than unbucketed at sf0.1
(3.085 s vs 1.254 s) despite scanning 11/27 vs 13/13 discovery candidates:
at small table sizes the bucketed layout's per-file constants (more, smaller
files to open in discovery + the partitionBy write of the rewrite) dominate
the discovery cut. This sweep measures point-merge wall-clock across table
size × bucket count so PLANS.md can state the crossover, and backs the
adaptive guidance (bucket for tables whose per-bucket file count is large
enough that discovery IO dominates job constants).

Usage: python BENCH/bucket_crossover.py [cores] [sizes_csv] [buckets_csv]
Defaults: 8 cores, sizes 60000,250000,1000000, buckets 0,8,27 (0=unbucketed).
Emits one JSON line per (size, buckets) cell.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(spark, workdir: str, n_pages: int, n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
    from ecommerce_lakehouse_spark.table import IcehouseTable

    d = os.path.join(workdir, f"t-{n_pages}-{n_buckets}")
    props = (
        {"bucket.key": "url", "bucket.n": str(n_buckets)} if n_buckets else None
    )
    t0 = time.time()
    tbl = IcehouseTable.create(
        spark, d, generate_pages(spark, n_pages, seed=77, partitions=16),
        properties=props,
    )
    build_sec = time.time() - t0

    # point delta: 200 existing urls get a new revision (tiny vs the table)
    urls = [
        r.url
        for r in tbl.scan().select("url").distinct().orderBy("url")
        .limit(200).collect()
    ]
    delta = dedup_latest(
        tbl.scan().filter(F.col("url").isin(urls))
        .withColumn("text", F.concat(F.lit("rev "), F.col("text"))),
        ["url"], "warc_ts",
    ).localCheckpoint()

    t0 = time.time()
    res = merge_into(tbl, delta, "url")
    merge_sec = time.time() - t0
    s = tbl.current_snapshot().summary
    out = {
        "n_pages": n_pages,
        "n_buckets": n_buckets,
        "files_total": len(tbl.live_files()),
        "build_sec": round(build_sec, 3),
        "point_merge_sec": round(merge_sec, 3),
        "rows_updated": res.rows_updated,
        "candidates_global": s.get("merge_candidates_global"),
        "candidates_scanned": s.get("merge_candidates_scanned"),
    }
    shutil.rmtree(d, ignore_errors=True)
    return out


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sizes = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                              else "60000,250000,1000000").split(",")]
    buckets = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3
                                else "0,8,27").split(",")]
    from ecommerce_lakehouse_spark.session import get_spark

    spark = get_spark("bucket-crossover", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="bucket-x-")
    try:
        for n in sizes:
            for b in buckets:
                print(json.dumps(run_cell(spark, workdir, n, b)), flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
