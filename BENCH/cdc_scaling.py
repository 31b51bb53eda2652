#!/usr/bin/env python
"""CDC scaling probe: the DSv2 change-feed read (executor-side Arrow
multiset diff, sources/datasource.py) timed at two parallelism levels on
the SAME pre-built table — the north_rule's two-cluster-size evidence for
the round's new operator. Work is held identical across core counts
(fixed cdc_buckets), so the ratio isolates scheduling parallelism.

Modes:
  python BENCH/cdc_scaling.py setup <workdir> <n_pages>   # build+merge once
  python BENCH/cdc_scaling.py run   <workdir> <cores>     # timed read

`run` prints ONE JSON line: {"cores", "dsv2_cdc_sec", "dsv2_cdc_rows",
"dsv2_rows_per_sec", "df_cdc_sec", "df_rows_per_sec"} — the DataFrame
feed (JVM exceptAll engine) is timed beside the DSv2 kernel as the
reference point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CDC_BUCKETS = 8  # fixed: identical task decomposition at every core count


def _spark(cores: int):
    from ecommerce_lakehouse_spark.session import get_spark

    return get_spark(f"cdc-scaling-{cores}", cores=cores,
                     shuffle_partitions=cores * 2)


def setup(workdir: str, n_pages: int) -> None:
    from ecommerce_lakehouse_spark.datagen import (
        generate_pages,
        generate_recrawl_delta,
    )
    from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
    from ecommerce_lakehouse_spark.table import IcehouseTable

    spark = _spark(8)
    tbl = IcehouseTable.create(
        spark, f"{workdir}/pages",
        generate_pages(spark, n_pages, seed=7, partitions=16),
    )
    delta = dedup_latest(
        generate_recrawl_delta(
            spark, n_pages, n_new=n_pages // 10, n_recrawl=n_pages // 5,
            seed=7, partitions=16,
        ),
        ["url"], "warc_ts",
    )
    merge_into(tbl, delta, "url", target_file_rows=n_pages // 16)
    meta = {
        "n_pages": n_pages,
        "merge_snapshot": tbl.current_snapshot().snapshot_id,
        "table_gb": round(
            sum(f.size_bytes for f in tbl.live_files()) / 1e9, 3
        ),
    }
    with open(f"{workdir}/meta.json", "w") as fh:
        json.dump(meta, fh)
    print(json.dumps({"setup": meta}), flush=True)


def run(workdir: str, cores: int) -> None:
    from ecommerce_lakehouse_spark.session import warm_python_workers
    from ecommerce_lakehouse_spark.sources.datasource import register
    from ecommerce_lakehouse_spark.table import IcehouseTable

    spark = _spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cores)
    register(spark)
    path = f"{workdir}/pages"

    t0 = time.time()
    n = (
        spark.read.format("icehouse")
        .option("cdc", "true").option("key_cols", "url")
        .option("cdc_buckets", str(CDC_BUCKETS))
        .load(path)
        .count()
    )
    dsv2_sec = time.time() - t0

    tbl = IcehouseTable(spark, path)
    t0 = time.time()
    n_df = tbl.changes(0, cdc=True, key_cols=["url"]).count()
    df_sec = time.time() - t0
    assert n == n_df, (n, n_df)

    print(json.dumps({
        "cores": cores,
        "dsv2_cdc_sec": round(dsv2_sec, 2),
        "dsv2_cdc_rows": n,
        "dsv2_rows_per_sec": round(n / dsv2_sec, 1),
        "df_cdc_sec": round(df_sec, 2),
        "df_rows_per_sec": round(n_df / df_sec, 1),
    }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "setup":
        setup(sys.argv[2], int(sys.argv[3]))
    else:
        run(sys.argv[2], int(sys.argv[3]))
