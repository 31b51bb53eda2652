#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN — extra measurements live
here, per guide §1): per-query repeated noop-sink timings in ONE session,
plus .explain("formatted") dumps for plan evidence.

Usage:
    python bench_extra.py [--plans DIR] [--reps N] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "sessionize",
    "watermark_scan",
    "daily_sales_summary",
    "interval_join_pit",
    "affected_keys_reagg",
    "topk_rank",
    "ltv_segments",
    "hourly_traffic",
    "dedup_latest_wins",
    "scd2_window_chain",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dump explain(formatted) here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from ecommerce_lakehouse_spark.queries import REGISTRY
    from ecommerce_lakehouse_spark.session import get_spark, warm_python_workers

    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, CPUS)

    names = args.queries.split(",") if args.queries else HEADLINE
    out: dict[str, list[float]] = {}
    for name in names:
        fn = REGISTRY[name][0]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
            with open(f"{args.plans}/{name}_{args.suffix}.txt", "w") as fh:
                fh.write(plan)
        fn(spark, SF_DIR).count()  # same warm methodology as bench.py
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench-extra: {name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
