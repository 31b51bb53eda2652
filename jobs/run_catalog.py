#!/usr/bin/env python
"""Catalog-scoped maintenance job — the companion to run_maintenance.py
(which is table-scoped). One run per cadence tick:

1. ``recover()``     — finish phase 2 of any interrupted cross-table txn
2. ``--refresh-pins``— advance every table pin to its live head (opt-in:
                       only needed when writers bypass the catalog)
3. refresh every materialized view (incremental; ``--full`` forces the
                       overwrite path)
4. ``--expire``      — policy-driven snapshot expiry per table
                       (``history.expire.*`` properties; pins protected)
5. ``--fsck``        — metadata-sized integrity sweep per table

Prints ONE JSON metrics line. Submit with the packaged zip:

    spark-submit --py-files dist/ecommerce_lakehouse_spark.zip \\
        jobs/run_catalog.py --catalog /path/to/cat [--refresh-pins] \\
        [--expire] [--fsck] [--full] [--skip-mviews]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--refresh-pins", action="store_true",
                    help="advance every table pin to its live head first")
    ap.add_argument("--skip-mviews", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="force full materialized-view recomputation")
    ap.add_argument("--expire", action="store_true",
                    help="policy-driven snapshot expiry per table")
    ap.add_argument("--fsck", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from ecommerce_lakehouse_spark.table import Catalog

    cat = Catalog(spark, args.catalog)
    out: dict = {"catalog": cat.path}

    out["recovered_txns"] = cat.recover()

    if args.refresh_pins:
        pins = {}
        for name in cat.table_names():
            if cat.table(name).current_snapshot() is not None:
                pins[name] = cat.refresh(name)
        out["pins_refreshed"] = pins

    if not args.skip_mviews:
        mviews = {}
        for name in cat.mview_names():
            t0 = time.time()
            res = cat.refresh_materialized_view(name, full=args.full)
            mviews[name] = {
                "mode": res["mode"],
                "affected": res["affected"],
                "upserted": res["upserted"],
                "deleted": res["deleted"],
                "sec": round(time.time() - t0, 3),
            }
        out["mviews"] = mviews

    if args.expire:
        expired = {}
        for name in cat.table_names():
            r = cat.expire(name)
            expired[name] = {
                "expired_snapshots": len(r.expired_snapshots),
                "freed_bytes": r.freed_bytes,
            }
        out["expire"] = expired

    bad = []
    if args.fsck:
        from ecommerce_lakehouse_spark.table.validate import fsck

        reports = {}
        for name in cat.table_names():
            rep = fsck(cat.table(name))
            reports[name] = rep.to_json()
            if not rep.ok:
                bad.append(name)
        out["fsck"] = reports

    print(json.dumps(out))
    if bad:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
