#!/usr/bin/env python
"""Cluster entry point: the full maintenance pass over an Icehouse table.

Ship as::

    python package.py                        # -> dist/ecommerce_lakehouse_spark.zip
    spark-submit --py-files dist/ecommerce_lakehouse_spark.zip \
        jobs/run_maintenance.py --table /path/to/pages \
        [--merge-delta /path/to/delta.parquet] [--curve hilbert] \
        [--target-file-mb 128] [--keep-snapshots 2]

Steps (each optional/idempotent, all resumable via the table ledger):
MERGE delta → bin-packing compaction → Z-order/Hilbert clustering →
manifest rewrite → snapshot expiry. Prints one JSON line of metrics.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--merge-delta", default=None, help="parquet path of upsert rows")
    ap.add_argument("--merge-key", default="url")
    ap.add_argument("--curve", default="morton", choices=["morton", "hilbert", "none"])
    ap.add_argument(
        "--cluster-scope", default="full", choices=["full", "incremental"],
        help="incremental = cluster only files added since the last "
        "cluster-* snapshot (daily-OPTIMIZE mode; O(new data), not O(table))",
    )
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument(
        "--delete-ratio", type=float, default=0.3,
        help="rewrite files whose positional-delete ratio reaches this "
             "(<=0 disables); Iceberg rewrite_data_files delete-threshold "
             "analog",
    )
    ap.add_argument(
        "--keep-snapshots", type=int, default=2,
        help="published snapshots to retain; <=0 defers to the table's "
             "history.expire.* retention properties (min-snapshots-to-keep, "
             "max-snapshot-age-ms, max-ref-age-ms)",
    )
    ap.add_argument("--skip-compact", action="store_true")
    ap.add_argument("--skip-expire", action="store_true")
    ap.add_argument(
        "--loop-cycles", type=int, default=0,
        help="run the snapshot-listener maintenance loop for N poll cycles "
        "instead of the one-shot pipeline (0 = one-shot). Each cycle drains "
        "the pending backlog availableNow-style; crash-resume via ledger.",
    )
    ap.add_argument("--loop-poll-sec", type=float, default=2.0)
    ap.add_argument("--branch", default=None,
                    help="run the whole maintenance pass on a BRANCH head "
                         "(write-audit-publish): commits advance the "
                         "branch, main is untouched until --publish")
    ap.add_argument("--publish", action="store_true",
                    help="with --branch: fast-forward/merge the branch "
                         "into main after a clean pass (and --fsck, if "
                         "given, gates it)")
    ap.add_argument("--fsck", action="store_true",
                    help="validate table integrity after maintenance "
                         "(metadata-sized; see table/validate.py)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ecommerce_lakehouse_spark.maintenance import (
        MaintenanceLoop,
        compact,
        expire_snapshots,
        rewrite_delete_vectors,
        rewrite_manifests,
        zorder_by,
    )
    from ecommerce_lakehouse_spark.operators.merge import merge_into
    from ecommerce_lakehouse_spark.table import IcehouseTable

    # on a cluster, master/conf come from spark-submit
    spark = SparkSession.builder.appName("icehouse-maintenance").getOrCreate()
    tbl = IcehouseTable(spark, args.table)
    if args.branch and args.branch not in tbl.branches():
        tbl.create_branch(args.branch)
        metrics["branch_created"] = args.branch
    target = args.target_file_mb * 1024 * 1024
    metrics: dict = {"table": args.table}

    if args.loop_cycles > 0:
        loop = MaintenanceLoop(
            tbl, target_file_bytes=target,
            cluster=args.curve != "none", curve=args.curve,
        )
        metrics["loop"] = loop.run(
            max_cycles=args.loop_cycles, poll_interval_s=args.loop_poll_sec
        )
        print(json.dumps(metrics))
        spark.stop()
        return

    if args.merge_delta:
        t0 = time.time()
        delta = spark.read.parquet(args.merge_delta)
        res = merge_into(tbl, delta, args.merge_key, branch=args.branch)
        metrics["merge"] = {
            "sec": round(time.time() - t0, 2),
            "updated": res.rows_updated,
            "inserted": res.rows_inserted,
            "files_rewritten": res.files_rewritten,
        }

    if not args.skip_compact:
        t0 = time.time()
        snap = compact(
            tbl, target_file_bytes=target, branch=args.branch,
            delete_ratio=args.delete_ratio if args.delete_ratio > 0 else None,
        )
        metrics["compact"] = {
            "sec": round(time.time() - t0, 2),
            "ran": snap is not None,
            **({k: v for k, v in snap.summary.items() if k.startswith("compact")} if snap else {}),
        }

    if args.curve != "none":
        t0 = time.time()
        snap = zorder_by(tbl, curve=args.curve, target_file_bytes=target,
                         scope="full" if args.branch else args.cluster_scope,
                         branch=args.branch)
        metrics["cluster"] = {
            "sec": round(time.time() - t0, 2),
            "ran": snap is not None,
            **(snap.summary if snap else {}),
        }

    # DV maintenance: consolidate positional sidecars, retire spent
    # equality entries (no-op when the table has no delete registry).
    # Branch passes skip main-scoped metadata maintenance.
    if not args.branch:
        dv_snap = rewrite_delete_vectors(tbl)
        if dv_snap is not None:
            metrics["rewrite_deletes"] = dv_snap.summary
        rewrite_manifests(tbl)
    if args.fsck:
        from ecommerce_lakehouse_spark.table.validate import fsck

        rep = fsck(tbl)
        metrics["fsck"] = rep.to_json()
        if not rep.ok:
            print(json.dumps(metrics))
            raise SystemExit(2)
    if args.branch and args.publish:
        # audit passed (fsck, if requested): publish the branch
        tbl.merge_branch(args.branch)
        metrics["published_branch"] = args.branch
    if args.branch and not args.publish:
        metrics["branch"] = {
            "name": args.branch,
            "head": tbl.branches().get(args.branch),
            "rows": tbl.row_count(tbl.branches().get(args.branch)),
        }
    if not args.skip_expire and not (args.branch and not args.publish):
        res = expire_snapshots(
            tbl,
            keep_last=(args.keep_snapshots
                       if args.keep_snapshots > 0 else None),
        )
        metrics["expire"] = {
            "expired": len(res.expired_snapshots),
            "deleted_files": res.deleted_data_files,
            "freed_bytes": res.freed_bytes,
        }

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
