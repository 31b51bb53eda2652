"""Merge-on-read row-level DELETE via positional deletion vectors —
Iceberg-v2-style DELETE FROM ... WHERE, built from scratch.

Copy-on-write point deletes (MERGE ... WHEN MATCHED DELETE) rewrite every
affected file — at a 100-TB table a GDPR-style deletion of a handful of
rows would rewrite gigabytes. ``delete_where`` instead writes DELETION
VECTORS: parquet sidecars of (file, row_index) positions, registered per
data file in a snapshot-scoped delete registry
(``manifests/deletes-*.json``). Reads apply them as one anti-join
(:meth:`IcehouseTable.read_files`); rewrites (MERGE / compaction /
clustering) read through the same primitive, so when a rewrite replaces a
file its registry entry is dropped in the SAME commit — the deletes are
materialized, never resurrected.

Scale shape: the position scan reads only stats-pruned candidate files and
prunes columns to the predicate columns + hidden ``_metadata`` (the html
payload is never read); the DV sidecars are tiny and counted-broadcast on
read.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from .format import IcehouseTable, Snapshot
from .predicates import Predicate, prune_files
from .stats import file_stats


def delete_where(
    table: IcehouseTable,
    predicates: list[Predicate],
) -> Snapshot | None:
    """Row-level DELETE: mark all rows matching every predicate as deleted
    via positional deletion vectors (no data file is rewritten).

    Returns the new snapshot, or None when nothing matched. Idempotent:
    re-running deletes 0 rows (already-deleted rows are invisible to the
    position scan).
    """
    if not predicates:
        raise ValueError("delete_where without predicates would truncate the "
                         "table; use overwrite for that")
    snap = table.current_snapshot()
    if snap is None:
        return None
    candidates = prune_files(
        table.live_files(snap), table._stats_predicates(predicates)
    )
    if not candidates:
        return None

    # position scan: predicate columns + provenance only — never the payload
    df = table.read_files(candidates, snapshot=snap, with_pos=True)
    for p in predicates:
        df = df.filter(p.to_column())
    matches = df.select(
        F.col("__fname").alias("fname"), F.col("__pos").alias("pos")
    )

    staging = os.path.join(table.path, f"_staging-dv-{uuid.uuid4().hex}")
    # point deletes -> one sidecar; huge deletes keep write parallelism
    matches.coalesce(max(1, len(candidates) // 32)).write.mode(
        "overwrite"
    ).parquet(staging)
    dv_rels: list[str] = []
    per_file_rows: dict[str, int] = {}
    total = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        final_rel = f"data/dv-{uuid.uuid4().hex[:12]}-{name}"
        os.rename(os.path.join(staging, name),
                  os.path.join(table.path, final_rel))
        rows, _size, _stats = file_stats(os.path.join(table.path, final_rel))
        if rows == 0:
            os.unlink(os.path.join(table.path, final_rel))
            continue
        dv_rels.append(final_rel)
        total += rows
    shutil.rmtree(staging, ignore_errors=True)
    if total == 0:
        return None

    # which data files gained positions (bounded by candidate count)
    hit = (
        table.spark.read.parquet(
            *[os.path.join(table.path, r) for r in dv_rels]
        )
        .groupBy("fname").count().collect()
    )
    by_name = {os.path.basename(f.path): f.path for f in candidates}
    for r in hit:
        per_file_rows[by_name[r["fname"]]] = r["count"]

    entries = dict(table.delete_registry(snap))
    for rel, n in per_file_rows.items():
        prev = entries.get(rel, {"dvs": [], "rows": 0})
        entries[rel] = {
            "dvs": list(prev["dvs"]) + dv_rels,
            "rows": prev["rows"] + n,
        }
    dm = table._write_delete_registry(entries)
    return table._commit(
        "delete-rows", [], set(),
        extra_summary={
            "deleted_rows": total,
            "delete_files_touched": len(per_file_rows),
            "delete_vectors_added": len(dv_rels),
        },
        delete_manifest=dm,
    )
