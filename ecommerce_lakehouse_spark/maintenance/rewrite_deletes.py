"""Deletion-vector compaction — the DV analog of small-file compaction
(Iceberg's ``rewrite_position_delete_files`` action).

Every ``delete_where`` commit adds sidecar files; a table taking frequent
point deletes accumulates many tiny DVs and every read's anti-join side
grows by one file per delete. This job consolidates all live positions
into fresh sidecars (deduplicated — stacked deletes may overlap), rewrites
the registry, and commits atomically; the old sidecars become unreferenced
and snapshot expiry sweeps them.
"""

from __future__ import annotations

import os
import shutil
import uuid

from ..table.format import IcehouseTable, Snapshot
from ..table.stats import file_stats


def rewrite_delete_vectors(
    table: IcehouseTable,
    min_dv_files: int = 2,
) -> Snapshot | None:
    """Consolidate the current snapshot's deletion-vector sidecars.

    Returns the new snapshot, or None when there is nothing to consolidate
    (no registry, or fewer than ``min_dv_files`` sidecars)."""
    snap = table.current_snapshot()
    if snap is None:
        return None
    full = table.delete_registry_full(snap)
    reg = full["entries"]
    # retire equality-delete entries that no live file can match anymore
    # (every file with added_by <= seq has been rewritten since)
    live = table.live_files(snap)
    kept_eq = [
        e for e in full["eq"]
        if any((f.added_by or 0) <= e["seq"] for f in live)
    ]
    eq_retired = len(full["eq"]) - len(kept_eq)
    if not reg:
        if eq_retired:
            dm = table._write_delete_registry({}, kept_eq)
            return table._commit(
                "rewrite-deletes", [], set(),
                extra_summary={"eq_entries_retired": eq_retired},
                delete_manifest=dm,
                base_delete_manifest=snap.delete_manifest,
            )
        return None
    old_dvs = sorted({dv for e in reg.values() for dv in e["dvs"]})
    if len(old_dvs) < min_dv_files and not eq_retired:
        return None

    positions = (
        table.spark.read.parquet(
            *[os.path.join(table.path, r) for r in old_dvs]
        )
        .select("fname", "pos")
        .distinct()
    )
    staging = os.path.join(table.path, f"_staging-dv-{uuid.uuid4().hex}")
    positions.coalesce(1).write.mode("overwrite").parquet(staging)
    new_dvs: list[str] = []
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        rel = f"data/dv-{uuid.uuid4().hex[:12]}-{name}"
        os.rename(os.path.join(staging, name), os.path.join(table.path, rel))
        rows, _s, _st = file_stats(os.path.join(table.path, rel))
        if rows:
            new_dvs.append(rel)
        else:
            os.unlink(os.path.join(table.path, rel))
    shutil.rmtree(staging, ignore_errors=True)
    if not new_dvs:
        return None

    per_file = {
        r["fname"]: r["count"]
        for r in table.spark.read.parquet(
            *[os.path.join(table.path, r) for r in new_dvs]
        ).groupBy("fname").count().collect()
    }
    by_name = {os.path.basename(rel): rel for rel in reg}
    entries = {
        by_name[fname]: {"dvs": new_dvs, "rows": n}
        for fname, n in per_file.items()
        if fname in by_name
    }
    dm = table._write_delete_registry(entries, kept_eq)
    return table._commit(
        "rewrite-deletes", [], set(),
        extra_summary={
            "dv_files_before": len(old_dvs),
            "dv_files_after": len(new_dvs),
            "dv_rows": sum(per_file.values()),
            "eq_entries_retired": eq_retired,
        },
        delete_manifest=dm,
        base_delete_manifest=snap.delete_manifest,
    )
