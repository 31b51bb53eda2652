"""Manifest rewrite + manifest-list consolidation.

Each append/merge commit adds a manifest, so a long-lived table accumulates
many small manifests and scan planning degrades to O(#commits) metadata
reads. This job repacks the CURRENT snapshot's manifest set into
≈``target_entries``-sized manifests (optionally sorted by a stats lower
bound so manifests themselves become range-prunable), committed atomically
as a new snapshot with identical data files — the Icehouse analog of
Iceberg's rewrite_manifests action.
"""

from __future__ import annotations

import time

from ..table.format import CommitConflict, IcehouseTable, Snapshot


def rewrite_manifests(
    table: IcehouseTable,
    target_entries: int = 5000,
    sort_by_stat: str | None = None,
    codec: str | None = None,
) -> Snapshot:
    """Consolidate the current snapshot's manifests; data files unchanged.

    ``codec="avro"|"jsonl"`` also migrates the manifest format: the rewritten
    manifests use it and the ``manifest.codec`` property is updated in the
    SAME commit, so every future manifest follows."""
    for attempt in range(10):
        version = table.current_version()
        md = table.load_metadata(version)
        cur = md["current_snapshot_id"]
        snap = next(s for s in md["snapshots"] if s["snapshot_id"] == cur)
        files = table.live_files(Snapshot.from_json(snap))

        if sort_by_stat:
            files.sort(
                key=lambda f: (
                    f.stats.get(sort_by_stat, {}).get("min") is None,
                    f.stats.get(sort_by_stat, {}).get("min"),
                    f.path,
                )
            )
        else:
            files.sort(key=lambda f: f.path)

        entries = []
        for i in range(0, len(files), target_entries):
            chunk = files[i : i + target_entries]
            rel = table._write_manifest(chunk, fmt=codec)
            entries.append(table._manifest_entry(rel, chunk))

        list_rel = table._write_manifest_list(entries)
        new_snap = Snapshot(
            snapshot_id=version + 1,
            parent_id=cur,
            timestamp_ms=int(time.time() * 1000),
            operation="rewrite-manifests",
            manifest_list=list_rel,
            # data files are unchanged, so the deletion-vector registry
            # carries over verbatim — dropping it would resurrect rows
            delete_manifest=snap.get("delete_manifest"),
            summary={
                "manifests_before": len(table.manifests_of(Snapshot.from_json(snap))),
                "manifests_after": len(entries),
                "total_files": len(files),
                "total_rows": sum(f.row_count for f in files),
                "total_bytes": sum(f.size_bytes for f in files),
                "total_manifests": len(entries),
            },
        )
        md["snapshots"] = md["snapshots"] + [new_snap.to_json()]
        md["current_snapshot_id"] = new_snap.snapshot_id
        if codec is not None:
            md["properties"] = {**md.get("properties", {}), "manifest.codec": codec}
        if table._try_publish(version + 1, md):
            return new_snap
        time.sleep(0.01 * (attempt + 1))
    raise CommitConflict("rewrite_manifests: lost commit race repeatedly")
