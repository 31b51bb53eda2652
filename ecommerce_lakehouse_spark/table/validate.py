"""Table integrity checker ("fsck"): verify the metadata graph against the
filesystem and itself.

Operational surface a production lakehouse needs before/after migrations,
after a crashed writer, or when an object store "eventually" lost a file:
every check is metadata-sized (manifest walks + os.stat; NO data reads
except the opt-in deep mode's parquet footer probe), so it runs in seconds
on tables whose data is terabytes.

Checks:
- version log: current metadata parses; current_snapshot_id exists;
  snapshot parent links form a tree rooted in the published lineage
- refs: every tag and branch resolves to a live snapshot id
- manifests: every manifest list / manifest file exists and parses;
  per-manifest rollups (n_files/n_rows/n_bytes) match their entries
- data files: every live file exists with the manifest's byte size
- delete registries: every DV sidecar / eq-delete file exists; positional
  entries reference live data files of their snapshot
- deep (opt-in): parquet footer row_count matches the manifest row_count
  for every live file of the CURRENT snapshot (footer-only read)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from .format import IcehouseTable, Snapshot


@dataclass
class FsckReport:
    checked_snapshots: int = 0
    checked_manifests: int = 0
    checked_data_files: int = 0
    checked_delete_files: int = 0
    errors: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors

    def to_json(self) -> dict:
        return {
            "ok": self.ok,
            "checked_snapshots": self.checked_snapshots,
            "checked_manifests": self.checked_manifests,
            "checked_data_files": self.checked_data_files,
            "checked_delete_files": self.checked_delete_files,
            "errors": self.errors,
        }


def fsck(table: IcehouseTable, deep: bool = False) -> FsckReport:
    """Validate the table; returns a report (never raises on corruption —
    callers inspect ``report.ok`` / ``report.errors``)."""
    rep = FsckReport()
    err = rep.errors.append

    try:
        md = table.load_metadata()
    except Exception as e:  # noqa: BLE001 — fsck reports, never raises
        rep.errors.append(f"metadata: cannot load current version: {e}")
        return rep

    snaps = [Snapshot.from_json(s) for s in md.get("snapshots", [])]
    by_id = {s.snapshot_id: s for s in snaps}
    cur = md.get("current_snapshot_id")
    if cur is not None and cur not in by_id:
        err(f"metadata: current_snapshot_id {cur} not in snapshot list")
    for s in snaps:
        if s.parent_id is not None and s.parent_id not in by_id:
            # a pruned ancestor is fine ONLY if nothing walks through it:
            # expire keeps whole retained chains, so a dangling parent that
            # is also unreachable from current/refs is history, not rot
            pass
        if s.parent_id == s.snapshot_id:
            err(f"snapshot {s.snapshot_id}: is its own parent")

    # published chain must be acyclic from current back to its root — a
    # parent id absent from the list is the EXPIRY HORIZON (expire trims
    # ancestors but children keep their parent_id), so it terminates the
    # walk rather than flagging corruption
    seen: set[int] = set()
    node = by_id.get(cur) if cur is not None else None
    while node is not None:
        if node.snapshot_id in seen:
            err(f"snapshot chain: cycle at {node.snapshot_id}")
            break
        seen.add(node.snapshot_id)
        node = by_id.get(node.parent_id) if node.parent_id is not None else None

    for name, sid in table.refs().items():
        if sid not in by_id:
            err(f"tag {name!r}: points at missing snapshot {sid}")
    for name, sid in table.branches().items():
        if sid not in by_id:
            err(f"branch {name!r}: points at missing snapshot {sid}")

    for s in snaps:
        rep.checked_snapshots += 1
        list_path = os.path.join(table.path, s.manifest_list)
        if not os.path.exists(list_path):
            err(f"snapshot {s.snapshot_id}: manifest list missing "
                f"({s.manifest_list})")
            continue
        try:
            entries = table.manifest_entries_of(s)
        except (OSError, json.JSONDecodeError, KeyError) as e:
            err(f"snapshot {s.snapshot_id}: manifest list unreadable: {e}")
            continue
        for e in entries:
            rep.checked_manifests += 1
            mpath = os.path.join(table.path, e["path"])
            if not os.path.exists(mpath):
                err(f"snapshot {s.snapshot_id}: manifest missing "
                    f"({e['path']})")
                continue
            try:
                files = table._read_manifest(e["path"])
            except Exception as exc:  # noqa: BLE001
                err(f"manifest {e['path']}: unreadable: {exc}")
                continue
            if "n_files" in e and e["n_files"] != len(files):
                err(f"manifest {e['path']}: rollup n_files={e['n_files']} "
                    f"but {len(files)} entries")
            if "n_rows" in e and e["n_rows"] != sum(f.row_count for f in files):
                err(f"manifest {e['path']}: rollup n_rows mismatch")
            if "n_bytes" in e and e["n_bytes"] != sum(
                f.size_bytes for f in files
            ):
                err(f"manifest {e['path']}: rollup n_bytes mismatch")
            for f in files:
                rep.checked_data_files += 1
                fpath = os.path.join(table.path, f.path)
                if not os.path.exists(fpath):
                    err(f"snapshot {s.snapshot_id}: data file missing "
                        f"({f.path})")
                elif os.path.getsize(fpath) != f.size_bytes:
                    err(f"data file {f.path}: size "
                        f"{os.path.getsize(fpath)} != manifest "
                        f"{f.size_bytes}")

        if s.delete_manifest:
            live = {f.path for f in table.live_files(s)}
            reg_path = os.path.join(table.path, s.delete_manifest)
            if not os.path.exists(reg_path):
                err(f"snapshot {s.snapshot_id}: delete registry missing "
                    f"({s.delete_manifest})")
            else:
                full = table._read_delete_registry_full(s.delete_manifest)
                for data_rel, entry in full.get("entries", {}).items():
                    if data_rel not in live:
                        err(f"snapshot {s.snapshot_id}: delete entry for "
                            f"non-live file {data_rel}")
                    for dv in entry.get("dvs", []):
                        rep.checked_delete_files += 1
                        if not os.path.exists(os.path.join(table.path, dv)):
                            err(f"snapshot {s.snapshot_id}: DV sidecar "
                                f"missing ({dv})")
                for e in full.get("eq", []):
                    rep.checked_delete_files += 1
                    if not os.path.exists(
                        os.path.join(table.path, e["path"])
                    ):
                        err(f"snapshot {s.snapshot_id}: eq-delete file "
                            f"missing ({e['path']})")

    if deep and rep.ok and cur is not None:
        import pyarrow.parquet as pq

        for f in table.live_files():
            meta = pq.read_metadata(os.path.join(table.path, f.path))
            if meta.num_rows != f.row_count:
                err(f"data file {f.path}: footer rows {meta.num_rows} != "
                    f"manifest {f.row_count}")
    return rep
