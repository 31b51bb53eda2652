"""Reference-counted snapshot expiry (VACUUM) — mark-and-sweep over data and
manifest files (the reference's unbuilt Day-20 VACUUM, ``PROGRESS.md:164``,
BRD AC-014 / 7-day retention).

Mark: union of files reachable from RETAINED snapshots (manifest-list →
manifests → data files). Sweep: physically delete data files, manifests and
manifest lists referenced ONLY by expired snapshots, plus orphaned staging
leftovers older than a grace period. Metadata is rewritten through the same
CAS commit path, so expiry is atomic and safe under concurrent readers of
retained snapshots.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from ..table.format import IcehouseTable, Snapshot

# Orphan sweeps may never run with zero grace: a staged-but-uncommitted
# rewrite's outputs look orphaned until the commit lands. 10 minutes is far
# beyond any stage→commit latency, and ``orphan_grace_ms`` is UNCONDITIONALLY
# clamped up to this floor — there is no escape hatch. Tests that pass
# orphan_grace_ms=0 therefore exercise snapshot expiry only; fresh staging
# leftovers survive the sweep by design.
MIN_ORPHAN_GRACE_MS = 10 * 60 * 1000

# Retention-policy table properties (Iceberg history.expire.* analogs),
# consulted when the caller does not pass explicit retention arguments —
# so a fleet-wide default maintenance job honors per-table policies set
# once via IcehouseTable.set_properties:
#   max-snapshot-age-ms  — snapshots older than now − age are expirable
#   min-snapshots-to-keep — published-lineage floor (default 1)
#   max-ref-age-ms       — tags/branches whose HEAD snapshot is older than
#                          now − age are auto-dropped before retention is
#                          computed (a stale branch stops pinning lineage)
PROP_MAX_SNAPSHOT_AGE = "history.expire.max-snapshot-age-ms"
PROP_MIN_SNAPSHOTS = "history.expire.min-snapshots-to-keep"
PROP_MAX_REF_AGE = "history.expire.max-ref-age-ms"


@dataclass
class ExpireResult:
    expired_snapshots: list[int]
    deleted_data_files: int
    deleted_manifests: int
    freed_bytes: int


def expire_snapshots(
    table: IcehouseTable,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
    clean_orphans: bool = True,
    orphan_grace_ms: int = 3_600_000,
    keep_metadata_versions: int = 100,
    protect_ids: "set[int] | None" = None,
    dry_run: bool = False,
) -> ExpireResult:
    """Expire all but the newest ``keep_last`` snapshots (and, if given, any
    snapshot newer than ``older_than_ms`` survives regardless).

    ``dry_run=True`` previews the decision without mutating anything: the
    returned ExpireResult reports the snapshots that WOULD expire and the
    files/bytes that WOULD be reclaimed, but no metadata commit, file
    deletion, orphan sweep, or metadata-log trim happens. The preview is
    conservative: the max-ref-age-ms ref-aging pass (a separate mutation)
    is skipped, so aged refs still pin lineage in the preview — a real run
    may free MORE, never less.
    ``protect_ids`` pins specific snapshots unconditionally — external
    references the table metadata cannot see, e.g. a Catalog's pinned
    snapshot (Catalog.expire passes it automatically).

    Retention POLICIES: when ``keep_last``/``older_than_ms`` are not
    passed, the table's ``history.expire.*`` properties supply them (see
    PROP_* above — explicit arguments always win), and refs older than
    ``max-ref-age-ms`` are auto-dropped first, so one default maintenance
    sweep enforces per-table policy set once via ``set_properties``.

    Orphan-sweep safety: staged outputs of UNFINISHED ledger jobs (a
    compaction/merge mid-rewrite — tracked only in the ledger until their
    final commit) are never swept, and the grace period is clamped to
    MIN_ORPHAN_GRACE_MS so a racing stage→commit window can't be deleted
    out from under a writer that doesn't use the ledger."""
    props = table.properties()
    now_ms = int(time.time() * 1000)
    if PROP_MAX_REF_AGE in props and not dry_run:
        _drop_aged_refs(table, now_ms - int(props[PROP_MAX_REF_AGE]))
    if keep_last is None:
        keep_last = int(props.get(PROP_MIN_SNAPSHOTS, 1))
    if older_than_ms is None and PROP_MAX_SNAPSHOT_AGE in props:
        older_than_ms = now_ms - int(props[PROP_MAX_SNAPSHOT_AGE])
    md = table.load_metadata()
    snaps = [Snapshot.from_json(s) for s in md["snapshots"]]
    snaps.sort(key=lambda s: s.snapshot_id)
    if keep_last < 1:
        raise ValueError("must retain at least the current snapshot")

    # keep_last counts along the PUBLISHED lineage (parent chain from
    # current) — staged write-audit-publish snapshots sit OUTSIDE it and
    # must neither displace published history nor be swept while a publish
    # decision is pending (they expire only via older_than_ms)
    by_id = {s.snapshot_id: s for s in snaps}
    chain: list[Snapshot] = []  # newest-first published lineage
    cur_s = by_id.get(md.get("current_snapshot_id"))
    while cur_s is not None:
        chain.append(cur_s)
        cur_s = by_id.get(cur_s.parent_id) if cur_s.parent_id is not None else None
    chain_ids = {s.snapshot_id for s in chain}
    staged = [s for s in snaps if s.snapshot_id not in chain_ids]

    retained_ids = {s.snapshot_id for s in chain[:keep_last]}
    if older_than_ms is not None:
        # any snapshot newer than the cutoff survives; staged snapshots
        # older than it are abandoned audits and get swept
        retained_ids |= {
            s.snapshot_id for s in snaps if s.timestamp_ms >= older_than_ms
        }
    else:
        # no age cutoff: staged snapshots stay pending-publish — EXCEPT
        # staged originals a retained chain snapshot already consumed via
        # cherry_pick (their summary records cherry_picked_from): those are
        # permanently off-chain, never pending, and expire as history
        consumed = {
            s.summary.get("cherry_picked_from")
            for s in chain
            if s.summary.get("cherry_picked_from") is not None
        }
        # snapshots stamped with a branch name whose branch no longer
        # exists are abandoned by drop_branch — ordinary expirable
        # history, not pending-publish stages
        live_branches = set(table.branches())
        retained_ids |= {
            s.snapshot_id
            for s in staged
            if s.snapshot_id not in consumed
            and not (
                s.summary.get("branch")
                and s.summary["branch"] not in live_branches
            )
        }
    # tagged snapshots are pinned: a named ref (create_tag) means someone
    # depends on that exact row set — expiry never sweeps it
    retained_ids |= set(table.refs().values()) & set(by_id)
    # externally-referenced snapshots (catalog pins etc.) likewise
    if protect_ids:
        retained_ids |= set(protect_ids) & set(by_id)
    # branches pin their EXCLUSIVE lineage (head back to the fork point):
    # a branch is in-progress work, so its whole history must survive until
    # the branch is published or dropped; shared ancestors on the published
    # chain keep expiring under keep_last as usual (each snapshot's manifest
    # list is self-contained, so the branch needs no fork-point data)
    for head in table.branches().values():
        node = by_id.get(head)
        while node is not None and node.snapshot_id not in chain_ids:
            retained_ids.add(node.snapshot_id)
            node = (
                by_id.get(node.parent_id)
                if node.parent_id is not None else None
            )
    retained = [s for s in snaps if s.snapshot_id in retained_ids]
    cur = md["current_snapshot_id"]
    if cur is not None and cur not in retained_ids:
        raise ValueError("cannot expire the current snapshot")
    expired = [s for s in snaps if s.snapshot_id not in retained_ids]
    if not expired:
        return ExpireResult([], 0, 0, 0)

    # -- mark --------------------------------------------------------------
    def _dv_refs(s: Snapshot) -> tuple[set[str], set[str]]:
        """(registry rels, delete sidecar rels — positional AND equality)
        of one snapshot."""
        if not s.delete_manifest:
            return set(), set()
        full = table._read_delete_registry_full(s.delete_manifest)
        sidecars = {
            dv for e in full.get("entries", {}).values() for dv in e["dvs"]
        } | {e["path"] for e in full.get("eq", [])}
        return {s.delete_manifest}, sidecars

    live_data: set[str] = set()
    live_manifests: set[str] = set()
    live_lists: set[str] = set()
    for s in retained:
        live_lists.add(s.manifest_list)
        regs, dvs = _dv_refs(s)
        live_manifests |= regs
        live_data |= dvs  # DV sidecars live in data/; sweep like data files
        for rel in table.manifests_of(s):
            live_manifests.add(rel)
            for f in table._read_manifest(rel):
                live_data.add(f.path)

    dead_data: set[str] = set()
    dead_manifests: set[str] = set()
    dead_lists: set[str] = set()
    for s in expired:
        if s.manifest_list not in live_lists:
            dead_lists.add(s.manifest_list)
        regs, dvs = _dv_refs(s)
        dead_manifests |= regs - live_manifests
        dead_data |= dvs - live_data
        for rel in table.manifests_of(s):
            if rel in live_manifests:
                continue
            dead_manifests.add(rel)
            for f in table._read_manifest(rel):
                if f.path not in live_data:
                    dead_data.add(f.path)

    if dry_run:
        # preview only: size the would-be sweep from the filesystem and
        # return before any mutation (no CAS commit, no deletes, no trim)
        freed = 0
        n_data = 0
        for rel in dead_data:
            p = os.path.join(table.path, rel)
            if os.path.exists(p):
                freed += os.path.getsize(p)
                n_data += 1
        n_mf = sum(
            1 for rel in dead_manifests | dead_lists
            if os.path.exists(os.path.join(table.path, rel))
        )
        return ExpireResult(
            [s.snapshot_id for s in expired], n_data, n_mf, freed
        )

    # -- commit new metadata (CAS) before sweeping bytes --------------------
    for _ in range(10):
        version = table.current_version()
        md = table.load_metadata(version)
        md["snapshots"] = [
            s for s in md["snapshots"] if s["snapshot_id"] in retained_ids
            or s["snapshot_id"] > max(e.snapshot_id for e in expired)
        ]
        if table._try_publish(version + 1, md):
            break
    else:
        from ..table.format import CommitConflict

        raise CommitConflict("expire: lost commit race repeatedly")

    # -- sweep ---------------------------------------------------------------
    freed = 0
    deleted_data = 0
    for rel in dead_data:
        p = os.path.join(table.path, rel)
        if os.path.exists(p):
            freed += os.path.getsize(p)
            os.unlink(p)
            deleted_data += 1
    deleted_manifests = 0
    for rel in dead_manifests | dead_lists:
        p = os.path.join(table.path, rel)
        if os.path.exists(p):
            os.unlink(p)
            deleted_manifests += 1

    if clean_orphans:
        grace = max(orphan_grace_ms, MIN_ORPHAN_GRACE_MS)
        _sweep_orphans(table, live_data, time.time() * 1000 - grace)

    trim_metadata_log(table, keep_versions=keep_metadata_versions)

    return ExpireResult(
        [s.snapshot_id for s in expired], deleted_data, deleted_manifests, freed
    )


@dataclass
class OrphanSweepResult:
    deleted_files: int
    freed_bytes: int


def remove_orphan_files(
    table: IcehouseTable, older_than_ms: int | None = None
) -> OrphanSweepResult:
    """Standalone orphan sweep (Iceberg's ``remove_orphan_files``
    procedure): delete data-dir files referenced by NO snapshot at all —
    failed/abandoned writes — WITHOUT expiring any history. The live set
    spans EVERY snapshot in the metadata (main chain, staged WAP commits,
    branch lineage) plus delete-vector sidecars and the outputs of
    unfinished ledger jobs, so nothing a reader or a resumable rewrite can
    still reach is ever touched. ``older_than_ms`` is an absolute epoch
    cutoff (files modified after it survive); it is clamped so the cutoff
    is never closer to now than MIN_ORPHAN_GRACE_MS — a racing
    stage-then-commit window cannot be swept out from under a writer."""
    snaps = table.snapshots()
    live: set[str] = set()
    for s in snaps:
        if s.delete_manifest:
            full = table._read_delete_registry_full(s.delete_manifest)
            live |= {
                dv for e in full.get("entries", {}).values() for dv in e["dvs"]
            }
            live |= {e["path"] for e in full.get("eq", [])}
        for rel in table.manifests_of(s):
            for f in table._read_manifest(rel):
                live.add(f.path)

    cutoff = min(
        older_than_ms if older_than_ms is not None else float("inf"),
        time.time() * 1000 - MIN_ORPHAN_GRACE_MS,
    )
    deleted = 0
    freed = 0
    if os.path.isdir(table.data_dir):
        protected = _ledger_protected_paths(table)
        for name in os.listdir(table.data_dir):
            rel = os.path.join("data", name)
            if rel in live or rel in protected:
                continue
            p = os.path.join(table.data_dir, name)
            try:
                if os.path.getmtime(p) * 1000 < cutoff:
                    freed += os.path.getsize(p)
                    os.unlink(p)
                    deleted += 1
            except OSError:
                pass
    return OrphanSweepResult(deleted, freed)


def _drop_aged_refs(table: IcehouseTable, cutoff_ms: int) -> list[str]:
    """Drop tags and branches whose HEAD snapshot committed before
    ``cutoff_ms`` (the max-ref-age-ms policy). Head-commit age is the
    staleness signal: a branch nobody has committed to (and a tag pinning
    an old snapshot) past the age stops pinning lineage, letting the
    normal retention pass reclaim it. Each drop is its own CAS commit —
    crash-safe halfway: the next sweep finishes the rest."""
    by_id = {s.snapshot_id: s for s in
             (Snapshot.from_json(j) for j in table.load_metadata()["snapshots"])}
    dropped = []
    for name, sid in table.refs().items():
        snap = by_id.get(sid)
        if snap is not None and snap.timestamp_ms < cutoff_ms:
            table.drop_tag(name)
            dropped.append(f"tag:{name}")
    for name, head in table.branches().items():
        snap = by_id.get(head)
        if snap is not None and snap.timestamp_ms < cutoff_ms:
            table.drop_branch(name)
            dropped.append(f"branch:{name}")
    return dropped


def trim_metadata_log(table: IcehouseTable, keep_versions: int = 100) -> int:
    """Delete metadata version files older than ``current - keep_versions``
    (Iceberg's write.metadata.delete-after-commit). Each v{N} file embeds
    the full snapshot list, so an unbounded log costs O(commits²) metadata
    bytes on a commit-heavy table. Old files are pure history: commits CAS
    on current+1, readers resolve time travel through the CURRENT file's
    snapshot list, and rebase loads only the current version — deleting
    them changes no behavior. Returns the number removed."""
    if keep_versions < 1:
        raise ValueError("must keep at least the current metadata version")
    floor = table.current_version() - keep_versions
    removed = 0
    for v in range(1, floor + 1):
        p = table._version_file(v)
        if os.path.exists(p):
            os.unlink(p)
            removed += 1
    return removed


def _ledger_protected_paths(table: IcehouseTable) -> set[str]:
    """Relative paths staged by ledger jobs that have NOT finished: a later
    resume will adopt these outputs into a commit, so the sweep must not
    touch them. Finished jobs' outputs are already in a snapshot (or truly
    orphaned and old enough to age out via the grace period)."""
    protected: set[str] = set()
    if not os.path.isdir(table.ledger_dir):
        return protected
    for job_id in os.listdir(table.ledger_dir):
        jdir = os.path.join(table.ledger_dir, job_id)
        if not os.path.isdir(jdir):
            continue
        if os.path.exists(os.path.join(jdir, "_SUCCESS.json")):
            continue  # job committed — its outputs are snapshot-referenced
        for name in os.listdir(jdir):
            if not (name.startswith("unit-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(jdir, name)) as f:
                    rec = json.load(f)
                for out in rec.get("outputs", []):
                    protected.add(out["path"])
            except (OSError, json.JSONDecodeError, KeyError):
                continue  # unreadable unit: be conservative elsewhere
    return protected


def _sweep_orphans(table: IcehouseTable, live_data: set[str], cutoff_ms: float):
    """Delete staged data files no snapshot references (failed/abandoned
    writes) once they're older than the grace period — excluding outputs of
    unfinished ledger jobs (a resumable rewrite in progress)."""
    if not os.path.isdir(table.data_dir):
        return
    protected = _ledger_protected_paths(table)
    for name in os.listdir(table.data_dir):
        rel = os.path.join("data", name)
        if rel in live_data or rel in protected:
            continue
        p = os.path.join(table.data_dir, name)
        try:
            if os.path.getmtime(p) * 1000 < cutoff_ms:
                os.unlink(p)
        except OSError:
            pass
