"""Incremental materialized views over catalog tables.

A materialized view (MV) is a keyed AGGREGATION of one catalog table,
materialized as an ordinary Icehouse table and kept current by the CDC
feed instead of full recomputation — the Databricks/Snowflake MV idiom
re-expressed on this engine's own primitives:

- definition   = ``SELECT <group keys>, <agg select-list> FROM <source>
                 [WHERE ...] GROUP BY <group keys>`` (grammar enforced at
                 create time; the text is stored in catalog metadata like
                 a plain view's, versioned through the same CAS)
- refresh      = ``touched_keys(last_refreshed, pin)`` (keys-only,
                 column-pruned superset of the changed keys — no CDC
                 classification, no diff joins) → recompute ONLY those
                 groups over the pinned snapshot (counted-broadcast
                 semi-join, ``hybrid_key_scope``) → MERGE the recomputed
                 rows + DELETE vanished groups. Cost is O(touched files'
                 key bytes) + O(affected groups' slice), never
                 O(table) — the generalization of the affected-keys
                 session recompute (operators/sessionize.py) to any
                 keyed aggregate.
- consistency  = refresh targets the source's CATALOG PIN, so an MV is a
                 pure function of catalog metadata: a reader that joins
                 the MV with other pinned tables sees one transactionally
                 consistent snapshot set. Direct (non-catalog) writes
                 become visible after ``Catalog.refresh(source)``.
- crash safety = the MV table's MERGE commits first; the catalog CAS that
                 advances (mv pin, refreshed-snapshot) publishes LAST. A
                 crash in between leaves the old pin visible (readers are
                 consistent) and re-running the refresh recomputes the
                 same groups from the same snapshots — deterministic, so
                 the retry converges. No 2-phase dance needed.

Falls back to FULL refresh (one atomic overwrite) when the incremental
path is impossible: expired history between the refresh points, a NULL
group key in the touched range (MERGE keys are null-refusing), or an
explicit ``full=True``.

Reference anchor: the reference's gold layer recomputes derived tables
per run (reference/src/gold/master_gold_run.py, daily_sales_summary.py);
an MV gives the same derived table with per-run cost proportional to the
delta — at a 10^12-row source, the difference between a nightly job that
reads 100 TB and one that reads the day's commits.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .catalog import Catalog, CommitConflict

# single-column affected-key sets at or under this size are inlined as an
# IN predicate (manifest-stats file pruning + row-group pushdown) instead
# of a key join — the collect is metadata-sized by construction
_IN_PREDICATE_LIMIT = 10_000

__all__ = [
    "MVRefreshResult",
    "create_materialized_view",
    "refresh_materialized_view",
    "drop_materialized_view",
]

_MV_GRAMMAR = re.compile(
    r"^SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<src>[A-Za-z_]\w*)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<keys>[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*$",
    re.I | re.S,
)


class MVRefreshResult(dict):
    """Refresh telemetry: ``mode`` (incremental/full/noop), ``affected``
    group-key count, ``upserted``/``deleted`` group counts, and the
    ``refreshed_snapshot`` the MV now reflects. A dict so it serializes
    straight into logs/tests."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(k) from e


def _parse_definition(sql: str) -> dict:
    """Validate the restricted MV grammar and split it into the pieces the
    incremental planner needs. GROUP BY entries must be bare source
    columns and must appear verbatim in the select list (they are the
    MERGE keys of the materialized table)."""
    m = _MV_GRAMMAR.match(sql.strip().rstrip(";"))
    if m is None:
        raise ValueError(
            "materialized view definition must be: SELECT <cols+aggs> "
            "FROM <table> [WHERE ...] GROUP BY <bare columns> "
            f"— got: {sql!r}"
        )
    keys = [k.strip() for k in m.group("keys").split(",")]
    select_items = _split_top_level(m.group("select"))
    bare = {it.strip() for it in select_items}
    missing = [k for k in keys if k not in bare]
    if missing:
        raise ValueError(
            f"GROUP BY column(s) {missing} must appear as bare names in "
            f"the select list — they key the materialized table"
        )
    aggs = [it for it in select_items if it.strip() not in set(keys)]
    unaliased = [a for a in aggs if not re.search(r"\s+AS\s+\w+\s*$", a, re.I)]
    if unaliased:
        raise ValueError(
            f"aggregate expression(s) {unaliased} need an explicit "
            f"``AS <name>`` alias — the alias becomes a parquet column of "
            f"the materialized table (and the oracle-compare contract "
            f"requires stable names)"
        )
    if not aggs:
        raise ValueError(
            "materialized view needs at least one aggregate expression "
            "beside the GROUP BY keys (a keys-only MV is just DISTINCT — "
            "use a plain view)"
        )
    return {
        "sql": sql.strip().rstrip(";"),
        "source": m.group("src"),
        "keys": keys,
        "aggs": ", ".join(a.strip() for a in aggs),
        "where": (m.group("where") or "").strip() or None,
    }


def _split_top_level(select: str) -> list[str]:
    """Split a select list on commas not nested inside parentheses."""
    out, depth, cur = [], 0, []
    for ch in select:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [s.strip() for s in out if s.strip()]


def _compute(cat: Catalog, mv: dict, scoped: DataFrame | None = None,
             snapshot_id: int | None = None) -> DataFrame:
    """Evaluate the MV aggregation. ``scoped=None`` → the full definition
    over the source's snapshot (full refresh / create); otherwise the same
    aggregation over the already key-scoped slice."""
    spark = cat.spark
    if scoped is None:
        scoped = cat.table(mv["source"]).scan(snapshot_id=snapshot_id)
    if mv["where"]:
        scoped = scoped.filter(mv["where"])
    view = "__icehouse_mv_src"
    scoped.createOrReplaceTempView(view)
    keys = ", ".join(mv["keys"])
    return spark.sql(
        f"SELECT {keys}, {mv['aggs']} FROM {view} GROUP BY {keys}"
    )


def create_materialized_view(cat: Catalog, name: str, sql: str) -> MVRefreshResult:
    """Create + initially materialize an MV. The backing Icehouse table
    lands under the catalog's tables dir and is registered together with
    the MV definition in ONE catalog CAS — concurrent name claims (table,
    view or MV) lose the race cleanly."""
    import os
    import shutil

    from .format import IcehouseTable

    if not name or "." in name or "/" in name:
        raise ValueError(f"invalid materialized view name {name!r}")
    mv = _parse_definition(sql)
    md = cat.load_metadata()
    if mv["source"] not in md["tables"]:
        raise ValueError(
            f"materialized view source {mv['source']!r} is not a catalog "
            f"table"
        )
    if mv["source"] in md.get("mviews", {}):
        raise ValueError(
            "materialized view over a materialized view is not supported "
            "— define it over the base table"
        )
    pin = cat.pinned_snapshot(mv["source"])
    path = os.path.join(cat.tables_dir, name)
    if os.path.exists(path):
        raise CommitConflict(
            f"{path} already exists — an earlier create crashed mid-way? "
            f"remove the directory or pick another name"
        )
    tbl = IcehouseTable.create(cat.spark, path, _compute(cat, mv, snapshot_id=pin))

    def mutate(meta: dict) -> dict:
        if name in meta["tables"] or name in meta.get("views", {}):
            raise CommitConflict(
                f"{name!r} already names a table or view — one namespace"
            )
        meta["tables"][name] = {
            "path": tbl.path,
            "snapshot": tbl.current_snapshot().snapshot_id,
        }
        meta.setdefault("mviews", {})[name] = dict(mv, refreshed=pin)
        return meta

    try:
        cat._cas(mutate)
    except CommitConflict:
        shutil.rmtree(path, ignore_errors=True)  # lost the name race
        raise
    return MVRefreshResult(
        mode="create", affected=-1, upserted=-1, deleted=0,
        refreshed_snapshot=pin,
    )


def refresh_materialized_view(
    cat: Catalog, name: str, full: bool = False
) -> MVRefreshResult:
    """Bring the MV up to the source's current catalog pin — incrementally
    when the CDC range allows it (see module docstring), else by one
    atomic overwrite. Idempotent: re-running after any crash converges."""
    from ..operators.merge import merge_into
    from ..operators.sessionize import hybrid_key_scope

    md = cat.load_metadata()
    mv = md.get("mviews", {}).get(name)
    if mv is None:
        raise ValueError(f"unknown materialized view {name!r}")
    src = cat.table(mv["source"])
    mv_tbl = cat.table(name)
    pin = cat.pinned_snapshot(mv["source"])
    last = mv["refreshed"]
    if pin == last and not full:
        return MVRefreshResult(
            mode="noop", affected=0, upserted=0, deleted=0,
            refreshed_snapshot=last,
        )

    def _advance() -> None:
        sid = mv_tbl.current_snapshot().snapshot_id

        def mutate(meta: dict) -> dict:
            if name not in meta.get("mviews", {}):
                raise CommitConflict(f"materialized view {name!r} dropped")
            # first-committer-wins (ADVICE r5): two overlapping refreshes
            # planned from the same baseline would otherwise interleave —
            # the staler recompute's MERGE can land after the newer one's
            # while 'refreshed' ends at the newer pin, leaving those
            # groups permanently stale. Conflict out the loser instead
            # (same snapshot-isolation idiom as the catalog txns); it
            # re-runs from the advanced baseline.
            cur = meta["mviews"][name].get("refreshed")
            if cur != last:
                raise CommitConflict(
                    f"materialized view {name!r} was refreshed "
                    f"concurrently (baseline {last} advanced to {cur}) — "
                    f"re-run the refresh"
                )
            meta["mviews"][name]["refreshed"] = pin
            meta["tables"][name]["snapshot"] = sid
            return meta

        cat._cas(mutate)

    def _full() -> MVRefreshResult:
        fresh = _compute(cat, mv, snapshot_id=pin)
        mv_tbl.overwrite(fresh)
        _advance()
        return MVRefreshResult(
            mode="full", affected=-1, upserted=-1, deleted=-1,
            refreshed_snapshot=pin,
        )

    if full:
        return _full()
    try:
        # keys-only touched-key scan — a SUPERSET of the changed group
        # keys at O(touched files' key bytes); no CDC classification is
        # needed just to find which groups to recompute
        keys_df = src.touched_keys(last, pin, cols=mv["keys"])
    except ValueError:
        # expired history between the refresh points, or a pin moved
        # backwards (rollback): the delta is unreconstructable — recompute
        return _full()
    affected = keys_df.localCheckpoint()
    # one action answers both planning questions: how many affected
    # groups, and do any carry a NULL key
    from pyspark.sql import functions as F

    stats = affected.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(
            F.greatest(*[F.col(k).isNull() for k in mv["keys"]])
            if len(mv["keys"]) > 1
            else F.col(mv["keys"][0]).isNull()
        ).alias("__has_null"),
    ).first()
    n_affected = stats["__n"]
    if n_affected == 0:
        # content-neutral range (compaction / clustering / metadata):
        # nothing to recompute, just advance the bookkeeping
        _advance()
        return MVRefreshResult(
            mode="noop", affected=0, upserted=0, deleted=0,
            refreshed_snapshot=pin,
        )
    if stats["__has_null"]:
        # NULL group keys can't ride the MERGE path (null-refusing keys)
        return _full()
    scan_path = "key-join"
    if len(mv["keys"]) == 1 and n_affected <= _IN_PREDICATE_LIMIT:
        # single-column key set small enough to inline: an IN predicate
        # reaches the manifest stats (file pruning — on a source
        # clustered/partitioned by the group key the recompute reads only
        # the affected groups' FILES, not just their rows) and Catalyst
        # pushes it into the surviving files' row groups. The residual
        # filter makes the scope exact, so no join is needed at all.
        from .predicates import Predicate

        key = mv["keys"][0]
        values = tuple(r[0] for r in affected.collect())
        scoped = src.scan(
            predicates=[Predicate(key, "in", values)], snapshot_id=pin
        )
        scan_path = "pruned-in"
    else:
        scoped = hybrid_key_scope(
            src.scan(snapshot_id=pin), affected, mv["keys"]
        )
    recomputed = _compute(cat, mv, scoped=scoped).localCheckpoint()
    n_up = recomputed.count()
    # groups can only VANISH if some commit in the range removed rows —
    # an append-only range (plus content-neutral commits) skips the
    # anti-join entirely; pure metadata knowledge, no extra IO
    ordered, _ = src.snapshot_range(last, src._resolve_snapshot(pin))
    removing = tuple(
        s for s in ordered
        if not s.operation.startswith(
            ("append",) + src._CONTENT_NEUTRAL_OPS
        )
    )
    n_del = 0
    vanished = None
    if removing:
        vanished = affected.join(
            recomputed.select(*mv["keys"]), mv["keys"], "left_anti"
        ).localCheckpoint()
        n_del = vanished.count()
    # collect_metrics=False: refresh already knows the exact group counts
    # (n_up/n_del above), so the merges skip their Observation counters —
    # cheaper, and it makes refresh safe to call inside a Structured
    # Streaming foreachBatch (Observation.get deadlocks there — see
    # streaming/cdc_apply.py)
    if n_up:
        merge_into(mv_tbl, recomputed, mv["keys"], collect_metrics=False)
    if n_del:
        merge_into(
            mv_tbl, vanished, mv["keys"], delete_matched=True,
            collect_metrics=False,
        )
    _advance()
    return MVRefreshResult(
        mode="incremental", affected=n_affected, upserted=n_up,
        deleted=n_del, refreshed_snapshot=pin, scan_path=scan_path,
    )


def drop_materialized_view(cat: Catalog, name: str, purge: bool = False) -> None:
    """Unregister the MV definition AND its backing table in one CAS;
    ``purge=True`` removes the table directory."""
    import shutil

    path_holder: dict = {}

    def mutate(meta: dict) -> dict:
        if name not in meta.get("mviews", {}):
            raise CommitConflict(f"unknown materialized view {name!r}")
        holders = [
            v for v, sql in meta.get("views", {}).items()
            if re.search(rf"\b{re.escape(name)}\b", sql)
        ]
        if holders:
            raise CommitConflict(
                f"materialized view {name!r} is referenced by view(s) "
                f"{sorted(holders)} — drop them first"
            )
        path_holder["path"] = meta["tables"][name]["path"]
        del meta["mviews"][name]
        del meta["tables"][name]
        return meta

    cat._cas(mutate)
    if purge:
        shutil.rmtree(path_holder["path"], ignore_errors=True)
