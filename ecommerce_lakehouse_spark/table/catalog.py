"""Multi-table catalog with atomic cross-table transactions.

Single-table commits are already linearized by the per-table version-file
CAS (format.py). What that cannot give is a consistent view ACROSS tables:
a pipeline that publishes ``pages`` and its ``page_audit`` side table in two
commits exposes a window where readers see one without the other. The
Catalog closes that window the way Iceberg's REST/Nessie catalogs do: the
catalog — not each table's own current pointer — is the source of truth
for readers, and its pointer map (table name -> pinned snapshot id) is
published through the same hard-link CAS as table metadata.

A multi-table transaction is two-phase:

  phase 1 (stage)    every write lands on a per-txn BRANCH of its table
                     (``branch="txn-<id>"`` — the format.py primitive), so
                     it is isolated from main and from catalog readers,
                     supports the full op set (append / MERGE / replace),
                     and per-table linearization still rides the table CAS.
  commit point       ONE catalog CAS flips every touched table's pinned
                     snapshot to its branch head and records the txn under
                     ``pending``. Validation re-runs inside the CAS retry
                     loop: if any touched table's pin moved since the txn
                     began, the commit ABORTS (CommitConflict) — snapshot
                     isolation, first committer wins. A CAS lost to a txn
                     over disjoint tables revalidates and retries.
  phase 2 (publish)  idempotent and crash-recoverable: fast-forward each
                     table's main pointer to its branch head, drop the
                     branch, clear the pending record. A crash anywhere in
                     phase 2 loses nothing — the data is already visible
                     through the catalog — and :meth:`Catalog.recover`
                     finishes the pointer moves.

An aborted transaction (validation failure, or the ``with`` body raising)
leaves only an abandoned branch; dropped-branch expiry reclaims its files.

Reference anchor: the reference coordinates its multi-table gold publishes
only by notebook ordering (reference/src/gold/master_gold_run.py) — a run
dying between tables leaves them permanently inconsistent. This module is
the missing transactional envelope, built from public Iceberg catalog
semantics (REST catalog multi-table commit / Nessie).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .format import CommitConflict, IcehouseTable
from .predicates import Predicate


_EMPTY_MD = {"format_version": 1, "tables": {}, "pending": {}, "views": {}}


def _references(sql: str, name: str) -> bool:
    """Whether ``sql`` mentions ``name`` as a bare identifier. Textual and
    deliberately conservative (a name inside a string literal counts): the
    cost of a false positive is an extra temp-view registration or an
    over-careful drop refusal, never a wrong result."""
    import re

    return re.search(rf"\b{re.escape(name)}\b", sql, re.I) is not None


def _view_order(views: dict) -> list[str]:
    """Topological order of the view graph (prerequisites first); raises
    ValueError on a reference cycle — checked at CREATE time so a cyclic
    definition can never be persisted."""
    deps = {
        v: {o for o in views if o != v and _references(sql, o)}
        for v, sql in views.items()
    }
    order: list[str] = []
    done: set = set()
    while len(order) < len(views):
        ready = sorted(v for v in deps if v not in done and deps[v] <= done)
        if not ready:
            cyc = sorted(v for v in deps if v not in done)
            raise ValueError(f"view reference cycle among {cyc}")
        order.extend(ready)
        done.update(ready)
    return order


def _in_closure(views: dict, root: str, target: str) -> bool:
    """Whether ``target`` is a transitive view dependency of ``root``."""
    seen, stack = set(), [root]
    while stack:
        v = stack.pop()
        for o in views:
            if o != v and o not in seen and _references(views[v], o):
                seen.add(o)
                stack.append(o)
    return target in seen


class Catalog:
    """A directory of Icehouse tables plus a CAS-published pointer map."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.meta_dir = os.path.join(self.path, "catalog")
        self.tables_dir = os.path.join(self.path, "tables")

    # ---------------------------------------------------------------- meta

    def _version_file(self, v: int) -> str:
        return os.path.join(self.meta_dir, f"v{v:010d}.catalog.json")

    def current_version(self) -> int:
        if not os.path.isdir(self.meta_dir):
            return 0
        return max(
            (
                int(f[1:11])
                for f in os.listdir(self.meta_dir)
                if f.endswith(".catalog.json")
            ),
            default=0,
        )

    def load_metadata(self, version: int | None = None) -> dict:
        v = version if version is not None else self.current_version()
        if v == 0:
            return json.loads(json.dumps(_EMPTY_MD))
        with open(self._version_file(v)) as f:
            return json.load(f)

    def _try_publish(self, version: int, metadata: dict) -> bool:
        os.makedirs(self.meta_dir, exist_ok=True)
        tmp = self._version_file(version) + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(metadata, f, indent=1)
        try:
            os.link(tmp, self._version_file(version))  # atomic CAS on POSIX
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _cas(self, mutate, max_retries: int = 10) -> dict:
        """Optimistic catalog commit. ``mutate(md) -> md`` revalidates and
        rewrites the metadata per attempt; a CommitConflict IT raises is an
        abort and propagates, while a lost CAS race revalidates and
        retries."""
        for _attempt in range(max_retries):
            version = self.current_version()
            md = mutate(self.load_metadata(version))
            if self._try_publish(version + 1, md):
                return md
            time.sleep(0.01 * (_attempt + 1))
        raise CommitConflict("catalog: lost commit race repeatedly")

    # ------------------------------------------------------------- tables

    def table_names(self) -> list[str]:
        return sorted(self.load_metadata()["tables"])

    def table(self, name: str) -> IcehouseTable:
        """The LIVE (unpinned) table handle — maintenance and direct
        inspection; catalog-consistent reads go through :meth:`read`."""
        entry = self.load_metadata()["tables"].get(name)
        if entry is None:
            raise ValueError(f"unknown table {name!r}")
        return IcehouseTable(self.spark, entry["path"])

    def pinned_snapshot(self, name: str) -> int:
        entry = self.load_metadata()["tables"].get(name)
        if entry is None:
            raise ValueError(f"unknown table {name!r}")
        return entry["snapshot"]

    def create_table(self, name: str, df: DataFrame, **create_kwargs) -> IcehouseTable:
        if not name or "." in name or "/" in name:
            raise ValueError(f"invalid table name {name!r}")
        path = os.path.join(self.tables_dir, name)
        tbl = IcehouseTable.create(self.spark, path, df, **create_kwargs)
        self.register_table(name, tbl)
        return tbl

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Unregister a table from the catalog (one CAS commit). The
        table's files stay on disk by default — an external path registered
        with :meth:`register_table` is never deleted implicitly;
        ``purge=True`` additionally removes the table directory (Iceberg's
        ``DROP TABLE ... PURGE``). Refuses while a pending transaction
        still references the table — :meth:`recover` needs it to finish
        phase 2 — and while a catalog VIEW references it (drop the views
        first; a dangling view would fail only at read time, long after the
        drop)."""
        path_holder: dict = {}

        def mutate(md: dict) -> dict:
            entry = md["tables"].get(name)
            if entry is None:
                raise CommitConflict(f"unknown table {name!r}")
            if name in md.get("mviews", {}):
                raise CommitConflict(
                    f"{name!r} is a materialized view — use "
                    f"drop_materialized_view / DROP MATERIALIZED VIEW"
                )
            for txn_id, record in md["pending"].items():
                if name in record["tables"]:
                    raise CommitConflict(
                        f"table {name!r} is referenced by pending "
                        f"transaction {txn_id} — run recover() first"
                    )
            holders = [
                v for v, sql in md.get("views", {}).items()
                if _references(sql, name)
            ]
            if holders:
                raise CommitConflict(
                    f"table {name!r} is referenced by view(s) "
                    f"{sorted(holders)} — drop them first"
                )
            # a table that SOURCES a materialized view can't drop either
            # (ADVICE r5): the dangling MV's next refresh would fail with
            # a confusing 'unknown table' and kill the run_catalog tick
            mv_holders = [
                m for m, spec in md.get("mviews", {}).items()
                if spec.get("source") == name
            ]
            if mv_holders:
                raise CommitConflict(
                    f"table {name!r} is the source of materialized "
                    f"view(s) {sorted(mv_holders)} — drop them first"
                )
            path_holder["path"] = entry["path"]
            del md["tables"][name]
            return md

        self._cas(mutate)
        if purge:
            shutil.rmtree(path_holder["path"], ignore_errors=True)

    def register_table(self, name: str, tbl: IcehouseTable) -> None:
        """Register an existing table; the pin starts at its current
        snapshot."""
        snap = tbl.current_snapshot()
        if snap is None:
            raise ValueError(f"table at {tbl.path} has no committed snapshot")

        def mutate(md: dict) -> dict:
            if name in md["tables"]:
                raise CommitConflict(f"table {name!r} already registered")
            md["tables"][name] = {"path": tbl.path, "snapshot": snap.snapshot_id}
            return md

        self._cas(mutate)

    # ---------------------------------------------------------------- views

    def view_names(self) -> list[str]:
        return sorted(self.load_metadata().get("views", {}))

    def view_sql(self, name: str) -> str:
        sql = self.load_metadata().get("views", {}).get(name)
        if sql is None:
            raise ValueError(f"unknown view {name!r}")
        return sql

    def create_view(self, name: str, sql: str, replace: bool = False) -> None:
        """Persist a SQL view in the catalog (the Iceberg-view analog: the
        view is its SQL TEXT, versioned through the same catalog CAS as
        table pins — no data is materialized). The text may reference
        catalog tables and other catalog views; resolution happens at READ
        time against the then-current catalog pins, so a view over
        ``pages`` always reflects the transactionally consistent snapshot
        set, exactly like :meth:`read`.

        Reference anchor: the reference's gold layer publishes derived
        tables per run (reference/src/gold/master_gold_run.py); a catalog
        view expresses the same derivation declaratively without the
        rewrite cost — the training-data "latest clean slice" idiom.

        The definition must be a single SELECT/WITH statement. Name
        collisions with tables are refused (one namespace, like Iceberg
        catalogs); self-references and reference cycles are refused at
        CREATE time, not left to recurse at read time."""
        if not name or "." in name or "/" in name:
            raise ValueError(f"invalid view name {name!r}")
        head = sql.strip().split(None, 1)[0].upper() if sql.strip() else ""
        if head not in ("SELECT", "WITH"):
            raise ValueError(
                f"view {name!r}: definition must be a SELECT/WITH query"
            )

        def mutate(md: dict) -> dict:
            views = md.setdefault("views", {})
            if name in md["tables"]:
                raise CommitConflict(
                    f"{name!r} is a table — views and tables share one "
                    f"namespace"
                )
            if name in views and not replace:
                raise CommitConflict(
                    f"view {name!r} exists — use replace=True / "
                    f"CREATE OR REPLACE VIEW"
                )
            proposed = dict(views, **{name: sql})
            _view_order(proposed)  # raises on a reference cycle
            md["views"] = proposed
            return md

        self._cas(mutate)

    def drop_view(self, name: str) -> None:
        def mutate(md: dict) -> dict:
            views = md.setdefault("views", {})
            if name not in views:
                raise CommitConflict(f"unknown view {name!r}")
            holders = [
                v for v, sql in views.items()
                if v != name and _references(sql, name)
            ]
            if holders:
                raise CommitConflict(
                    f"view {name!r} is referenced by view(s) "
                    f"{sorted(holders)} — drop them first"
                )
            del views[name]
            return md

        self._cas(mutate)

    def read_view(self, name: str) -> DataFrame:
        """Resolve a catalog view to a DataFrame: register the PINNED scans
        of every catalog table its definition closure references, register
        prerequisite views in dependency order, then run the view's SQL.
        Metadata-only planning — nothing is materialized until an action."""
        md = self.load_metadata()
        views = md.get("views", {})
        if name not in views:
            raise ValueError(f"unknown view {name!r}")
        # the dependency closure of this view, in prerequisite-first order
        order = [
            v for v in _view_order(views)
            if v == name or _in_closure(views, name, v)
        ]
        tables = {
            t for v in order for t in md["tables"] if _references(views[v], t)
        }
        for t in sorted(tables):
            self.read(t).createOrReplaceTempView(t)
        out = None
        for v in order:
            out = self.spark.sql(views[v])
            out.createOrReplaceTempView(v)
        return out

    def read(
        self,
        name: str,
        predicates: list[Predicate] | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Catalog-consistent scan: always the PINNED snapshot, so two
        tables read in one job reflect the same committed transaction set
        regardless of in-flight writers."""
        return self.table(name).scan(
            predicates=predicates,
            snapshot_id=self.pinned_snapshot(name),
            columns=columns,
        )

    def refresh(self, name: str) -> int:
        """Advance a table's pin to its live current snapshot — the opt-in
        for writes that bypassed the catalog (direct ``tbl.append`` etc.)."""
        snap = self.table(name).current_snapshot()

        def mutate(md: dict) -> dict:
            if name not in md["tables"]:
                raise CommitConflict(f"unknown table {name!r}")
            md["tables"][name]["snapshot"] = snap.snapshot_id
            return md

        self._cas(mutate)
        return snap.snapshot_id

    def register_views(
        self, names: list[str] | None = None, metadata: bool = False
    ) -> list[str]:
        """Register each table's PINNED scan as a temp view named after the
        table, so plain ``spark.sql`` joins across catalog tables see one
        consistent transaction set. ``metadata=True`` adds the
        ``<name>_files`` / ``_manifests`` / ``_partitions`` / ``_history``
        metadata views (the Iceberg ``$files`` idiom). Views resolve the
        pin AT REGISTRATION time — re-register after new commits.

        Catalog SQL views (``create_view``) are registered after the
        tables, in dependency order, so plain ``spark.sql`` sees the whole
        namespace."""
        from ..sources.datasource import register_table_views

        out = []
        for name in names if names is not None else self.table_names():
            pin = self.pinned_snapshot(name)
            if metadata:
                register_table_views(
                    self.spark, self.table(name).path, name, snapshot_id=pin
                )
            else:
                self.read(name).createOrReplaceTempView(name)
            out.append(name)
        views = self.load_metadata().get("views", {})
        if names is None:
            for v in _view_order(views):
                self.spark.sql(views[v]).createOrReplaceTempView(v)
                out.append(v)
        return out

    def expire(self, name: str, **kwargs):
        """Catalog-aware snapshot expiry: the table's pinned snapshot is
        always protected, so a pin that lags the table's current (direct
        writes without refresh) can never have its files reclaimed out
        from under catalog readers."""
        from ..maintenance.expire import expire_snapshots

        protect = set(kwargs.pop("protect_ids", None) or ())
        protect.add(self.pinned_snapshot(name))
        # materialized views over this table incrementally refresh FROM
        # their recorded baseline snapshot by walking the (refreshed, pin]
        # snapshot chain (touched_keys) — expiring ANY snapshot in that
        # range silently degrades every subsequent refresh to the O(table)
        # full path the MV exists to avoid (ADVICE r5). Protect the chain
        # back to the oldest MV baseline; in the intended run_catalog flow
        # (refresh, then expire) the span is one tick wide, so this keeps
        # expiry effective while making out-of-band expiry safe.
        baselines = [
            spec["refreshed"]
            for spec in self.load_metadata().get("mviews", {}).values()
            if spec.get("source") == name and spec.get("refreshed") is not None
        ]
        if baselines:
            oldest = min(baselines)
            for s in self.table(name).snapshots():
                if s.snapshot_id >= oldest:
                    protect.add(s.snapshot_id)
        return expire_snapshots(self.table(name), protect_ids=protect, **kwargs)

    # ---------------------------------------------------- materialized views

    def mview_names(self) -> list[str]:
        return sorted(self.load_metadata().get("mviews", {}))

    def mview_definition(self, name: str) -> dict:
        mv = self.load_metadata().get("mviews", {}).get(name)
        if mv is None:
            raise ValueError(f"unknown materialized view {name!r}")
        return dict(mv)

    def create_materialized_view(self, name: str, sql: str):
        from .mview import create_materialized_view

        return create_materialized_view(self, name, sql)

    def refresh_materialized_view(self, name: str, full: bool = False):
        from .mview import refresh_materialized_view

        return refresh_materialized_view(self, name, full=full)

    def drop_materialized_view(self, name: str, purge: bool = False) -> None:
        from .mview import drop_materialized_view

        drop_materialized_view(self, name, purge=purge)

    # ---------------------------------------------------------------- txns

    def transaction(self) -> "MultiTableTransaction":
        return MultiTableTransaction(self)

    def pending_transactions(self) -> dict:
        return dict(self.load_metadata()["pending"])

    def recover(self) -> list[str]:
        """Finish phase 2 for every pending transaction (after a writer
        crashed between its commit point and publish). Idempotent: tables
        whose branch is already gone are skipped. Returns txn ids
        published."""
        done = []
        for txn_id, record in sorted(self.pending_transactions().items()):
            self._publish_txn(txn_id, record)
            done.append(txn_id)
        return done

    def _publish_txn(self, txn_id: str, record: dict) -> None:
        """Phase 2: move each table's main pointer to the committed branch
        head and drop the branch. Every step is idempotent — fast_forward
        of an already-current head returns early, a missing branch means a
        prior recover() finished that table."""
        repinned: dict[str, int] = {}
        for name, info in sorted(record["tables"].items()):
            tbl = self.table(name)
            if txn_id not in tbl.branches():
                continue  # already published by a previous recover()
            try:
                tbl.fast_forward(txn_id)
                tbl.drop_branch(txn_id)
            except CommitConflict:
                # A DIRECT (non-catalog) write landed on main after the txn
                # forked. merge_branch cherry-picks an append-only branch
                # onto the new main (and raises for row-set-changing
                # branches — those need manual resolution; the pending
                # record is kept so recover() can retry after it). The
                # cherry-picked snapshots are NEW ids, so the pin must move
                # to the merged current or it would reference a dropped
                # branch head that expiry may later reclaim.
                tbl.merge_branch(txn_id, drop=True)
                repinned[name] = tbl.current_snapshot().snapshot_id

        def mutate(md: dict) -> dict:
            for name, sid in repinned.items():
                if name in md["tables"]:
                    md["tables"][name]["snapshot"] = sid
            md["pending"].pop(txn_id, None)
            return md

        self._cas(mutate)


class MultiTableTransaction:
    """Atomic writes across catalog tables — see the module docstring for
    the protocol. Use as a context manager::

        with catalog.transaction() as txn:
            txn.append("pages", new_pages)
            txn.merge_into("page_audit", audit_delta, ["url"])
        # clean exit commits; an exception aborts (nothing visible)
    """

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.txn_id = "txn-" + uuid.uuid4().hex[:12]
        self._base: dict[str, int] = {}  # table -> pin at first touch
        self._state = "open"

    # ------------------------------------------------------------- staging

    def _touch(self, name: str) -> IcehouseTable:
        if self._state != "open":
            raise RuntimeError(f"transaction is {self._state}")
        tbl = self.catalog.table(name)
        if name not in self._base:
            base = self.catalog.pinned_snapshot(name)
            tbl.create_branch(self.txn_id, snapshot_id=base)
            self._base[name] = base
        return tbl

    def append(self, name: str, df: DataFrame, **kwargs):
        return self._touch(name).append(df, branch=self.txn_id, **kwargs)

    def merge_into(self, name: str, source: DataFrame, key_cols, **kwargs):
        from ..operators.merge import merge_into

        return merge_into(
            self._touch(name), source, key_cols, branch=self.txn_id, **kwargs
        )

    def replace_files(self, name: str, removed_paths, new_df, **kwargs):
        return self._touch(name).replace_files(
            removed_paths, new_df, branch=self.txn_id, **kwargs
        )

    def read(self, name: str, **kwargs) -> DataFrame:
        """Read-your-own-writes: the txn's branch head when touched, else
        the catalog pin."""
        if name in self._base:
            tbl = self.catalog.table(name)
            return tbl.scan(snapshot_id=tbl.branches()[self.txn_id], **kwargs)
        return self.catalog.read(name, **kwargs)

    # -------------------------------------------------------------- commit

    def commit(self) -> None:
        if self._state != "open":
            raise RuntimeError(f"transaction is {self._state}")
        if not self._base:
            self._state = "committed"
            return
        heads = {
            name: self.catalog.table(name).branches()[self.txn_id]
            for name in self._base
        }
        record = {"tables": {n: {"head": h} for n, h in heads.items()}}

        def mutate(md: dict) -> dict:
            for name, base in self._base.items():
                pin = md["tables"].get(name, {}).get("snapshot")
                if pin != base:
                    raise CommitConflict(
                        f"txn {self.txn_id}: table {name!r} moved "
                        f"({base} -> {pin}) since this transaction began — "
                        f"first committer wins; retry against the new state"
                    )
            for name, head in heads.items():
                md["tables"][name]["snapshot"] = head
            md["pending"][self.txn_id] = record
            return md

        try:
            self.catalog._cas(mutate)  # <-- the atomic commit point
        except CommitConflict:
            self.abort()
            raise
        self._state = "committed"
        self.catalog._publish_txn(self.txn_id, record)

    def abort(self) -> None:
        if self._state != "open":
            return
        for name in self._base:
            try:
                self.catalog.table(name).drop_branch(self.txn_id)
            except (ValueError, CommitConflict):
                pass  # best-effort: an orphan branch is reclaimed by expiry
        self._state = "aborted"

    def __enter__(self) -> "MultiTableTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.abort()
        elif self._state == "open":
            self.commit()
