"""SQL DML/maintenance front end over Icehouse tables.

The reference drives every mutation through ``spark.sql`` statements in
notebooks (MERGE INTO gold tables, DELETE, OPTIMIZE/VACUUM maintenance —
e.g. reference/src/gold/table_notebooks/*), while this engine exposes
Python primitives. ``IcehouseSQL`` closes that ergonomics gap: a statement
dispatcher that parses the DML subset those notebooks actually use and
maps each statement onto the engine's existing, tested primitives —
``merge_into``, ``delete_where``, ``set_properties``, ``compact``,
``zorder_by``, ``expire_snapshots``, ``history`` — so a reference user can
keep their SQL strings. SELECT/WITH pass through to ``spark.sql`` against
views registered by ``register_table_views``/``Catalog.register_views``.

Grammar (case-insensitive keywords; one statement per call):

  MERGE INTO <t> [AS] a USING (<subquery>)|<view> [AS] b
      ON a.k = b.k [AND a.k2 = b.k2 ...]
      [WHEN MATCHED THEN UPDATE SET * | SET c1 = b.c1[, ...]]
      [WHEN MATCHED THEN DELETE]
      [WHEN NOT MATCHED THEN INSERT *]
  DELETE FROM <t> WHERE <col op literal> [AND ...]
        (ops: = != < <= > >= IN (...) IS [NOT] NULL; literals: number,
         'string', TRUE/FALSE, DATE 'iso', TIMESTAMP 'iso')
  UPDATE <t> SET c = <expr>[, ...] WHERE <predicates>   (copy-on-write
        via keyed merge: requires PRIMARY KEY property or key= kwarg)
  ALTER TABLE <t> SET TBLPROPERTIES ('k' = 'v'[, ...])
  ALTER TABLE <t> UNSET TBLPROPERTIES ('k'[, ...])
  ALTER TABLE <t> CREATE BRANCH|TAG <name> [AS OF VERSION <snapshot_id>]
  ALTER TABLE <t> DROP BRANCH|TAG <name>
  ALTER TABLE <t> RENAME COLUMN <a> TO <b>
  ALTER TABLE <t> ADD COLUMN <name> <ddl-type> [DEFAULT <literal>]
  ALTER TABLE <t> DROP COLUMN <name>
  ALTER TABLE <t> ALTER COLUMN <name> TYPE <ddl-type>   (widening only)
  ALTER TABLE <t> SET PARTITION SPEC (day(warc_ts), truncate(url, 16))
        (partition-transform evolution; metadata-only — empty parens clear)
  OPTIMIZE <t> [WHERE <predicates>] [ZORDER BY (c1, c2[, extra...])]
        (WHERE scopes the rewrite plan to files whose stats might match —
         whole-file rewrites, never row filtering)
  VACUUM <t> [RETAIN <n> HOURS] [DRY RUN]   (DRY RUN previews: no mutation)
  DESCRIBE [TABLE] <t>        (column listing: name, type, nullable)
  DESCRIBE HISTORY|DETAIL <t>
  SHOW TABLES                  (catalog listing: name, path, pinned snapshot)
  SHOW PARTITIONS|FILES|MANIFESTS|REFS|SNAPSHOTS <t>
        (metadata DataFrames; no data read)
  SHOW TBLPROPERTIES <t> [('key')]
  TRUNCATE TABLE <t>     (metadata-only: drops every live file from the
         manifest in one commit; history/tags survive, expiry reclaims)
  DROP TABLE <name> [PURGE]   (catalog names only: unregister in one
         catalog CAS; PURGE also deletes the table directory)
  ANALYZE TABLE <t> COMPUTE STATISTICS [FOR COLUMNS c1[, ...]]
         (per-column NDV — metadata-only from the key sketches where
          available, one single-column counting scan otherwise)
  INSERT INTO <t> SELECT ...            (atomic append of the query result)
  CREATE [OR REPLACE] TABLE <t> AS SELECT ...   (CTAS — schema from the
         query; OR REPLACE atomically overwrites an existing table)
  CREATE [OR REPLACE] VIEW <name> AS SELECT ...   (catalog-persisted SQL
         view — the query TEXT is stored, nothing materializes; reads
         resolve against the pins of the moment. SELECTs referencing the
         view auto-register its dependency closure)
  DROP VIEW <name>
  SHOW VIEWS                   (name + definition of every catalog view)
  REPLACE TABLE <t> AS SELECT ...       (RTAS — table must exist; one
         atomic overwrite snapshot, history/tags/properties survive)
  CALL <proc>(<t>[, arg | name => arg ...])   (Iceberg-style procedures:
        expire_snapshots, remove_orphan_files, rollback_to_snapshot,
        rollback_to_timestamp, cherry_pick_snapshot, fast_forward,
        rewrite_manifests, add_files)
  SELECT / WITH ...  → spark.sql passthrough; any FROM item may carry
        time travel: <t> FOR VERSION AS OF <snapshot_id|'tag'|'branch'>
        or <t> FOR TIMESTAMP AS OF TIMESTAMP '<iso>' — the clause is
        resolved to a snapshot-scoped scan registered as a temp view and
        substituted before Catalyst sees the statement

Table references: a single-quoted path ``'/data/pages'`` or a bare name
resolved through the attached :class:`~.table.catalog.Catalog`.

This is a deliberate SUBSET parser: anything outside the grammar raises
``IcehouseSQLError`` with the unsupported fragment — never a silent
misread. The parse is regex/tokenizer-based because the statement shapes
are fixed; expression evaluation is delegated to Spark (``F.expr``) so SQL
semantics stay Catalyst's, not ours.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table.format import IcehouseTable
from .table.predicates import Predicate


class IcehouseSQLError(ValueError):
    """Statement outside the supported grammar (the message names the
    offending fragment — fix the statement or use the Python API)."""


@dataclass
class DMLResult:
    """Uniform statement result: what ran and the engine-native outcome."""

    statement: str
    detail: object = None


_WS = re.compile(r"\s+")


def _squash(stmt: str) -> str:
    return _WS.sub(" ", stmt.strip()).rstrip(";").strip()


_LITERAL = re.compile(
    r"""^(?:
        (?P<ts>TIMESTAMP\s*'(?P<tsv>[^']+)') |
        (?P<dt>DATE\s*'(?P<dtv>[^']+)') |
        '(?P<str>[^']*)' |
        (?P<bool>TRUE|FALSE) |
        (?P<null>NULL) |
        (?P<num>-?\d+(?:\.\d+)?)
    )$""",
    re.I | re.X,
)


def _parse_literal(tok: str):
    m = _LITERAL.match(tok.strip())
    if not m:
        raise IcehouseSQLError(f"unsupported literal: {tok!r}")
    if m.group("ts"):
        return datetime.datetime.fromisoformat(m.group("tsv"))
    if m.group("dt"):
        return datetime.date.fromisoformat(m.group("dtv"))
    if m.group("str") is not None:
        return m.group("str")
    if m.group("bool"):
        return m.group("bool").upper() == "TRUE"
    if m.group("null"):
        return None
    n = m.group("num")
    return float(n) if "." in n else int(n)


_PRED = re.compile(
    r"^(?P<col>[A-Za-z_][\w.]*)\s*"
    r"(?:(?P<op><=|>=|!=|=|<|>)\s*(?P<val>.+)"
    r"|(?P<in>IN)\s*\((?P<vals>[^)]*)\)"
    r"|IS\s+(?P<notnull>NOT\s+)?NULL)$",
    re.I,
)

_OP_MAP = {"=": "=", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


def parse_predicates(where: str) -> list[Predicate]:
    """Conjunctive simple predicates → engine Predicate list (the same
    objects delete_where and the stats pruner consume — so a SQL DELETE
    prunes files exactly like the Python API)."""
    preds = []
    for clause in re.split(r"\s+AND\s+", where.strip(), flags=re.I):
        m = _PRED.match(clause.strip())
        if not m:
            raise IcehouseSQLError(f"unsupported WHERE clause: {clause!r}")
        col = m.group("col").split(".")[-1]
        if m.group("in"):
            vals = tuple(
                _parse_literal(v) for v in m.group("vals").split(",") if v.strip()
            )
            preds.append(Predicate(col, "in", vals))
        elif m.group("op"):
            op = m.group("op")
            if op == "!=":
                raise IcehouseSQLError(
                    "!= cannot prune by file stats; DELETE the complement "
                    "or use the Python API with a scan filter"
                )
            preds.append(Predicate(col, _OP_MAP[op], _parse_literal(m.group("val"))))
        else:
            preds.append(
                Predicate(col, "is_null" if not m.group("notnull") else "not_null")
            )
    return preds


class IcehouseSQL:
    def __init__(self, spark: SparkSession, catalog=None):
        self.spark = spark
        self.catalog = catalog
        # catalog tables THIS front end auto-registered for SELECTs: kept
        # fresh (re-pinned) per statement, while names the caller
        # registered themselves are never clobbered
        self._auto_tables: set[str] = set()

    # ------------------------------------------------------------ resolve

    def _table(self, ref: str) -> IcehouseTable:
        ref = ref.strip()
        if ref.startswith("'") and ref.endswith("'"):
            return IcehouseTable(self.spark, ref[1:-1])
        if self.catalog is not None:
            return self.catalog.table(ref)
        raise IcehouseSQLError(
            f"table reference {ref!r}: use a quoted path, or attach a "
            f"Catalog for name resolution"
        )

    def _source(self, ref: str) -> DataFrame:
        ref = ref.strip()
        if ref.startswith("(") and ref.endswith(")"):
            return self.spark.sql(ref[1:-1])
        return self.spark.table(ref)

    # ------------------------------------------------------------ dispatch

    def sql(self, stmt: str) -> object:
        s = _squash(stmt)
        head = s.split(" ", 1)[0].upper()
        if head in ("SELECT", "WITH"):
            if self.catalog is not None:
                # catalog views resolve on demand: registering a referenced
                # view registers its dependency closure (tables at their
                # pins, prerequisite views) as temp views, so a SELECT over
                # a view needs no prior register_views() call
                from .table.catalog import _in_closure, _references, _view_order

                md = self.catalog.load_metadata()
                views = md.get("views", {})
                for v in self.catalog.view_names():
                    if _references(s, v):
                        self.catalog.read_view(v)
                        # read_view registered the view closure's TABLES
                        # as temp views at the current pins; record them
                        # as auto-managed (ADVICE r5) or a later
                        # sql("SELECT ... FROM <table>") after a pin
                        # advance would see tableExists() and keep the
                        # stale registration — wrong results
                        order = [
                            u for u in _view_order(views)
                            if u == v or _in_closure(views, v, u)
                        ]
                        for tname in md["tables"]:
                            if any(_references(views[u], tname) for u in order):
                                self._auto_tables.add(tname)
                # catalog TABLES (incl. materialized views' backing
                # tables) resolve on demand too — registered at their
                # CURRENT pin, but never clobbering a temp view the
                # caller registered themselves (e.g.
                # register_views(metadata=True))
                for t in self.catalog.table_names():
                    if _references(s, t) and (
                        t in self._auto_tables
                        or not self.spark.catalog.tableExists(t)
                    ):
                        self.catalog.read(t).createOrReplaceTempView(t)
                        self._auto_tables.add(t)
            return self.spark.sql(self._rewrite_time_travel(s))
        if s.upper() == "SHOW TABLES":
            if self.catalog is None:
                raise IcehouseSQLError(
                    "SHOW TABLES needs an attached Catalog"
                )
            md = self.catalog.load_metadata()["tables"]
            return self.spark.createDataFrame(
                [(n, e["path"], e["snapshot"]) for n, e in sorted(md.items())],
                "name string, path string, pinned_snapshot long",
            )
        if s.upper() == "SHOW VIEWS":
            if self.catalog is None:
                raise IcehouseSQLError("SHOW VIEWS needs an attached Catalog")
            views = self.catalog.load_metadata().get("views", {})
            return self.spark.createDataFrame(
                sorted(views.items()) or [],
                "name string, sql string",
            )
        if s.upper() == "SHOW MATERIALIZED VIEWS":
            if self.catalog is None:
                raise IcehouseSQLError(
                    "SHOW MATERIALIZED VIEWS needs an attached Catalog"
                )
            mviews = self.catalog.load_metadata().get("mviews", {})
            return self.spark.createDataFrame(
                [
                    (n, mv["sql"], mv["source"], mv["refreshed"])
                    for n, mv in sorted(mviews.items())
                ]
                or [],
                "name string, sql string, source string, "
                "refreshed_snapshot long",
            )
        handler = {
            "MERGE": self._merge,
            "DELETE": self._delete,
            "UPDATE": self._update,
            "ALTER": self._alter,
            "OPTIMIZE": self._optimize,
            "VACUUM": self._vacuum,
            "DESCRIBE": self._describe,
            "SHOW": self._show,
            "CALL": self._call,
            "INSERT": self._insert,
            "ANALYZE": self._analyze,
            "CREATE": self._create,
            "REPLACE": self._create,
            "TRUNCATE": self._truncate,
            "DROP": self._drop,
            "REFRESH": self._refresh,
        }.get(head)
        if handler is None:
            raise IcehouseSQLError(f"unsupported statement: {head}")
        return handler(s)

    # --------------------------------------------------------- time travel

    _TIME_TRAVEL = re.compile(
        r"(?P<ref>'[^']+'|[A-Za-z_][\w.]*)\s+FOR\s+"
        r"(?:(?P<ver>VERSION|SYSTEM_VERSION)|(?P<ts>TIMESTAMP|SYSTEM_TIME))"
        r"\s+AS\s+OF\s+"
        r"(?P<val>TIMESTAMP\s*'[^']+'|'[^']+'|\d+)",
        re.I,
    )
    _tt_views = 0

    def _rewrite_time_travel(self, s: str) -> str:
        """Substitute each ``<t> FOR VERSION|TIMESTAMP AS OF <x>`` FROM item
        with a temp view over the snapshot-scoped scan. VERSION accepts a
        snapshot id or a quoted tag/branch name; TIMESTAMP resolves through
        :meth:`IcehouseTable.snapshot_as_of` (main-chain ancestors only, so
        staged/branch commits stay invisible — reader-at-that-instant
        semantics). Snapshot resolution happens NOW, at parse time: the
        registered view pins the file list, so a concurrent commit between
        parse and action cannot shift the result."""

        def _sub(m: re.Match) -> str:
            table = self._table(m.group("ref"))
            val = m.group("val").strip()
            if m.group("ts"):
                lit = _parse_literal(val)
                if isinstance(lit, str):
                    lit = datetime.datetime.fromisoformat(lit)
                if not isinstance(lit, datetime.datetime):
                    raise IcehouseSQLError(
                        f"TIMESTAMP AS OF needs a timestamp literal, got {val!r}"
                    )
                snap_id = table.snapshot_as_of(lit).snapshot_id
            else:
                snap_id = _parse_literal(val)  # int id or 'tag'/'branch' name
                if not isinstance(snap_id, (int, str)):
                    raise IcehouseSQLError(
                        f"VERSION AS OF needs a snapshot id or a quoted "
                        f"tag/branch name, got {val!r}"
                    )
            IcehouseSQL._tt_views += 1
            view = f"__icehouse_tt_{IcehouseSQL._tt_views}"
            table.scan(snapshot_id=snap_id).createOrReplaceTempView(view)
            return view

        return self._TIME_TRAVEL.sub(_sub, s)

    # ---------------------------------------------------------------- CALL

    _CALL = re.compile(r"^CALL (?P<proc>\w+)\s*\((?P<args>.*)\)$", re.I | re.S)
    _CALL_ARG = re.compile(r"^(?:(?P<name>\w+)\s*=>\s*)?(?P<val>.+)$", re.S)

    def _call(self, s: str):
        """Iceberg-style maintenance procedures, compiled onto the engine's
        tested primitives (Spark would route these to
        ``catalog.system.<proc>``; here the dispatcher is the catalog)."""
        m = self._CALL.match(s)
        if not m:
            raise IcehouseSQLError("CALL must be: CALL <proc>(<args>)")
        proc = m.group("proc").lower()
        pos: list[object] = []
        named: dict[str, object] = {}
        raw_args = self._split_args(m.group("args"))
        if not raw_args:
            raise IcehouseSQLError("CALL needs at least the table argument")
        for i, tok in enumerate(raw_args):
            am = self._CALL_ARG.match(tok.strip())
            name, val = am.group("name"), am.group("val").strip()
            if name:
                named[name.lower()] = _parse_literal(val)
            elif named:
                raise IcehouseSQLError(
                    f"positional arg {val!r} after named args"
                )
            elif i == 0:
                pos.append(self._table(val))  # quoted path or catalog name
            else:
                pos.append(_parse_literal(val))
        handler = getattr(self, f"_proc_{proc}", None)
        if handler is None:
            raise IcehouseSQLError(f"unknown procedure: {proc}")
        try:
            return DMLResult(f"call-{proc}", handler(*pos, **named))
        except TypeError as e:
            raise IcehouseSQLError(f"CALL {proc}: {e}") from None

    @staticmethod
    def _split_args(argstr: str) -> list[str]:
        """Split on commas outside single quotes (args are flat literals)."""
        out, buf, in_q = [], [], False
        for ch in argstr:
            if ch == "'":
                in_q = not in_q
            if ch == "," and not in_q:
                out.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        tail = "".join(buf).strip()
        if tail:
            out.append(tail)
        return [a for a in (x.strip() for x in out) if a]

    @staticmethod
    def _to_epoch_ms(v, what: str) -> int:
        if isinstance(v, datetime.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=datetime.timezone.utc)
            return int(v.timestamp() * 1000)
        if isinstance(v, (int, float)):
            return int(v)
        raise IcehouseSQLError(
            f"{what} needs TIMESTAMP '<iso>' or epoch millis, got {v!r}"
        )

    def _proc_expire_snapshots(self, table, older_than=None, retain_last=None):
        from .maintenance import expire_snapshots

        older_ms = (
            self._to_epoch_ms(older_than, "older_than")
            if older_than is not None else None
        )
        return expire_snapshots(
            table, keep_last=retain_last, older_than_ms=older_ms
        )

    def _proc_remove_orphan_files(self, table, older_than=None):
        from .maintenance import remove_orphan_files

        older_ms = (
            self._to_epoch_ms(older_than, "older_than")
            if older_than is not None else None
        )
        return remove_orphan_files(table, older_than_ms=older_ms)

    def _proc_rollback_to_snapshot(self, table, snapshot_id):
        return table.rollback_to(snapshot_id)

    def _proc_rollback_to_timestamp(self, table, ts):
        snap = table.snapshot_as_of(ts)
        return table.rollback_to(snap.snapshot_id)

    def _proc_cherry_pick_snapshot(self, table, snapshot_id):
        return table.cherry_pick(snapshot_id)

    def _proc_fast_forward(self, table, branch):
        return table.fast_forward(branch)

    def _proc_add_files(self, table, source, mode="hardlink"):
        """CALL add_files('<table>', '<dir-or-file>' [, mode => 'copy']) —
        register existing parquet without rewriting bytes (migration)."""
        if not isinstance(source, str):
            raise IcehouseSQLError(
                f"add_files source must be a quoted path, got {source!r}"
            )
        return table.add_files(source, mode=mode)

    def _proc_rewrite_manifests(self, table, target_entries=None):
        from .maintenance import rewrite_manifests

        kw = {} if target_entries is None else {"target_entries": target_entries}
        return rewrite_manifests(table, **kw)

    # ------------------------------------------------------- INSERT / CTAS

    _INSERT = re.compile(
        r"^INSERT INTO (?P<t>'[^']+'|[\w.]+) (?P<q>(?:SELECT|WITH|TABLE) .+)$",
        re.I,
    )
    _CTAS = re.compile(
        r"^(?:CREATE(?P<orr> OR REPLACE)?|(?P<repl>REPLACE)) TABLE "
        r"(?P<t>'[^']+'|[\w.]+) AS (?P<q>(?:SELECT|WITH) .+)$",
        re.I,
    )
    _CREATE_VIEW = re.compile(
        r"^CREATE(?P<orr> OR REPLACE)? VIEW (?P<t>[\w.]+) AS "
        r"(?P<q>(?:SELECT|WITH) .+)$",
        re.I,
    )
    _CREATE_MVIEW = re.compile(
        r"^CREATE MATERIALIZED VIEW (?P<t>[\w.]+) AS (?P<q>SELECT .+)$",
        re.I | re.S,
    )
    _REFRESH_MV = re.compile(
        r"^REFRESH MATERIALIZED VIEW (?P<t>[\w.]+)(?P<full> FULL)?$", re.I
    )

    def _refresh(self, s: str):
        """REFRESH MATERIALIZED VIEW <name> [FULL] — CDC-driven
        incremental maintenance of the materialized aggregate (see
        table/mview.py); FULL forces the one-commit recomputation."""
        m = self._REFRESH_MV.match(s)
        if not m:
            raise IcehouseSQLError(
                "REFRESH must be: REFRESH MATERIALIZED VIEW <name> [FULL]"
            )
        if self.catalog is None:
            raise IcehouseSQLError(
                "REFRESH MATERIALIZED VIEW needs an attached Catalog"
            )
        return self.catalog.refresh_materialized_view(
            m.group("t").strip(), full=m.group("full") is not None
        )

    def _insert(self, s: str):
        """INSERT INTO <t> SELECT ... — one atomic append snapshot. The
        SELECT runs through the same passthrough as standalone queries, so
        time-travel FROM items work here too (e.g. re-inserting rows from
        an old snapshot)."""
        m = self._INSERT.match(s)
        if not m:
            raise IcehouseSQLError(
                "INSERT must be: INSERT INTO <t> SELECT ... "
                "(no VALUES lists — inserts are set-oriented here)"
            )
        table = self._table(m.group("t"))
        df = self.spark.sql(self._rewrite_time_travel(m.group("q")))
        return DMLResult("insert", table.append(df))

    def _create(self, s: str):
        """CREATE [OR REPLACE] TABLE <t> AS SELECT ... (CTAS/RTAS):
        materialize the query as a brand-new Icehouse table, or — with OR
        REPLACE / REPLACE TABLE — as ONE atomic overwrite snapshot of an
        existing one (history, tags, and properties survive; readers see
        either the old row set or the new, never a mix). REPLACE TABLE
        requires the table to exist; CREATE TABLE requires it not to.

        CREATE [OR REPLACE] VIEW <name> AS SELECT ... persists the QUERY
        TEXT in the catalog (Catalog.create_view) — nothing materializes;
        reads resolve against the catalog pins of the moment."""
        mm = self._CREATE_MVIEW.match(s)
        if mm:
            if self.catalog is None:
                raise IcehouseSQLError(
                    "CREATE MATERIALIZED VIEW needs an attached Catalog"
                )
            return self.catalog.create_materialized_view(
                mm.group("t").strip(), mm.group("q").strip()
            )
        mv = self._CREATE_VIEW.match(s)
        if mv:
            if self.catalog is None:
                raise IcehouseSQLError(
                    "CREATE VIEW needs an attached Catalog (views are "
                    "catalog objects)"
                )
            self.catalog.create_view(
                mv.group("t").strip(), mv.group("q").strip(),
                replace=mv.group("orr") is not None,
            )
            return DMLResult("create-view", mv.group("t").strip())
        m = self._CTAS.match(s)
        if not m:
            raise IcehouseSQLError(
                "CREATE/REPLACE supports: CREATE [OR REPLACE] TABLE <t> "
                "AS SELECT ... or REPLACE TABLE <t> AS SELECT ... "
                "(schemas come from the query; column DDL lives in "
                "ALTER TABLE)"
            )
        df = self.spark.sql(self._rewrite_time_travel(m.group("q")))
        ref = m.group("t").strip()
        replace_ok = bool(m.group("orr") or m.group("repl"))
        must_exist = bool(m.group("repl"))
        existing = None
        if ref.startswith("'") and ref.endswith("'"):
            cand = IcehouseTable(self.spark, ref[1:-1])
            existing = cand if cand.exists() else None
        elif self.catalog is not None and ref in self.catalog.table_names():
            existing = self.catalog.table(ref)
        if existing is not None:
            if not replace_ok:
                raise IcehouseSQLError(
                    f"CREATE TABLE {ref!r}: table exists — use CREATE OR "
                    f"REPLACE / REPLACE TABLE to overwrite atomically"
                )
            # one atomic commit: swap every live file AND install the
            # query's schema. History/tags/properties survive; time travel
            # to pre-replace snapshots resolves columns by name against the
            # old files (so a replace that keeps column names+types reads
            # history cleanly; an incompatible one surfaces at read time,
            # never silently).
            snap = existing.replace_files(
                [f.path for f in existing.live_files()], df,
                operation="overwrite",
                schema_json=df.schema.jsonValue(),
            )
            return DMLResult("replace-table-as", snap)
        if must_exist:
            raise IcehouseSQLError(
                f"REPLACE TABLE {ref!r}: no such table — use CREATE TABLE "
                f"(or CREATE OR REPLACE) to create it"
            )
        if ref.startswith("'") and ref.endswith("'"):
            tbl = IcehouseTable.create(self.spark, ref[1:-1], df)
        elif self.catalog is not None:
            tbl = self.catalog.create_table(ref, df)
        else:
            raise IcehouseSQLError(
                f"CREATE TABLE {ref!r}: use a quoted path, or attach a "
                f"Catalog for name resolution"
            )
        return DMLResult("create-table-as", tbl)

    _DROP = re.compile(
        r"^DROP (?P<kind>TABLE|MATERIALIZED VIEW|VIEW) (?P<t>[\w.]+)"
        r"(?P<purge> PURGE)?$",
        re.I,
    )

    def _drop(self, s: str):
        """DROP TABLE <name> [PURGE] — catalog names only: dropping
        unregisters the table (one catalog CAS); PURGE additionally
        deletes the table directory. A quoted path has no catalog entry
        to drop — deleting a bare directory through SQL would be rm -rf
        in disguise, so it is refused."""
        m = self._DROP.match(s)
        if not m:
            raise IcehouseSQLError(
                "DROP supports: DROP TABLE <catalog-name> [PURGE] or "
                "DROP VIEW <name> (quoted paths are not droppable "
                "through SQL)"
            )
        if self.catalog is None:
            raise IcehouseSQLError(
                "DROP TABLE/VIEW needs an attached Catalog for name "
                "resolution"
            )
        name = m.group("t").strip()
        kind = m.group("kind").upper()
        if kind == "MATERIALIZED VIEW":
            self.catalog.drop_materialized_view(
                name, purge=m.group("purge") is not None
            )
            return DMLResult("drop-materialized-view", name)
        if kind == "VIEW":
            if m.group("purge"):
                raise IcehouseSQLError("PURGE applies to tables, not views")
            self.catalog.drop_view(name)
            return DMLResult("drop-view", name)
        self.catalog.drop_table(name, purge=m.group("purge") is not None)
        return DMLResult("drop-table", name)

    _TRUNCATE = re.compile(
        r"^TRUNCATE TABLE (?P<t>'[^']+'|[\w.]+)$", re.I
    )

    def _truncate(self, s: str):
        """TRUNCATE TABLE <t> — drop every live row in one metadata-only
        commit (no data read/written; history and tags survive; see
        :func:`~.table.deletes.truncate`). The explicit keyword replaces
        the unqualified DELETE FROM this grammar deliberately refuses."""
        from .table.deletes import truncate

        m = self._TRUNCATE.match(s)
        if not m:
            raise IcehouseSQLError("TRUNCATE must be: TRUNCATE TABLE <t>")
        return DMLResult("truncate", truncate(self._table(m.group("t"))))

    # --------------------------------------------------------------- MERGE

    _MERGE = re.compile(
        r"^MERGE INTO (?P<t>'[^']+'|[\w.]+)(?: AS)? (?P<ta>\w+) "
        r"USING (?P<s>\([^)]*(?:\([^)]*\)[^)]*)*\)|[\w.]+)(?: AS)? (?P<sa>\w+) "
        r"ON (?P<on>.+?) "
        r"(?P<clauses>WHEN .+)$",
        re.I,
    )

    def _merge(self, s: str):
        from .operators.merge import merge_into

        m = self._MERGE.match(s)
        if not m:
            raise IcehouseSQLError(
                "MERGE must be: MERGE INTO <t> [AS] a USING <src> [AS] b "
                "ON ... WHEN ..."
            )
        table = self._table(m.group("t"))
        source = self._source(m.group("s"))
        ta, sa = m.group("ta"), m.group("sa")
        keys = self._merge_keys(m.group("on"), ta, sa)
        update_cols, delete_matched, insert_new, matched_any = (
            self._merge_clauses(m.group("clauses"), sa)
        )
        if not matched_any:
            # insert-only MERGE: one atomic append of the anti-joined rows
            new_rows = source.join(
                table.scan().select(*keys), keys, "left_anti"
            )
            snap = table.append(new_rows)
            return DMLResult("merge-insert-only", snap)
        res = merge_into(
            table, source, keys,
            update_cols=update_cols,
            delete_matched=delete_matched,
            insert_new=insert_new,
        )
        return DMLResult("merge", res)

    @staticmethod
    def _merge_keys(on: str, ta: str, sa: str) -> list[str]:
        keys = []
        for clause in re.split(r"\s+AND\s+", on.strip(), flags=re.I):
            eq = re.match(
                r"^(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)$", clause.strip()
            )
            if not eq:
                raise IcehouseSQLError(
                    f"ON supports alias-qualified equi-conditions only, "
                    f"got: {clause!r}"
                )
            a1, c1, a2, c2 = eq.groups()
            if {a1, a2} != {ta, sa}:
                raise IcehouseSQLError(f"unknown alias in ON: {clause!r}")
            if c1 != c2:
                raise IcehouseSQLError(
                    f"merge keys must share a name on both sides "
                    f"(got {c1!r} = {c2!r}); alias the source column first"
                )
            keys.append(c1)
        return keys

    @staticmethod
    def _merge_clauses(clauses: str, sa: str):
        update_cols = None
        delete_matched = False
        insert_new = False
        matched_any = False
        rest = clauses.strip()
        pat = re.compile(
            r"^WHEN (?P<not>NOT )?MATCHED THEN "
            r"(?P<act>UPDATE SET (?P<set>.+?)|DELETE|INSERT \*)"
            r"(?= WHEN |$)",
            re.I,
        )
        while rest:
            m = pat.match(rest)
            if not m:
                raise IcehouseSQLError(f"unsupported MERGE clause: {rest!r}")
            act = m.group("act").upper()
            if m.group("not"):
                if not act.startswith("INSERT"):
                    raise IcehouseSQLError(
                        "WHEN NOT MATCHED supports INSERT * only"
                    )
                insert_new = True
            elif act == "DELETE":
                matched_any = delete_matched = True
            elif act.startswith("UPDATE"):
                matched_any = True
                setlist = m.group("set").strip()
                if setlist != "*":
                    update_cols = []
                    for item in setlist.split(","):
                        a = re.match(
                            r"^\s*(\w+)\s*=\s*(\w+)\.(\w+)\s*$", item
                        )
                        if not a or a.group(2) != sa or a.group(1) != a.group(3):
                            raise IcehouseSQLError(
                                f"UPDATE SET supports * or c = {sa}.c "
                                f"(same column), got: {item.strip()!r}"
                            )
                        update_cols.append(a.group(1))
            rest = rest[m.end():].strip()
        if delete_matched and update_cols is not None:
            raise IcehouseSQLError(
                "WHEN MATCHED THEN DELETE cannot combine with UPDATE SET"
            )
        return update_cols, delete_matched, insert_new, matched_any

    # -------------------------------------------------------------- DELETE

    _DELETE = re.compile(
        r"^DELETE FROM (?P<t>'[^']+'|[\w.]+) WHERE (?P<w>.+)$", re.I
    )

    def _delete(self, s: str):
        from .table.deletes import delete_where

        m = self._DELETE.match(s)
        if not m:
            raise IcehouseSQLError(
                "DELETE must be: DELETE FROM <t> WHERE <predicates> "
                "(unqualified DELETE FROM would drop the table — use "
                "overwrite explicitly)"
            )
        table = self._table(m.group("t"))
        snap = delete_where(table, parse_predicates(m.group("w")))
        return DMLResult("delete", snap)

    # -------------------------------------------------------------- UPDATE

    _UPDATE = re.compile(
        r"^UPDATE (?P<t>'[^']+'|[\w.]+) SET (?P<set>.+?) WHERE (?P<w>.+)$",
        re.I,
    )

    def _update(self, s: str):
        """Copy-on-write UPDATE: read matched rows, apply SET exprs via
        Catalyst (F.expr), and merge them back keyed on the table's
        ``primary.key`` property — ONE atomic commit, file-pruned by the
        WHERE predicates like any merge."""
        from .operators.merge import merge_into

        m = self._UPDATE.match(s)
        if not m:
            raise IcehouseSQLError(
                "UPDATE must be: UPDATE <t> SET c = expr[, ...] WHERE ..."
            )
        table = self._table(m.group("t"))
        key_prop = table.properties().get("primary.key")
        if not key_prop:
            raise IcehouseSQLError(
                "UPDATE needs the table property primary.key (set via "
                "ALTER TABLE ... SET TBLPROPERTIES ('primary.key' = 'col'))"
            )
        keys = [k.strip() for k in key_prop.split(",")]
        preds = parse_predicates(m.group("w"))
        matched = table.scan(preds)
        for pred in preds:  # exact row semantics on top of file pruning
            matched = matched.filter(self._pred_expr(pred))
        for item in m.group("set").split(","):
            a = re.match(r"^\s*(\w+)\s*=\s*(.+?)\s*$", item)
            if not a:
                raise IcehouseSQLError(f"bad SET item: {item.strip()!r}")
            if a.group(1) in keys:
                raise IcehouseSQLError("cannot UPDATE a primary.key column")
            matched = matched.withColumn(a.group(1), F.expr(a.group(2)))
        res = merge_into(table, matched, keys, insert_new=False)
        return DMLResult("update", res)

    @staticmethod
    def _pred_expr(p: Predicate):
        c = F.col(p.column)
        return {
            "=": lambda: c == F.lit(p.value),
            "<": lambda: c < F.lit(p.value),
            "<=": lambda: c <= F.lit(p.value),
            ">": lambda: c > F.lit(p.value),
            ">=": lambda: c >= F.lit(p.value),
            "in": lambda: c.isin(list(p.value)),
            "is_null": lambda: c.isNull(),
            "not_null": lambda: c.isNotNull(),
        }[p.op]()

    # --------------------------------------------------------------- ALTER

    _ALTER = re.compile(
        r"^ALTER TABLE (?P<t>'[^']+'|[\w.]+) "
        r"(?P<un>UNSET|SET) TBLPROPERTIES \((?P<props>.+)\)$",
        re.I,
    )
    _ALTER_REF = re.compile(
        r"^ALTER TABLE (?P<t>'[^']+'|[\w.]+) "
        r"(?P<act>CREATE|DROP) (?P<kind>BRANCH|TAG) (?P<name>\w+)"
        r"(?: AS OF VERSION (?P<v>\d+))?$",
        re.I,
    )
    _ALTER_PTSPEC = re.compile(
        r"^ALTER TABLE (?P<t>'[^']+'|[\w.]+) "
        r"SET PARTITION SPEC \((?P<spec>.*)\)$",
        re.I,
    )
    _ALTER_COL = re.compile(
        r"^ALTER TABLE (?P<t>'[^']+'|[\w.]+) (?:"
        r"RENAME COLUMN (?P<old>\w+) TO (?P<new>\w+)"
        r"|ADD COLUMNS? (?P<add>\w+) (?P<type>[\w()<>, ]+?)"
        r"(?: DEFAULT (?P<def>.+))?"
        r"|DROP COLUMNS? (?P<drop>\w+)"
        r"|ALTER COLUMN (?P<wide>\w+) TYPE (?P<wtype>[\w()<>, ]+)"
        r")$",
        re.I,
    )

    _ALTER_ORDER = re.compile(
        r"^ALTER TABLE (?P<t>'[^']+'|[\w.]+) WRITE "
        r"(?:ORDERED BY \((?P<cols>[^)]+)\)|(?P<un>UNORDERED))$",
        re.I,
    )

    def _alter(self, s: str):
        m = self._ALTER_ORDER.match(s)
        if m:
            # Iceberg's WRITE ORDERED BY DDL → the sort.order property
            # (format.py _stage_dataframe range-sorts staged appends on it)
            table = self._table(m.group("t"))
            val = None if m.group("un") else ",".join(
                c.strip() for c in m.group("cols").split(",")
            )
            return DMLResult(
                "alter-write-order", table.set_properties({"sort.order": val})
            )
        m = self._ALTER_REF.match(s)
        if m:
            return self._alter_ref(m)
        m = self._ALTER_COL.match(s)
        if m:
            return self._alter_col(m)
        m = self._ALTER_PTSPEC.match(s)
        if m:
            # Iceberg's spec-evolution DDL: metadata-only commit, existing
            # files keep their write-time tags (format.py
            # set_partition_spec). Empty parens clear the spec.
            table = self._table(m.group("t"))
            # split top-level commas only: truncate(url,16) keeps its own
            parts, depth, buf = [], 0, []
            for ch in m.group("spec"):
                depth += ch == "("
                depth -= ch == ")"
                if ch == "," and depth == 0:
                    parts.append("".join(buf))
                    buf = []
                else:
                    buf.append(ch)
            parts.append("".join(buf))
            return DMLResult(
                "alter-partition-spec",
                table.set_partition_spec(
                    [p for p in (x.strip() for x in parts) if p]
                ),
            )
        m = self._ALTER.match(s)
        if not m:
            raise IcehouseSQLError(
                "ALTER TABLE supports SET/UNSET TBLPROPERTIES, CREATE/DROP "
                "BRANCH/TAG [AS OF VERSION n], SET PARTITION SPEC (...), "
                "RENAME/ADD/DROP COLUMN and ALTER COLUMN ... TYPE (widening)"
            )
        table = self._table(m.group("t"))
        if m.group("un").upper() == "UNSET":
            keys = re.findall(r"'([^']+)'", m.group("props"))
            snap = table.set_properties({k: None for k in keys})
        else:
            pairs = re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("props"))
            if not pairs:
                raise IcehouseSQLError("SET TBLPROPERTIES ('k' = 'v'[, ...])")
            snap = table.set_properties(dict(pairs))
        return DMLResult("alter-properties", snap)

    def _alter_ref(self, m: re.Match):
        """Branch/tag DDL → the ref primitives (each is one CAS set-ref
        commit; see table/format.py create_branch/create_tag)."""
        table = self._table(m.group("t"))
        act = m.group("act").upper()
        kind = m.group("kind").lower()
        name = m.group("name")
        if act == "DROP":
            if m.group("v"):
                raise IcehouseSQLError("DROP BRANCH/TAG takes no AS OF")
            snap = (table.drop_branch if kind == "branch" else table.drop_tag)(name)
            return DMLResult(f"alter-drop-{kind}", snap)
        at = int(m.group("v")) if m.group("v") else None
        snap = (
            table.create_branch(name, snapshot_id=at)
            if kind == "branch" else table.create_tag(name, snapshot_id=at)
        )
        return DMLResult(f"alter-create-{kind}", snap)

    def _alter_col(self, m: re.Match):
        """Column DDL → the name-mapping/metadata-only evolution primitives
        (no data rewrite; see table/format.py schema-evolution section)."""
        table = self._table(m.group("t"))
        if m.group("old"):
            return DMLResult(
                "alter-rename-column",
                table.rename_column(m.group("old"), m.group("new")),
            )
        if m.group("add"):
            default = (
                _parse_literal(m.group("def")) if m.group("def") else None
            )
            if isinstance(default, (datetime.datetime, datetime.date)):
                # add_column stores JSON-able scalars; ISO strings cast to
                # the column type at read time (format.py add_column)
                default = default.isoformat(sep=" ") if isinstance(
                    default, datetime.datetime) else default.isoformat()
            return DMLResult(
                "alter-add-column",
                table.add_column(
                    m.group("add"), m.group("type").strip(), default=default
                ),
            )
        if m.group("drop"):
            return DMLResult(
                "alter-drop-column", table.drop_column(m.group("drop"))
            )
        return DMLResult(
            "alter-widen-column",
            table.widen_column(m.group("wide"), m.group("wtype").strip()),
        )

    # ------------------------------------------------------- maintenance

    _OPTIMIZE = re.compile(
        r"^OPTIMIZE (?P<t>'[^']+'|[\w.]+)"
        r"(?: WHERE (?P<w>.+?))?"
        r"(?: ZORDER BY \((?P<cols>[^)]+)\))?$",
        re.I,
    )

    def _optimize(self, s: str):
        from .maintenance import compact
        from .maintenance.zorder import zorder_by

        m = self._OPTIMIZE.match(s)
        if not m:
            raise IcehouseSQLError(
                "OPTIMIZE <t> [WHERE <predicates>] [ZORDER BY (c1, c2[, ...])]"
            )
        table = self._table(m.group("t"))
        # WHERE scopes the rewrite plan to files that might hold matching
        # rows (whole-file rewrites — layout, never row filtering): the
        # Iceberg rewrite_data_files `where` / Delta `OPTIMIZE ... WHERE`
        preds = parse_predicates(m.group("w")) if m.group("w") else None
        if not m.group("cols"):
            return DMLResult(
                "optimize-compact", compact(table, predicates=preds)
            )
        cols = [c.strip() for c in m.group("cols").split(",")]
        if len(cols) < 2:
            raise IcehouseSQLError(
                "ZORDER BY needs >= 2 columns (one column: sort on write "
                "or use compact)"
            )
        snap = zorder_by(
            table, url_col=cols[0], ts_col=cols[1],
            extra_cols=cols[2:] or None, predicates=preds,
        )
        return DMLResult("optimize-zorder", snap)

    _VACUUM = re.compile(
        r"^VACUUM (?P<t>'[^']+'|[\w.]+)(?: RETAIN (?P<h>\d+) HOURS?)?"
        r"(?P<dry> DRY RUN)?$",
        re.I,
    )

    def _vacuum(self, s: str):
        import time

        from .maintenance import expire_snapshots

        m = self._VACUUM.match(s)
        if not m:
            raise IcehouseSQLError("VACUUM <t> [RETAIN <n> HOURS] [DRY RUN]")
        table = self._table(m.group("t"))
        older = (
            int(time.time() * 1000) - int(m.group("h")) * 3_600_000
            if m.group("h") else None
        )
        return DMLResult(
            "vacuum",
            expire_snapshots(
                table, older_than_ms=older, dry_run=bool(m.group("dry"))
            ),
        )

    _DESCRIBE = re.compile(
        r"^DESCRIBE (?:(?P<what>HISTORY|DETAIL|TABLE) )?(?P<t>'[^']+'|[\w.]+)$",
        re.I,
    )

    def _describe(self, s: str):
        m = self._DESCRIBE.match(s)
        if not m:
            raise IcehouseSQLError(
                "DESCRIBE supports: DESCRIBE [HISTORY|DETAIL|TABLE] <t>"
            )
        table = self._table(m.group("t"))
        what = (m.group("what") or "TABLE").upper()
        if what == "HISTORY":
            return table.history()
        if what == "DETAIL":
            return table.detail()
        # DESCRIBE [TABLE] <t>: the column listing (metadata-only)
        return self.spark.createDataFrame(
            [(f.name, f.dataType.simpleString(),
              "true" if f.nullable else "false")
             for f in table.schema().fields],
            "col_name string, data_type string, nullable string",
        )

    _ANALYZE = re.compile(
        r"^ANALYZE TABLE (?P<t>'[^']+'|[\w.]+) COMPUTE STATISTICS"
        r"(?: FOR COLUMNS (?P<cols>[\w ,]+))?$",
        re.I,
    )

    def _analyze(self, s: str):
        """Per-column NDV estimates. Sketched key columns (the
        ``sketch.cols`` property) answer METADATA-ONLY via
        ``approx_distinct_keys`` (bitmap-union of per-file sketches —
        zero data read on a 100-TB table); anything else falls back to
        ONE single-column counting scan, labeled so the caller can see
        which price was paid. Without FOR COLUMNS, the sketched columns
        are analyzed (refuses when there are none rather than silently
        full-scanning every column)."""
        m = self._ANALYZE.match(s)
        if not m:
            raise IcehouseSQLError(
                "ANALYZE TABLE <t> COMPUTE STATISTICS [FOR COLUMNS c1[, ...]]"
            )
        table = self._table(m.group("t"))
        if m.group("cols"):
            cols = [c.strip() for c in m.group("cols").split(",") if c.strip()]
        else:
            cols = [
                c.strip()
                for c in (table.properties().get("sketch.cols") or "").split(",")
                if c.strip()
            ]
            if not cols:
                raise IcehouseSQLError(
                    "no sketched columns to analyze — pass FOR COLUMNS "
                    "c1[, ...] or set the 'sketch.cols' table property"
                )
        known = {f.name for f in table.schema().fields}
        bad = [c for c in cols if c not in known]
        if bad:
            raise IcehouseSQLError(f"unknown column(s): {', '.join(bad)}")
        rows = []
        for c in cols:
            ndv = table.approx_distinct_keys(c)
            method = "sketch"
            if ndv is None:
                ndv = table.scan(columns=[c]).distinct().count()
                method = "scan"
            rows.append((c, ndv, method))
        return self.spark.createDataFrame(
            rows, "column string, ndv long, method string"
        )

    _SHOW = re.compile(
        r"^SHOW (?P<what>PARTITIONS|FILES|MANIFESTS|REFS|SNAPSHOTS|"
        r"TBLPROPERTIES) "
        r"(?P<t>'[^']+'|[\w.]+)(?:\s*\(\s*'(?P<key>[^']+)'\s*\))?$",
        re.I,
    )

    def _show(self, s: str):
        """SHOW PARTITIONS/FILES/MANIFESTS/REFS/SNAPSHOTS <t> → the
        metadata DataFrames (partitions() rollup by transform tuple +
        bucket; files(); manifests(); refs_df(); snapshots_df());
        SHOW TBLPROPERTIES <t> [('key')] → key/value rows — all
        metadata-sized, never a data read."""
        m = self._SHOW.match(s)
        if not m:
            raise IcehouseSQLError(
                "SHOW supports: SHOW PARTITIONS|FILES|MANIFESTS|REFS|"
                "SNAPSHOTS|TBLPROPERTIES <t> [('key')]"
            )
        table = self._table(m.group("t"))
        what = m.group("what").lower()
        if what == "tblproperties":
            props = table.properties()
            if m.group("key") is not None:
                k = m.group("key")
                props = {k: props[k]} if k in props else {}
            return self.spark.createDataFrame(
                [(k, str(v)) for k, v in sorted(props.items())],
                "key string, value string",
            )
        if m.group("key") is not None:
            raise IcehouseSQLError(
                "('key') selector is only valid with SHOW TBLPROPERTIES"
            )
        if what in ("refs", "snapshots"):
            return getattr(table, f"{what}_df")()
        return getattr(table, what)()
