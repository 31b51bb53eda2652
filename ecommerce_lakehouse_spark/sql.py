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
  OPTIMIZE <t> [ZORDER BY (c1, c2[, extra...])]
  VACUUM <t> [RETAIN <n> HOURS]
  DESCRIBE HISTORY <t>
  SELECT / WITH ...  → spark.sql passthrough

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
            return self.spark.sql(s)
        handler = {
            "MERGE": self._merge,
            "DELETE": self._delete,
            "UPDATE": self._update,
            "ALTER": self._alter,
            "OPTIMIZE": self._optimize,
            "VACUUM": self._vacuum,
            "DESCRIBE": self._describe,
        }.get(head)
        if handler is None:
            raise IcehouseSQLError(f"unsupported statement: {head}")
        return handler(s)

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

    def _alter(self, s: str):
        m = self._ALTER.match(s)
        if not m:
            raise IcehouseSQLError(
                "ALTER TABLE supports SET/UNSET TBLPROPERTIES only "
                "(schema evolution: use the Python API — rename_column etc.)"
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

    # ------------------------------------------------------- maintenance

    _OPTIMIZE = re.compile(
        r"^OPTIMIZE (?P<t>'[^']+'|[\w.]+)"
        r"(?: ZORDER BY \((?P<cols>[^)]+)\))?$",
        re.I,
    )

    def _optimize(self, s: str):
        from .maintenance import compact
        from .maintenance.zorder import zorder_by

        m = self._OPTIMIZE.match(s)
        if not m:
            raise IcehouseSQLError("OPTIMIZE <t> [ZORDER BY (c1, c2[, ...])]")
        table = self._table(m.group("t"))
        if not m.group("cols"):
            return DMLResult("optimize-compact", compact(table))
        cols = [c.strip() for c in m.group("cols").split(",")]
        if len(cols) < 2:
            raise IcehouseSQLError(
                "ZORDER BY needs >= 2 columns (one column: sort on write "
                "or use compact)"
            )
        snap = zorder_by(
            table, url_col=cols[0], ts_col=cols[1], extra_cols=cols[2:] or None
        )
        return DMLResult("optimize-zorder", snap)

    _VACUUM = re.compile(
        r"^VACUUM (?P<t>'[^']+'|[\w.]+)(?: RETAIN (?P<h>\d+) HOURS?)?$", re.I
    )

    def _vacuum(self, s: str):
        import time

        from .maintenance import expire_snapshots

        m = self._VACUUM.match(s)
        if not m:
            raise IcehouseSQLError("VACUUM <t> [RETAIN <n> HOURS]")
        table = self._table(m.group("t"))
        older = (
            int(time.time() * 1000) - int(m.group("h")) * 3_600_000
            if m.group("h") else None
        )
        return DMLResult(
            "vacuum", expire_snapshots(table, older_than_ms=older)
        )

    _DESCRIBE = re.compile(r"^DESCRIBE HISTORY (?P<t>'[^']+'|[\w.]+)$", re.I)

    def _describe(self, s: str):
        m = self._DESCRIBE.match(s)
        if not m:
            raise IcehouseSQLError("DESCRIBE supports: DESCRIBE HISTORY <t>")
        return self._table(m.group("t")).history()
