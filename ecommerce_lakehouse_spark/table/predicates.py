"""File-pruning predicates evaluated against per-file min/max statistics.

This is the engine's answer to the reference's watermark predicate scan
(``src/silver/ingest_silver_tables.py:40-44``): on Delta/Databricks the
incremental filter prunes files via Delta's stats; here we keep our own
per-file bounds in manifests and prune before ``spark.read`` ever sees a
path. Catalyst then gets the same predicate again for row-group pushdown
inside the surviving files.

Semantics are conservative: a file is kept unless its stats PROVE no row can
match. Missing stats ⇒ keep. Bounds for strings are prefix-truncated with a
round-up on the upper bound, so truncation never causes false pruning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

OPS = {">", ">=", "<", "<=", "=", "!=", "in", "is_null", "not_null"}


@dataclass(frozen=True)
class Predicate:
    column: str
    op: str
    value: Any = None

    def __post_init__(self):
        if self.op not in OPS:
            raise ValueError(f"unsupported predicate op: {self.op}")

    # -- file-level evaluation -------------------------------------------------

    def might_match(self, stats: dict | None, row_count: int) -> bool:
        """True unless the file's stats prove no row matches."""
        if not stats or self.column not in stats:
            return True
        cs = stats[self.column]
        lo, hi = cs.get("min"), cs.get("max")
        nulls = cs.get("null_count")
        all_null = nulls is not None and row_count > 0 and nulls >= row_count

        if self.op == "is_null":
            return nulls is None or nulls > 0
        if self.op == "not_null":
            return not all_null
        # comparisons never match NULLs
        if all_null:
            return False
        if lo is None or hi is None:
            return True
        v = self.value
        try:
            if self.op == ">":
                return hi > v
            if self.op == ">=":
                return hi >= v
            if self.op == "<":
                return lo < v
            if self.op == "<=":
                return lo <= v
            if self.op == "=":
                return lo <= v <= hi
            if self.op == "!=":
                return not (lo == hi == v)
            if self.op == "in":
                return any(lo <= x <= hi for x in v)
        except TypeError:
            return True  # incomparable types: stay conservative
        return True

    def all_match(self, stats: dict | None, row_count: int) -> bool:
        """True only when the file's stats PROVE every row matches — the
        metadata-only DELETE fast path (Iceberg's partition-drop case).
        Conservative in the OPPOSITE direction of :meth:`might_match`:
        missing/unknown stats ⇒ False (fall back to row-level deletes).

        Sound under string-bound truncation: the stored min is a prefix
        (≤ true min) and the stored max is rounded UP (≥ true max), so
        ``hi < v`` proves ``true_max < v`` and ``lo > v`` proves
        ``true_min > v``; ``lo == hi == v`` pins every value to v exactly.
        """
        if not stats or self.column not in stats:
            return False
        cs = stats[self.column]
        lo, hi = cs.get("min"), cs.get("max")
        nulls = cs.get("null_count")
        if row_count == 0:
            return True  # vacuous: dropping an empty file loses nothing
        if self.op == "is_null":
            return nulls is not None and nulls >= row_count
        if self.op == "not_null":
            return nulls == 0
        # comparisons never match NULLs: need a proven-null-free file
        if nulls != 0 or lo is None or hi is None:
            return False
        v = self.value
        try:
            if self.op == ">":
                return lo > v
            if self.op == ">=":
                return lo >= v
            if self.op == "<":
                return hi < v
            if self.op == "<=":
                return hi <= v
            if self.op == "=":
                return lo == hi == v
            if self.op == "!=":
                return hi < v or lo > v
            if self.op == "in":
                return lo == hi and lo in v
        except TypeError:
            return False  # incomparable types: no proof
        return False

    # -- Spark residual --------------------------------------------------------

    def to_column(self) -> Column:
        c = F.col(self.column)
        if self.op == ">":
            return c > F.lit(self.value)
        if self.op == ">=":
            return c >= F.lit(self.value)
        if self.op == "<":
            return c < F.lit(self.value)
        if self.op == "<=":
            return c <= F.lit(self.value)
        if self.op == "=":
            return c == F.lit(self.value)
        if self.op == "!=":
            return c != F.lit(self.value)
        if self.op == "in":
            return c.isin(list(self.value))
        if self.op == "is_null":
            return c.isNull()
        return c.isNotNull()


def prune_files(
    files: list,
    predicates: list[Predicate] | None,
    aliases: dict | None = None,
) -> list:
    """AND-combine predicates; keep files any of whose rows might match all.

    ``aliases`` ({current_name: [older names]}, from rename_column) lets a
    predicate on a renamed column prune files whose manifest stats are
    keyed by an older generation of the name. Omitting it is always safe —
    stats missing under the current name keep the file (conservative)."""
    if not predicates:
        return list(files)

    def _match(f, p: Predicate) -> bool:
        names = [p.column, *(aliases or {}).get(p.column, [])]
        for n in names:
            if f.stats and n in f.stats:
                return p.might_match({p.column: f.stats[n]}, f.row_count)
        return True

    return [f for f in files if all(_match(f, p) for p in predicates)]
