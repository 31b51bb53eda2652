"""Partition transforms beyond bucket: identity / year / month / day /
hour / truncate(w) — the public Iceberg partition-transform family,
re-expressed over Icehouse's manifest-stats layout.

What the reference relies on Delta's ``partitionBy`` for
(``src/utils/02_bronze_ingest.py`` writes date-partitioned bronze), built
from scratch and generalized:

* The spec is a table PROPERTY (``partition.spec``: a JSON list of
  transforms), so evolving it is a metadata-only commit — no data rewrite,
  exactly Iceberg's partition-spec-evolution contract. ``partition.spec.id``
  counts generations.
* The write path computes each transform as a JVM string expression on a
  TRANSIENT column (whole-stage codegen, no Python), splits staged files
  through ``partitionBy`` on those columns, and records each file's
  partition tuple in its manifest stats under synthetic ``__pt:<label>``
  entries — zero manifest-format change, same trick as the bucket tag.
* Pruning needs NO new code path: a transform guarantees every file holds
  a single partition value, so the existing per-file min/max stats on the
  SOURCE column are exact (min == max within a day-partitioned file) and
  ``prune_files`` already cuts on them. The tag's job is layout metadata:
  the ``partitions()`` rollup, compaction bins that never mix partition
  values, and spec-generation bookkeeping.
* Because every transform value is derivable from row content (unlike a
  hash bucket's modulus, which needs the write-time ``n``), ANY rewrite
  re-derives correct tags under the CURRENT spec — compaction and Z-order
  migrate old-spec files to the new spec for free.

Values are stored as strings (the partition-directory form): date
transforms use zero-padded formats, so lexicographic order equals
chronological order and ``repartitionByRange`` on the transform column
clusters correctly.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

PARTITION_SPEC_PROP = "partition.spec"      # json: [{"transform","col","w"?}]
PARTITION_SPEC_ID_PROP = "partition.spec.id"
PT_STAT_PREFIX = "__pt:"                    # manifest-stats key per transform
_PT_COL_PREFIX = "__pt_"                    # transient write-path column

_DATE_FORMATS = {
    "year": "yyyy",
    "month": "yyyy-MM",
    "day": "yyyy-MM-dd",
    "hour": "yyyy-MM-dd-HH",
}
_TEMPORAL_TYPES = {"timestamp", "timestamp_ntz", "date"}
_INTEGRAL_TYPES = {"byte", "short", "integer", "long"}


@dataclass(frozen=True)
class Transform:
    """One partition transform: ``name`` ∈ identity|year|month|day|hour|
    truncate, applied to column ``col`` (``width`` for truncate only)."""

    name: str
    col: str
    width: int | None = None

    def __post_init__(self):
        if self.name not in ("identity", "truncate", *_DATE_FORMATS):
            raise ValueError(f"unknown partition transform: {self.name!r}")
        if self.name == "truncate":
            if not self.width or self.width < 1:
                raise ValueError("truncate requires width >= 1")
        elif self.width is not None:
            raise ValueError(f"{self.name} takes no width")

    @property
    def label(self) -> str:
        """Canonical self-describing name, e.g. ``day(warc_ts)`` or
        ``truncate(url,16)`` — doubles as the manifest-stats key suffix,
        so a tag remains interpretable across spec evolution."""
        if self.name == "truncate":
            return f"truncate({self.col},{self.width})"
        return f"{self.name}({self.col})"

    def validate(self, dtype_name: str) -> None:
        """Refuse transforms that are meaningless for the column's type —
        a wrong spec should fail at ``set_partition_spec``, not at the
        first write."""
        if self.name in _DATE_FORMATS and dtype_name not in _TEMPORAL_TYPES:
            raise ValueError(
                f"{self.label}: {self.name} needs a timestamp/date column, "
                f"{self.col} is {dtype_name}"
            )
        if self.name == "truncate" and dtype_name not in (
            _INTEGRAL_TYPES | {"string"}
        ):
            raise ValueError(
                f"{self.label}: truncate needs string or integral, "
                f"{self.col} is {dtype_name}"
            )

    def expr(self) -> Column:
        """The transform as a string-valued JVM expression — MUST be
        identical everywhere a value is derived (write path, rollups)."""
        c = F.col(self.col)
        if self.name == "identity":
            return c.cast("string")
        if self.name in _DATE_FORMATS:
            return F.date_format(c, _DATE_FORMATS[self.name])
        # truncate: Iceberg semantics — strings take the first w chars,
        # integrals round toward -inf to a multiple of w
        return (
            F.substring(c, 1, self.width)
            if self.name == "truncate" and not self._numeric_hint
            else (c - F.pmod(c, F.lit(self.width))).cast("string")
        )

    # set by bind_numeric_hints for truncate on integral columns: the same
    # JSON spec entry means substring for strings and floor-to-multiple
    # for ints, resolved against the table schema once at expr-build time
    _numeric_hint: bool = field(default=False, compare=False, repr=False)

    def to_json(self) -> dict:
        d = {"transform": self.name, "col": self.col}
        if self.width is not None:
            d["w"] = self.width
        return d

    @staticmethod
    def from_json(d: dict) -> "Transform":
        return Transform(d["transform"], d["col"], d.get("w"))


def parse_spec(props: dict | None) -> list[Transform]:
    """The table's current partition transforms (empty when unset)."""
    raw = (props or {}).get(PARTITION_SPEC_PROP)
    if not raw:
        return []
    return [Transform.from_json(d) for d in json.loads(raw)]


def spec_id(props: dict | None) -> int:
    return int((props or {}).get(PARTITION_SPEC_ID_PROP, 0))


def bind_numeric_hints(spec: list[Transform], schema) -> list[Transform]:
    """Resolve truncate's string-vs-integral duality against the schema."""
    types = {f.name: f.dataType.typeName() for f in schema.fields}
    out = []
    for t in spec:
        if t.name == "truncate" and types.get(t.col) in _INTEGRAL_TYPES:
            object.__setattr__(t, "_numeric_hint", True)
        out.append(t)
    return out


def partition_tuple_of_file(f) -> tuple | None:
    """((label, value), ...) recorded at write time, sorted by label;
    None for files written before partitioning (or under no spec).
    Value None means the source column was NULL for the file's rows."""
    items = tuple(
        sorted(
            (k[len(PT_STAT_PREFIX):], (v or {}).get("min"))
            for k, v in (f.stats or {}).items()
            if k.startswith(PT_STAT_PREFIX)
        )
    )
    return items or None


_TEXT = re.compile(
    r"^\s*(?P<name>identity|year|month|day|days|hour|hours|truncate)\s*"
    r"\(\s*(?P<col>\w+)\s*(?:,\s*(?P<w>\d+)\s*)?\)\s*$",
    re.IGNORECASE,
)
_ALIASES = {"days": "day", "hours": "hour"}


def parse_transform_text(s: str) -> Transform:
    """``"day(warc_ts)"`` / ``"truncate(url, 16)"`` / bare ``"lang"``
    (identity shorthand) → Transform. Accepts Iceberg's plural spellings
    (days/hours)."""
    m = _TEXT.match(s)
    if not m:
        if re.match(r"^\s*\w+\s*$", s):
            return Transform("identity", s.strip())
        raise ValueError(f"cannot parse partition transform: {s!r}")
    name = _ALIASES.get(m.group("name").lower(), m.group("name").lower())
    w = m.group("w")
    return Transform(name, m.group("col"), int(w) if w else None)


# ---------------------------------------------------------- hive path codec
# partitionBy writes dir names through Hive's escapePathName (special
# chars percent-encoded); the staging walk must invert it exactly or a
# truncate(url,…) tag would diverge from the data. '%' itself is always
# escaped as %25 on write, so decoding every %XX is lossless.

_HEX = re.compile(r"%([0-9A-Fa-f]{2})")


def hive_unescape(s: str) -> str:
    return _HEX.sub(lambda m: chr(int(m.group(1), 16)), s)
