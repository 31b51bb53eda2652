"""`spark.read.format("icehouse")` — the DataSourceV2-style read path.

SURVEY §7.2 stretch goal: without this, every consumer must import
IcehouseTable; with it, plain `spark.read` / SQL users (BI tools, notebooks)
can read a table like any other source (reference shape: `spark.table(...)`
everywhere, e.g. ingest_silver_tables.py:43).

Built on PySpark 4's Python Data Source API:

- schema() comes from the table's committed metadata;
- pushFilters() maps Spark's filter pushdown onto manifest-stats FILE
  pruning (the same prune_files the native scan uses). File pruning is
  conservative, not exact, so ALL filters are returned as "unsupported" —
  Spark re-applies them after the scan; we only use them to skip files.
- partitions() emits one InputPartition per surviving data file → Spark
  schedules file reads across executors exactly like the native scan;
- read() yields Arrow RecordBatches via pyarrow.parquet (Arrow-batched,
  zero per-row Python), reconciling pre-schema-evolution files by
  null-filling missing columns.

Options: path (required), snapshot_id (optional time travel).

Trade-off vs `IcehouseTable.scan()`: scan() hands Spark a native parquet
relation (JVM vectorized reader, whole-stage codegen into the scan), while
this path decodes parquet in Python workers through Arrow. Correctness and
pruning are identical; scan() remains the hot path for the engine's own
operators, format("icehouse") is the compatibility surface.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from ..table.predicates import Predicate


def _filter_to_predicate(f: Filter) -> Predicate | None:
    """Map a Spark pushdown filter to a stats-prunable Predicate (top-level
    columns only; anything unmapped simply doesn't prune)."""
    col = ".".join(f.attribute) if hasattr(f, "attribute") else None
    if col is None or (hasattr(f, "attribute") and len(f.attribute) != 1):
        return None
    if isinstance(f, (EqualTo, EqualNullSafe)):
        return Predicate(col, "=", f.value)
    if isinstance(f, GreaterThan):
        return Predicate(col, ">", f.value)
    if isinstance(f, GreaterThanOrEqual):
        return Predicate(col, ">=", f.value)
    if isinstance(f, LessThan):
        return Predicate(col, "<", f.value)
    if isinstance(f, LessThanOrEqual):
        return Predicate(col, "<=", f.value)
    if isinstance(f, In):
        return Predicate(col, "in", tuple(f.values))
    if isinstance(f, IsNull):
        return Predicate(col, "is_null", None)
    if isinstance(f, IsNotNull):
        return Predicate(col, "not_null", None)
    return None


class IcehouseFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IcehouseReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("icehouse: .load(path) is required")
        self._snapshot_id = (
            int(options["snapshot_id"]) if options.get("snapshot_id") else None
        )
        self._schema = schema
        self._predicates: list[Predicate] = []

    # -- planning (driver side) --------------------------------------------

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            p = _filter_to_predicate(f)
            if p is not None:
                self._predicates.append(p)
        # file pruning is conservative: report EVERY filter unsupported so
        # Spark re-applies them row-level after the scan
        return filters

    def partitions(self):
        # local import: this class ships to executors, but planning runs on
        # the driver where a SparkSession exists
        from pyspark.sql import SparkSession

        from ..table.format import IcehouseTable

        spark = SparkSession.getActiveSession()
        table = IcehouseTable(spark, self._path)
        files = table.planned_files(
            self._predicates or None, snapshot_id=self._snapshot_id
        )
        import os

        return [
            IcehouseFilePartition(os.path.join(table.path, f.path))
            for f in files
        ]

    # -- execution (executor side, Arrow-batched) ---------------------------

    def read(self, partition: IcehouseFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(self._schema)
        tbl = pq.read_table(
            partition.path,
            columns=[n for n in want.names if n in set(
                pq.read_schema(partition.path).names
            )],
        )
        n = tbl.num_rows
        cols = []
        for field in want:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                # schema evolution: files older than a widening null-fill
                cols.append(pa.nulls(n, type=field.type))
        out = pa.table(cols, schema=want)
        yield from out.to_batches(max_chunksize=65536)


class IcehouseDataSource(DataSource):
    """Usage::

        from ecommerce_lakehouse_spark.sources.datasource import register
        register(spark)
        df = spark.read.format("icehouse").load("/path/to/table")
        old = (spark.read.format("icehouse")
               .option("snapshot_id", 3).load("/path/to/table"))
    """

    @classmethod
    def name(cls) -> str:
        return "icehouse"

    def schema(self) -> StructType:
        from pyspark.sql import SparkSession

        from ..table.format import IcehouseTable

        spark = SparkSession.getActiveSession()
        return IcehouseTable(spark, self.options["path"]).schema()

    def reader(self, schema: StructType) -> IcehouseReader:
        return IcehouseReader(dict(self.options), schema)


def register(spark) -> None:
    # pushFilters requires this runtime conf (off by default in Spark 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IcehouseDataSource)
