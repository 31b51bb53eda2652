"""SCD Type-2 history maintenance over Icehouse tables.

Re-expresses the reference's two-step SCD2 MERGE
(``src/silver/ingest_silver_tables.py:124-294``):

1. change capture: source ⋈ current-dim on business key, keep rows where any
   compare-column differs null-safely (J1, ``:186-195``), ∪ brand-new keys
   via left-anti (J2, ``:198-200``) — assembled with unionByName (O4, ``:203``)
2. version chaining: row_number + lead over (business key, change-ts):
   ``effective_to = lead(effective_from)``, open row → is_current=true,
   coalesced to 9999-12-31 (W2/W3, ``:211-229``)
3. close step: partial-update MERGE on (business key, is_current=true) sets
   ``is_current=false, effective_to=earliest change ts`` (``:244-269``)
4. insert step: append all new version rows; surrogate key
   ``md5(concat_ws('||', change_ts, business_key))`` makes re-runs idempotent
   (``:226-229, 272-281``)

Divergence (improvement) from the reference: source rows whose change-ts is
not strictly newer than the current version's effective_from are ignored, so
a re-run of an already-applied multi-version batch is a true no-op — the
reference's close-merge could re-close a fresh version with a stale
effective_to. The crash-recovery story also improves: close and insert are
two snapshots, and a crash between them leaves keys with no current row,
which the next run repairs by re-inserting the full chain (change capture
treats them as new keys).

Determinism: ``now`` is injectable (SURVEY §7.3: the reference stamps
current_timestamp() everywhere; tests need a fixed clock).
"""

from __future__ import annotations

import datetime
import functools
import operator as _op

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..table.format import IcehouseTable
from ..table.predicates import Predicate
from .merge import merge_into

TS_MAX = datetime.datetime(9999, 12, 31, 23, 59, 59)

META_COLS = ("effective_from", "effective_to", "is_current", "version_sk",
             "loaded_at", "updated_at")


def _epoch_us(col):
    return F.unix_micros(col.cast("timestamp"))


def _chain_versions(
    changes: DataFrame, business_keys: list[str], compare_cols: list[str],
    ts_col: str, now,
) -> DataFrame:
    """W2/W3: order versions per key, link effective ranges, stamp sks."""
    w = Window.partitionBy(*business_keys).orderBy(F.col(ts_col))
    sk = F.md5(
        F.concat_ws(
            "||",
            _epoch_us(F.col(ts_col)),
            *[F.col(k).cast("string") for k in business_keys],
        )
    )
    return changes.select(
        *business_keys,
        *compare_cols,
        F.col(ts_col).cast("timestamp_ntz").alias("effective_from"),
        F.coalesce(
            F.lead(ts_col).over(w).cast("timestamp_ntz"),
            F.lit(TS_MAX).cast("timestamp_ntz"),
        ).alias("effective_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        sk.alias("version_sk"),
        F.lit(now).cast("timestamp_ntz").alias("loaded_at"),
        F.lit(now).cast("timestamp_ntz").alias("updated_at"),
    )


def _dedup_batch(source: DataFrame, business_keys: list[str], compare_cols: list[str],
                 ts_col: str) -> DataFrame:
    """One row per (key, change-ts), deterministic survivor."""
    w = Window.partitionBy(*business_keys, ts_col).orderBy(
        F.md5(F.concat_ws("||", *[F.col(c).cast("string") for c in compare_cols]))
    )
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_merge(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    business_keys: list[str],
    compare_cols: list[str],
    ts_col: str,
    now: datetime.datetime | None = None,
) -> IcehouseTable:
    """Apply one incremental batch of changes to the SCD2 dimension at
    ``path`` (created on first run)."""
    now = now or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    src = _dedup_batch(
        source.select(*business_keys, *compare_cols, ts_col),
        business_keys, compare_cols, ts_col,
    )

    table = IcehouseTable(spark, path)
    if not table.exists():
        versions = _chain_versions(src, business_keys, compare_cols, ts_col, now)
        return IcehouseTable.create(spark, path, versions)

    current = table.scan([Predicate("is_current", "=", True)]).select(
        *business_keys,
        *[F.col(c).alias(f"__cur_{c}") for c in compare_cols],
        F.col("effective_from").alias("__cur_from"),
        F.col("version_sk").alias("__cur_sk"),
    )

    joined = src.join(current, business_keys, "left")
    any_diff = functools.reduce(
        _op.or_,
        [~F.col(c).eqNullSafe(F.col(f"__cur_{c}")) for c in compare_cols],
    )
    is_new_key = F.col("__cur_from").isNull()
    fresh = F.col(ts_col).cast("timestamp_ntz") > F.col("__cur_from")
    changes = joined.filter(is_new_key | (fresh & any_diff)).select(
        *business_keys, *compare_cols, ts_col
    )

    versions = _chain_versions(changes, business_keys, compare_cols, ts_col, now)
    versions = versions.persist()
    if versions.limit(1).count() == 0:
        versions.unpersist()
        return table  # empty-batch short-circuit (P7)

    # --- close step: partial-update merge keyed on the current row's sk -----
    # (reference closes by business key + is_current=true residual
    # [ingest_silver_tables.py:254-261]; keying on version_sk hits exactly the
    # same row and lets the merge update is_current itself)
    closers = (
        versions.groupBy(*business_keys)
        .agg(F.min("effective_from").alias("__close_ts"))
        .join(current.select(*business_keys, "__cur_sk"), business_keys, "inner")
    )
    close_src_cols = {}
    for f in table.schema().fields:
        name = f.name
        if name == "version_sk":
            close_src_cols[name] = F.col("__cur_sk")
        elif name == "is_current":
            close_src_cols[name] = F.lit(False)
        elif name == "effective_to":
            close_src_cols[name] = F.col("__close_ts").cast("timestamp_ntz")
        elif name == "updated_at":
            close_src_cols[name] = F.lit(now).cast("timestamp_ntz")
        elif name in business_keys:
            close_src_cols[name] = F.col(name)
        else:
            close_src_cols[name] = F.lit(None).cast(f.dataType)
    close_source = closers.select(
        *[expr.alias(n) for n, expr in close_src_cols.items()]
    )
    merge_into(
        table,
        close_source,
        key_cols=["version_sk"],
        update_cols=["is_current", "effective_to", "updated_at"],
        insert_new=False,
    )

    # --- insert step: append the new version chain ---------------------------
    table.append(versions.select(*[f.name for f in table.schema().fields]))
    versions.unpersist()
    return table
