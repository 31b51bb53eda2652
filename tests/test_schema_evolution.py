"""Schema evolution v1: appends/merges may ADD nullable columns; the table
schema widens in the same atomic commit; files from before the widening read
back with NULLs (no rewrite of untouched data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable


@pytest.fixture()
def tbl(spark, tmp_path):
    return IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 200, seed=81, partitions=2),
    )


def widened_batch(spark, n, seed):
    return generate_pages(spark, n, seed=seed, partitions=1).withColumn(
        "fetch_status", F.lit(200).cast("int")
    )


def test_append_widened_batch_and_scan_both_eras(spark, tbl):
    snap = tbl.append(widened_batch(spark, 50, 82), merge_schema=True)
    assert snap is not None
    assert "fetch_status" in [f.name for f in tbl.schema().fields]

    df = tbl.scan()
    assert df.count() == 250
    # old era: NULL for the new column; new era: the written value
    assert df.filter(F.col("fetch_status").isNull()).count() == 200
    assert df.filter(F.col("fetch_status") == 200).count() == 50

    # a second widened append no longer needs the flag (schema now matches)
    tbl.append(widened_batch(spark, 10, 83))
    assert tbl.scan().count() == 260


def test_append_new_column_requires_flag(spark, tbl):
    with pytest.raises(ValueError, match="merge_schema=True"):
        tbl.append(widened_batch(spark, 10, 84))
    # dropping a column is never allowed
    with pytest.raises(ValueError, match="missing table column"):
        tbl.append(
            generate_pages(spark, 10, seed=85, partitions=1).drop("lang"),
            merge_schema=True,
        )
    # changing a column's type is never allowed
    with pytest.raises(ValueError, match="type mismatch"):
        tbl.append(
            generate_pages(spark, 10, seed=86, partitions=1).withColumn(
                "lang", F.lit(1)
            ),
            merge_schema=True,
        )


def test_merge_with_schema_evolution(spark, tbl):
    """A widened MERGE source evolves the schema in the rewrite commit:
    matched rows carry the new value, rows in untouched files read NULL."""
    delta = dedup_latest(
        generate_pages(spark, 40, seed=81, partitions=1, revision=1),
        ["url"], "warc_ts",
    ).withColumn("fetch_status", F.lit(304).cast("int"))

    res = merge_into(tbl, delta, "url", merge_schema=True)
    assert res.rows_updated == 40
    assert "fetch_status" in [f.name for f in tbl.schema().fields]

    df = tbl.scan()
    assert df.count() == 200
    assert df.filter(F.col("fetch_status") == 304).count() == 40
    # passthrough rows in REWRITTEN files got NULL; untouched files read NULL
    assert df.filter(F.col("fetch_status").isNull()).count() == 160

    # merge on the already-widened table stays green without the flag
    delta2 = dedup_latest(
        generate_pages(spark, 10, seed=81, partitions=1, revision=2),
        ["url"], "warc_ts",
    ).withColumn("fetch_status", F.lit(500).cast("int"))
    res2 = merge_into(tbl, delta2, "url")
    assert res2.rows_updated == 10
    assert tbl.scan().filter(F.col("fetch_status") == 500).count() == 10


def test_merge_without_flag_rejects_new_columns(spark, tbl):
    delta = dedup_latest(
        generate_pages(spark, 5, seed=81, partitions=1, revision=1),
        ["url"], "warc_ts",
    ).withColumn("extra", F.lit("x"))
    with pytest.raises(ValueError, match="merge_schema=True"):
        merge_into(tbl, delta, "url")


def test_evolution_preserves_time_travel(spark, tbl):
    """Old snapshots replay with the CURRENT schema contract (widened reads
    fill NULL) while row counts and pre-existing values are unchanged."""
    v1 = tbl.current_snapshot().snapshot_id
    tbl.append(widened_batch(spark, 30, 87), merge_schema=True)
    old = tbl.scan(snapshot_id=v1)
    assert old.count() == 200
    assert old.filter(F.col("fetch_status").isNull()).count() == 200


def test_evolution_preserves_existing_nullability(spark, tmp_path):
    """Widening must not loosen non-null columns to nullable (ADVICE r02):
    only the NEW columns are forced nullable."""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("n", IntegerType(), True),
    ])
    df = spark.createDataFrame([("a", 1), ("b", 2)], schema)
    tbl = IcehouseTable.create(spark, str(tmp_path / "nn"), df)
    assert not tbl.schema()["url"].nullable

    wide = spark.createDataFrame(
        [("c", 3, "x")],
        StructType(schema.fields + [StructField("extra", StringType(), True)]),
    )
    widened = tbl.reconcile_schema(wide.schema, merge_schema=True)
    assert not widened["url"].nullable, "existing non-null column loosened"
    assert widened["n"].nullable
    assert widened["extra"].nullable
