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


# ---------------------------------------------------------------- defaults
# add_column(default=…): Iceberg-v3 initial-default semantics — rows from
# files that PREDATE the add read the default; rows written after read
# their stored value (including explicit NULLs). Writers that omit the
# column get the write-default materialized at append.


def test_add_column_initial_default_two_eras(spark, tbl):
    snap = tbl.add_column("crawl_tier", "string", default="cc-main")
    assert snap.operation == "set-schema"
    # metadata-only: no data rewritten
    assert all(f.added_by < snap.snapshot_id for f in tbl.live_files())

    new = generate_pages(spark, 40, seed=91, partitions=1).withColumn(
        "crawl_tier", F.when(F.crc32(F.col("url")) % 2 == 0, F.lit("news"))
    )
    tbl.append(new)
    out = tbl.scan()
    assert out.count() == 240
    # old era: every row reads the default, not NULL
    assert out.filter(F.col("crawl_tier") == "cc-main").count() == 200
    # new era: stored values survive — including explicit NULLs
    stored = out.filter(F.col("crawl_tier").isNull()).count()
    assert stored == new.filter(F.col("crawl_tier").isNull()).count()
    assert stored > 0


def test_add_column_without_default_reads_null(spark, tbl):
    tbl.add_column("fetch_status", "int")
    out = tbl.scan()
    assert out.filter(F.col("fetch_status").isNull()).count() == 200


def test_write_default_fills_omitted_column(spark, tbl):
    """A writer that predates the add keeps working: append fills the
    default into the new file (write-default half)."""
    tbl.add_column("crawl_tier", "string", default="cc-main")
    tbl.append(generate_pages(spark, 25, seed=92, partitions=1))
    out = tbl.scan()
    assert out.count() == 225
    assert out.filter(F.col("crawl_tier") == "cc-main").count() == 225


def test_default_typed_cast_and_validation(spark, tbl):
    from pyspark.sql.types import TimestampType

    tbl.add_column("ingested_at", "timestamp", default="2026-01-01 00:00:00")
    row = tbl.scan().select("ingested_at").first()
    assert row[0] is not None and row[0].year == 2026
    assert isinstance(tbl.schema()["ingested_at"].dataType, TimestampType)

    with pytest.raises(ValueError, match="already exists"):
        tbl.add_column("url", "string")
    tbl.rename_column("ingested_at", "fetched_at")
    with pytest.raises(ValueError, match="previously renamed"):
        tbl.add_column("ingested_at", "string")
    with pytest.raises(ValueError, match="JSON-able scalar"):
        tbl.add_column("meta", "string", default=object())


def test_default_survives_rename_and_dies_with_drop(spark, tbl):
    tbl.add_column("crawl_tier", "string", default="cc-main")
    tbl.rename_column("crawl_tier", "tier")
    assert tbl.schema_defaults() == {
        "tier": tbl.schema_defaults()["tier"]
    }
    assert (
        tbl.scan().filter(F.col("tier") == "cc-main").count() == 200
    )
    tbl.drop_column("tier")
    assert tbl.schema_defaults() == {}
    assert "tier" not in tbl.scan().columns


def test_rewrite_materializes_default(spark, tbl):
    """Compaction goes through read_files, so rewritten files store the
    resolved default; the boundary rule then reads the STORED value —
    defaults survive any rewrite."""
    from ecommerce_lakehouse_spark.maintenance.compact import compact

    tbl.add_column("crawl_tier", "string", default="cc-main")
    compact(tbl, target_file_bytes=512 * 1024 * 1024, min_bin_files=2)
    assert all(
        f.added_by > 1 for f in tbl.live_files()
    ), "compaction should have rewritten the pre-add files"
    out = tbl.scan()
    assert out.filter(F.col("crawl_tier") == "cc-main").count() == 200


def test_default_boundary_uses_added_by_not_schema(spark, tbl):
    """Time travel to the pre-add snapshot never shows the column; the
    post-add snapshot applies the default to the old era only."""
    v1 = tbl.current_snapshot().snapshot_id
    tbl.add_column("crawl_tier", "string", default="cc-main")
    assert "crawl_tier" not in [
        f.name for f in tbl.schema_of(v1).fields
    ] if hasattr(tbl, "schema_of") else True
    out = tbl.scan()
    assert out.filter(F.col("crawl_tier") == "cc-main").count() == 200


def test_merge_fills_write_default_for_legacy_writer(spark, tbl):
    """merge_into with a delta that OMITS a defaulted column (a writer
    that predates the add) must not raise in reconcile_schema — the
    write-default is materialized into the merged files, same as append.
    (Found by the spark-submit verify drive, round 5.)"""
    from ecommerce_lakehouse_spark.datagen import generate_recrawl_delta
    from ecommerce_lakehouse_spark.operators.merge import (
        dedup_latest, merge_into,
    )

    tbl.add_column("crawl_tier", "string", default="cc-main")
    delta = dedup_latest(
        generate_recrawl_delta(spark, 200, n_new=30, n_recrawl=40, seed=81),
        ["url"], "warc_ts",
    )
    assert "crawl_tier" not in delta.columns
    res = merge_into(tbl, delta, "url")
    assert res.rows_updated == 40 and res.rows_inserted == 30
    out = tbl.scan()
    assert out.count() == 230
    assert out.filter(F.col("crawl_tier") == "cc-main").count() == 230
