"""Type promotion (Iceberg spec schema-evolution rules): widen_column is a
METADATA-ONLY commit — int→long, float→double, decimal precision increase at
fixed scale. Old files keep their narrow physical type; the widened read
schema up-casts per file natively (Spark 4 parquet reader). Writers built
before the widen still work: align_write_types up-casts their columns at
append/merge so staged files store the wide type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, DoubleType, LongType

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable


def typed_pages(spark, n, seed, partitions=2):
    """Pages plus one column of each promotable family, deterministic."""
    return (
        generate_pages(spark, n, seed=seed, partitions=partitions)
        .withColumn("fetch_status", (F.crc32("url") % 500).cast("int"))
        .withColumn("score", (F.crc32("url") % 100 / 100.0).cast("float"))
        .withColumn(
            "price", (F.crc32("url") % 1000 / 100.0).cast("decimal(5,2)")
        )
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    return IcehouseTable.create(
        spark, str(tmp_path / "pages"), typed_pages(spark, 200, seed=71)
    )


def test_widen_is_metadata_only_and_old_files_upcast(spark, tbl):
    before = {f.path for f in tbl.live_files()}
    expected = {
        (r.url, r.fetch_status)
        for r in tbl.scan().select("url", "fetch_status").collect()
    }
    snap = tbl.widen_column("fetch_status", "long")
    assert snap.operation == "set-schema"
    assert {f.path for f in tbl.live_files()} == before, "data was rewritten"
    out = tbl.scan()
    assert isinstance(out.schema["fetch_status"].dataType, LongType)
    got = {(r.url, r.fetch_status) for r in out.select("url", "fetch_status").collect()}
    assert got == expected, "values changed across the widen"


def test_widen_float_and_decimal(spark, tbl):
    tbl.widen_column("score", "double")
    tbl.widen_column("price", "decimal(12,2)")
    out = tbl.scan()
    assert isinstance(out.schema["score"].dataType, DoubleType)
    assert out.schema["price"].dataType == DecimalType(12, 2)
    # exact decimal values survive (precision increase never rounds)
    assert out.filter(F.col("price") != F.col("price").cast("decimal(5,2)")).count() == 0
    assert out.count() == 200


def test_unsafe_promotions_raise(spark, tbl):
    tbl.widen_column("fetch_status", "long")
    for col, bad in [
        ("fetch_status", "int"),        # narrowing back
        ("score", "decimal(10,2)"),     # cross-family
        ("price", "decimal(12,4)"),     # scale change
        ("price", "decimal(4,2)"),      # precision decrease
        ("url", "binary"),              # non-numeric
    ]:
        with pytest.raises(ValueError, match="unsafe type change"):
            tbl.widen_column(col, bad)
    with pytest.raises(ValueError, match="already"):
        tbl.widen_column("fetch_status", "long")
    with pytest.raises(ValueError, match="no such column"):
        tbl.widen_column("nope", "long")


def test_legacy_narrow_writer_appends_after_widen(spark, tbl):
    """A writer still producing int appends cleanly post-widen: the column
    is up-cast at write, so the NEW file stores int64 while OLD files stay
    int32 — and one widened read schema covers both eras."""
    tbl.widen_column("fetch_status", "long")
    tbl.append(typed_pages(spark, 40, seed=72, partitions=1))
    out = tbl.scan()
    assert out.count() == 240
    assert isinstance(out.schema["fetch_status"].dataType, LongType)
    assert out.filter(F.col("fetch_status").isNull()).count() == 0


def test_wider_writer_than_table_still_raises(spark, tbl):
    """Promotion is deliberate: a writer that ALREADY produces long cannot
    silently narrow into an int table — widen_column first."""
    wide = typed_pages(spark, 10, seed=73, partitions=1).withColumn(
        "fetch_status", F.col("fetch_status").cast("long")
    )
    with pytest.raises(ValueError, match="type mismatch"):
        tbl.append(wide)


def test_merge_with_narrow_delta_after_widen(spark, tbl):
    tbl.widen_column("fetch_status", "long")
    delta = dedup_latest(
        typed_pages(spark, 30, seed=71, partitions=1), ["url"], "warc_ts"
    )  # same seed → same urls: pure update set, still int-typed
    res = merge_into(tbl, delta, "url")
    assert res.rows_updated == 30 and res.rows_inserted == 0
    out = tbl.scan()
    assert out.count() == 200
    assert isinstance(out.schema["fetch_status"].dataType, LongType)


def test_widen_then_rename_then_scan(spark, tbl):
    """Widen + rename compose: old files store the OLD name at the NARROW
    type; the alias read path types alias columns like the current field,
    so one scan resolves both mappings."""
    tbl.widen_column("fetch_status", "long")
    tbl.rename_column("fetch_status", "http_status")
    out = tbl.scan()
    assert isinstance(out.schema["http_status"].dataType, LongType)
    assert out.filter(F.col("http_status").isNull()).count() == 0
    assert out.count() == 200


def test_compaction_materializes_wide_type(spark, tbl):
    from ecommerce_lakehouse_spark.maintenance.compact import compact

    expected = {
        (r.url, r.fetch_status)
        for r in tbl.scan().select("url", "fetch_status").collect()
    }
    tbl.widen_column("fetch_status", "long")
    compact(tbl, target_file_bytes=512 * 1024 * 1024, min_bin_files=2)
    files = tbl.live_files()
    assert len(files) == 1
    # the rewritten file physically stores int64 now: read it raw
    import os

    raw = spark.read.parquet(os.path.join(tbl.path, files[0].path))
    assert isinstance(raw.schema["fetch_status"].dataType, LongType)
    got = {
        (r.url, r.fetch_status)
        for r in tbl.scan().select("url", "fetch_status").collect()
    }
    assert got == expected
