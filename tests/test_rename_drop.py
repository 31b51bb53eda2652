"""Schema evolution v2: rename/drop columns WITHOUT rewriting data.

Name-mapped reads (format.py rename_column/drop_column): properties record
each current column's older names; one scan resolves every generation via
coalesce (a file holds at most one generation of a name — fresh-name rule);
stats pruning consults alias names; dropped names are retired forever so
re-adding can't resurrect old data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate
from ecommerce_lakehouse_spark.table.deletes import delete_by_key


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 200, seed=71, partitions=2)
    return IcehouseTable.create(spark, str(tmp_path / "t"), df)


def test_rename_is_metadata_only_and_reads_old_files(spark, table):
    files_before = {f.path for f in table.live_files()}
    snap = table.rename_column("url", "page_url")
    assert snap.operation == "set-schema"
    # no data rewritten
    assert {f.path for f in table.live_files()} == files_before
    # the renamed column serves the OLD files' values
    out = table.scan()
    assert "page_url" in out.columns and "url" not in out.columns
    assert out.count() == 200
    assert out.filter(F.col("page_url").isNull()).count() == 0
    assert table.schema_aliases() == {"page_url": ["url"]}


def test_mixed_generation_scan_coalesces_both_names(spark, table):
    table.rename_column("url", "page_url")
    new = generate_pages(spark, 50, seed=72, partitions=1).withColumnRenamed(
        "url", "page_url"
    )
    table.append(new)
    out = table.scan()
    assert out.count() == 250
    assert out.filter(F.col("page_url").isNull()).count() == 0
    # chained rename keeps resolving BOTH older generations
    table.rename_column("page_url", "uri")
    assert table.schema_aliases() == {"uri": ["url", "page_url"]}
    out2 = table.scan()
    assert out2.filter(F.col("uri").isNull()).count() == 0


def test_stats_pruning_consults_alias_names(spark, table):
    """Old files' manifest stats are keyed by the old name; a predicate on
    the new name must still cut files."""
    table.rename_column("warc_ts", "crawl_ts")
    hi = table.scan().agg(F.max("crawl_ts")).first()[0]
    n_all = len(table.planned_files())
    kept = table.planned_files([Predicate("crawl_ts", ">", hi)])
    assert n_all >= 2
    assert len(kept) < n_all  # alias-keyed stats actually pruned
    # and the residual filter returns the right rows
    assert table.scan([Predicate("crawl_ts", ">=", hi)]).count() >= 1


def test_rename_validations(spark, table):
    with pytest.raises(ValueError, match="unknown column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="is or was"):
        table.rename_column("url", "lang")  # collides with current
    table.rename_column("url", "page_url")
    with pytest.raises(ValueError, match="is or was"):
        table.rename_column("lang", "url")  # historical name reuse
    with pytest.raises(ValueError, match="fresh names"):
        table.append(
            generate_pages(spark, 10, seed=73, partitions=1)
            .withColumnRenamed("url", "page_url")
            .withColumn("url", F.lit("x")),
            merge_schema=True,
        )


def test_drop_column_and_retirement(spark, table):
    snap = table.drop_column("html")
    assert snap.operation == "set-schema"
    out = table.scan()
    assert "html" not in out.columns
    assert out.count() == 200
    # appends no longer carry it
    table.append(
        generate_pages(spark, 20, seed=74, partitions=1).drop("html")
    )
    assert table.scan().count() == 220
    # the name is retired forever
    with pytest.raises(ValueError, match="fresh names"):
        table.append(
            generate_pages(spark, 5, seed=75, partitions=1),
            merge_schema=True,
        )
    with pytest.raises(ValueError, match="is or was"):
        table.rename_column("text", "html")


def test_rename_refuses_spec_columns(spark, tmp_path):
    df = generate_pages(spark, 100, seed=76, partitions=2)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "b"), df,
        properties={"bucket.key": "url", "bucket.n": "4"},
    )
    with pytest.raises(ValueError, match="spec"):
        tbl.rename_column("url", "page_url")
    with pytest.raises(ValueError, match="spec"):
        tbl.drop_column("url")


def test_eq_delete_survives_rename(spark, table):
    doomed = [r.url for r in table.scan().select("url").limit(5).collect()]
    delete_by_key(table, "url", doomed)
    table.rename_column("url", "page_url")
    out = table.scan()
    assert out.count() == 195
    assert out.filter(F.col("page_url").isin(doomed)).count() == 0


def test_drop_refuses_live_eq_delete_key(spark, table):
    doomed = [r.url for r in table.scan().select("url").limit(3).collect()]
    delete_by_key(table, "url", doomed)
    with pytest.raises(ValueError, match="equality deletes"):
        table.drop_column("url")


def test_merge_after_rename(spark, table):
    from ecommerce_lakehouse_spark.operators.merge import merge_into

    table.rename_column("url", "page_url")
    delta = (
        table.scan().limit(30).withColumn("lang", F.lit("zz"))
    ).localCheckpoint()
    merge_into(table, delta, ["page_url"])
    out = table.scan()
    assert out.count() == 200
    assert out.filter(F.col("lang") == "zz").count() == 30


def test_dsv2_read_resolves_renamed_columns(spark, table):
    from ecommerce_lakehouse_spark.sources.datasource import register

    register(spark)
    table.rename_column("url", "page_url")
    table.append(
        generate_pages(spark, 30, seed=77, partitions=1)
        .withColumnRenamed("url", "page_url")
    )
    df = spark.read.format("icehouse").load(table.path)
    assert "page_url" in df.columns
    assert df.count() == 230
    assert df.filter(F.col("page_url").isNull()).count() == 0


def test_time_travel_reads_old_schema(spark, table):
    """A scan pinned to a pre-rename snapshot still reads — the CURRENT
    schema applies (single-schema contract, as with widening), with values
    resolved through the name mapping."""
    pre = table.current_snapshot().snapshot_id
    table.rename_column("url", "page_url")
    out = table.scan(snapshot_id=pre)
    assert "page_url" in out.columns
    assert out.filter(F.col("page_url").isNull()).count() == 0
