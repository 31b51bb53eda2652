"""Streaming CDC: spark.readStream.format("icehouse").option("cdc", "true").

Each micro-batch emits the row-level change feed of its snapshot range —
the streaming twin of ``changes(cdc=True)`` — so merge/delete snapshots
flow as update/delete rows instead of failing the stream. Offsets stay
snapshot ids: the checkpoint makes consumption exactly-once, and the
cumulative drained feed must equal the batch feed row-for-row. The diff
runs executor-side in hash-bucketed Arrow tasks (no JVM in the planner,
bounded memory per task).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.sources.datasource import register
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate, delete_where


def _multiset(df):
    # None-safe row sort: nulls first per column (schema evolution ranges
    # legitimately emit None for pre-add rows)
    return sorted(
        (tuple(r) for r in df.select(*sorted(df.columns)).collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def _drain_cdc(spark, table_path, checkpoint, out_dir, **opts):
    reader = (
        spark.readStream.format("icehouse")
        .option("cdc", "true")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(table_path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_stream_cdc_equals_batch_feed_and_is_exactly_once(spark, tmp_path):
    """Drain #1 covers create+merge; drain #2 (same checkpoint) must add
    exactly the delete+append deltas; an idle drain adds nothing. At every
    point the cumulative sink equals changes(0, cdc=True)."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 150, seed=31, partitions=2),
    )
    delta = dedup_latest(
        generate_recrawl_delta(spark, 150, 10, 30, seed=31, partitions=2),
        ["url"], "warc_ts",
    )
    merge_into(tbl, delta, "url")
    register(spark)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    out1 = _drain_cdc(spark, tbl.path, ckpt, sink, key_cols="url")
    assert _multiset(out1) == _multiset(tbl.changes(0, cdc=True, key_cols=["url"]))
    types = {
        r._change_type
        for r in out1.select("_change_type").distinct().collect()
    }
    assert {"insert", "update_before", "update_after"} <= types

    victims = tuple(
        r.url for r in tbl.scan().select("url").orderBy("url").limit(4).collect()
    )
    delete_where(tbl, [Predicate("url", "in", victims)])
    tbl.append(generate_pages(spark, 12, seed=32, partitions=1))
    out2 = _drain_cdc(spark, tbl.path, ckpt, sink, key_cols="url")
    assert _multiset(out2) == _multiset(tbl.changes(0, cdc=True, key_cols=["url"]))
    assert out2.filter(F.col("_change_type") == "delete").count() == len(victims)

    n = out2.count()
    assert _drain_cdc(spark, tbl.path, ckpt, sink, key_cols="url").count() == n


def test_stream_cdc_bucketed_diff_matches_single_bucket(spark, tmp_path):
    """cdc_buckets splits a snapshot's diff into hash-bucketed executor
    tasks (bounded memory at scale); the union over buckets must be the
    exact feed — no lost or duplicated change rows across bucket
    boundaries."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 120, seed=33, partitions=2),
    )
    delta = dedup_latest(
        generate_recrawl_delta(spark, 120, 8, 25, seed=33, partitions=2),
        ["url"], "warc_ts",
    )
    merge_into(tbl, delta, "url")
    register(spark)
    out = _drain_cdc(
        spark, tbl.path, str(tmp_path / "ck"), str(tmp_path / "sink"),
        key_cols="url", cdc_buckets="5",
    )
    assert _multiset(out) == _multiset(tbl.changes(0, cdc=True, key_cols=["url"]))


def test_stream_cdc_without_key_cols_emits_delete_insert(spark, tmp_path):
    """No key_cols: a merge's rewrites stay delete+insert pairs (the batch
    feed's documented degradation) — still replay-identical."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 100, seed=34, partitions=2),
    )
    delta = dedup_latest(
        generate_recrawl_delta(spark, 100, 5, 20, seed=34, partitions=1),
        ["url"], "warc_ts",
    )
    merge_into(tbl, delta, "url")
    register(spark)
    out = _drain_cdc(
        spark, tbl.path, str(tmp_path / "ck"), str(tmp_path / "sink")
    )
    assert _multiset(out) == _multiset(tbl.changes(0, cdc=True))
    types = {
        r._change_type for r in out.select("_change_type").distinct().collect()
    }
    assert "update_before" not in types and "update_after" not in types


def test_stream_cdc_rejects_skip_row_changes(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 30, seed=35, partitions=1),
    )
    register(spark)
    with pytest.raises(Exception, match="mutually exclusive"):
        q = (
            spark.readStream.format("icehouse")
            .option("cdc", "true").option("skip_row_changes", "true")
            .load(tbl.path)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_batch_dsv2_cdc_rejects_file_pruning_predicates(spark, tmp_path):
    """File pruning would drop change rows — the cdc reader refuses the
    predicates option instead of silently under-reporting changes."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 30, seed=36, partitions=1),
    )
    register(spark)
    with pytest.raises(Exception, match="cdc"):
        (
            spark.read.format("icehouse")
            .option("cdc", "true")
            .option("predicates", '[["lang", "=", "en"]]')
            .load(tbl.path)
            .collect()
        )


def test_dsv2_cdc_survives_schema_evolution(spark, tmp_path):
    """The DSv2 cdc read (executor-side Arrow diff) must equal the
    DataFrame feed across a rename + widen + default evolution mid-range:
    the diff kernel resolves old physical names via per-file aliases,
    fills initial defaults, and casts widened columns — same as the batch
    engine."""
    from pyspark.sql.types import LongType

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 120, seed=37, partitions=2),
    )
    tbl.add_column("fetch_status", "int")
    tbl.append(
        generate_pages(spark, 30, seed=38, partitions=1).withColumn(
            "fetch_status", (F.crc32("url") % 500).cast("int")
        )
    )
    tbl.rename_column("url", "page_url")
    tbl.widen_column("fetch_status", "long")
    tbl.add_column("crawl_tier", "string", default="cc-main")
    delta = dedup_latest(
        generate_recrawl_delta(spark, 120, 8, 20, seed=37, partitions=1),
        ["url"], "warc_ts",
    ).withColumnRenamed("url", "page_url").withColumn(
        "fetch_status", (F.crc32("page_url") % 500).cast("int")
    )
    merge_into(tbl, delta, "page_url")
    register(spark)
    got = (
        spark.read.format("icehouse").option("cdc", "true")
        .option("key_cols", "page_url").option("cdc_buckets", "3")
        .load(tbl.path)
    )
    assert isinstance(got.schema["fetch_status"].dataType, LongType)
    want = tbl.changes(0, cdc=True, key_cols=["page_url"])
    assert _multiset(got) == _multiset(want)
