"""Streaming SOURCE: spark.readStream.format("icehouse").

Snapshot-id offsets + the stream checkpoint give exactly-once incremental
consumption of appends — the streaming twin of changes() — with
row-set-changing snapshots failing the stream unless skip_row_changes is
set (appends-only consumers must not silently miss deletes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.sources.datasource import register
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate, delete_where


def _drain(spark, table_path: str, checkpoint: str, out_dir: str, **opts):
    """availableNow drain into a parquet sink (checkpoint-recoverable,
    unlike the memory sink); returns the sink contents."""
    reader = spark.readStream.format("icehouse")
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
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_stream_source_consumes_appends_exactly_once(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 120, seed=81, partitions=2),
    )
    register(spark)
    ckpt = str(tmp_path / "ckpt")

    sink = str(tmp_path / "sink")
    out1 = _drain(spark, tbl.path, ckpt, sink)
    assert out1.count() == 120

    tbl.append(generate_pages(spark, 40, seed=82, partitions=1))
    tbl.append(generate_pages(spark, 15, seed=83, partitions=1))
    out2 = _drain(spark, tbl.path, ckpt, sink)
    # same checkpoint: exactly the two new appends were added, no dupes
    assert out2.count() == 175
    want = sorted(
        (r.url, r.text) for r in tbl.scan().select("url", "text").collect()
    )
    got = sorted((r.url, r.text) for r in out2.select("url", "text").collect())
    assert got == want


def test_stream_source_starting_snapshot_and_restart(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 100, seed=84, partitions=2),
    )
    base = tbl.current_snapshot().snapshot_id
    tbl.append(generate_pages(spark, 30, seed=85, partitions=1))
    register(spark)
    out = _drain(
        spark, tbl.path, str(tmp_path / "ck2"), str(tmp_path / "sink2"),
        starting_snapshot_id=str(base),
    )
    # first batch reads (base, current] only — not the initial 100
    assert out.count() == 30


def test_stream_source_fails_on_row_set_change_unless_skipped(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 80, seed=86, partitions=2),
    )
    register(spark)
    ckpt = str(tmp_path / "ck3")
    sink3 = str(tmp_path / "sink3")
    assert _drain(spark, tbl.path, ckpt, sink3).count() == 80

    victim = tbl.scan().select("url").orderBy("url").first().url
    delete_where(tbl, [Predicate("url", "in", (victim,))])
    tbl.append(generate_pages(spark, 10, seed=87, partitions=1))

    with pytest.raises(Exception, match="append-only"):
        _drain(spark, tbl.path, ckpt, sink3)

    # with the skip flag the appends still flow (documented data-loss
    # trade-off; CDC is the consistent path for the delete itself)
    out = _drain(
        spark, tbl.path, str(tmp_path / "ck4"), str(tmp_path / "sink4"),
        skip_row_changes="true",
        starting_snapshot_id=str(2),
    )
    assert out.count() == 10


def test_stream_sink_icehouse_to_icehouse_exactly_once(spark, tmp_path):
    """Dogfood pipeline: icehouse source → icehouse SINK. Each epoch lands
    as one txn-stamped snapshot; re-draining with the same checkpoint adds
    nothing, and the sink's snapshot txn property records the epoch."""
    src = IcehouseTable.create(
        spark, str(tmp_path / "src"),
        generate_pages(spark, 90, seed=88, partitions=2),
    )
    register(spark)
    sink_path = str(tmp_path / "sinktbl")
    ckpt = str(tmp_path / "ck5")

    def drain():
        q = (
            spark.readStream.format("icehouse").load(src.path)
            .writeStream.format("icehouse")
            .option("path", sink_path)
            .option("txn_app_id", "teststream")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    sink = IcehouseTable(spark, sink_path)
    assert sink.row_count() == 90

    src.append(generate_pages(spark, 25, seed=89, partitions=1))
    drain()
    assert sink.row_count() == 115
    got = sorted((r.url, r.text) for r in sink.scan().select("url", "text").collect())
    want = sorted((r.url, r.text) for r in src.scan().select("url", "text").collect())
    assert got == want
    # epoch ids recorded through the txn property (exactly-once evidence)
    assert sink.last_txn_version("teststream") is not None
    # an idle re-drain commits nothing
    v = sink.current_version()
    drain()
    assert sink.current_version() == v
