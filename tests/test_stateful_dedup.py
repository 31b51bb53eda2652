"""applyInPandasWithState custom operator: exact dedup across micro-batches
with persistent state, checkpoint resume, duplicate counters."""

from __future__ import annotations

import datetime

from ecommerce_lakehouse_spark.streaming.stateful_dedup import run_stateful_dedup
from ecommerce_lakehouse_spark.table import IcehouseTable


def write_events(spark, path, rows):
    df = spark.createDataFrame(
        [(u, e, datetime.datetime.fromisoformat(t), v) for u, e, t, v in rows],
        "user_id long, event_id string, ts timestamp, value double",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_cross_batch_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    write_events(spark, src, [
        (1, "e1", "2024-01-01T10:00:00", 1.0),
        (1, "e2", "2024-01-01T10:01:00", 2.0),
        (1, "e1", "2024-01-01T10:02:00", 1.0),   # dup within the batch
        (2, "e1", "2024-01-01T10:03:00", 9.0),   # same event_id, other key: kept
    ])
    n1 = run_stateful_dedup(spark, src, out, ckpt)
    tbl = IcehouseTable(spark, out)
    assert n1 == 3
    assert tbl.scan().filter("user_id = 1").count() == 2
    assert tbl.scan().filter("user_id = 2").count() == 1

    # batch 2 replays e1/e2 (at-least-once source) + delivers a new e3:
    # state in the store must drop the replays ACROSS batches
    write_events(spark, src, [
        (1, "e1", "2024-01-01T10:10:00", 1.0),
        (1, "e2", "2024-01-01T10:11:00", 2.0),
        (1, "e3", "2024-01-01T10:12:00", 3.0),
    ])
    n2 = run_stateful_dedup(spark, src, out, ckpt)
    assert n2 == 1, "only the genuinely new event survives"
    got = sorted(r.event_id for r in tbl.scan().filter("user_id = 1").collect())
    assert got == ["e1", "e2", "e3"]
    e3 = tbl.scan().filter("user_id = 1 and event_id = 'e3'").first()
    assert e3.dups_dropped_so_far == 3, "running duplicate counter persisted"


def test_state_ttl_evicts_idle_keys(spark, tmp_path):
    """Event-time TTL (ADVICE r01): a key idle past the dedup window has its
    state evicted once the watermark passes, so (a) the state store is
    bounded, (b) a dup arriving later than the window is re-emitted — the
    window is the documented guarantee."""
    from ecommerce_lakehouse_spark.streaming.stateful_dedup import (
        stateful_dedup_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    window_ms = 60 * 1000  # 1-minute dedup window

    def run(name):
        rows = []
        events = spark.readStream.schema(
            "user_id long, event_id string, ts timestamp, value double"
        ).parquet(src)
        q = (
            stateful_dedup_stream(events, dedup_window_ms=window_ms)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.user_id, r.event_id) for r in rows}

    write_events(spark, src, [(1, "e1", "2024-01-01T10:00:00", 1.0)])
    assert (1, "e1") in run("r1")

    # 3h later, another key advances the watermark far past key 1's deadline
    write_events(spark, src, [(2, "x1", "2024-01-01T13:00:00", 1.0)])
    run("r2")

    # key 1's state evicted in a following batch → the late dup re-emits
    write_events(spark, src, [(9, "y1", "2024-01-01T13:30:00", 1.0)])
    run("r3")
    write_events(spark, src, [(1, "e1", "2024-01-01T13:31:00", 1.0)])
    got = run("r4")
    assert (1, "e1") in got, "post-window dup must re-emit (state evicted)"


def test_dedup_within_window_drops_across_runs(spark, tmp_path):
    """Inside the window, dups are still dropped across separate runs."""
    from ecommerce_lakehouse_spark.streaming.stateful_dedup import (
        stateful_dedup_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def run(name):
        rows = []
        events = spark.readStream.schema(
            "user_id long, event_id string, ts timestamp, value double"
        ).parquet(src)
        q = (
            stateful_dedup_stream(events, dedup_window_ms=3600_000)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return len(rows)

    write_events(spark, src, [(1, "e1", "2024-01-01T10:00:00", 1.0)])
    assert run("w1") == 1
    write_events(spark, src, [(1, "e1", "2024-01-01T10:10:00", 1.0)])
    assert run("w2") == 0, "dup within the window dropped across runs"
