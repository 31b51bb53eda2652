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
