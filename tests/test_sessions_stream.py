"""Native Structured-Streaming sessionization: session_window + watermark,
append-once emission, checkpointed incremental runs."""

from __future__ import annotations

import datetime

from ecommerce_lakehouse_spark.streaming.sessions_stream import (
    run_streaming_sessionization,
)
from ecommerce_lakehouse_spark.table import IcehouseTable


def write_events(spark, path, rows):
    df = spark.createDataFrame(
        [(i, datetime.datetime.fromisoformat(t), u, v) for i, (t, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_sessions_emit_after_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # user 1: two events 10 min apart (one session); user 2: one event.
    write_events(spark, src, [
        ("2024-01-01T10:00:00", 1, 1.0),
        ("2024-01-01T10:10:00", 1, 2.0),
        ("2024-01-01T11:30:00", 2, 5.0),
    ])
    n1 = run_streaming_sessionization(spark, src, out, ckpt)
    # watermark sits at 11:30-10min=11:20 < session1's gap end (10:40)?
    # 10:10+30min = 10:40 <= 11:20 → user 1's session is CLOSED and emitted;
    # user 2's session (ends 12:00) stays in state.
    tbl = IcehouseTable(spark, out)
    got = {r.user_id: r for r in tbl.scan().collect()}
    assert n1 == 1 and set(got) == {1}
    s1 = got[1]
    assert s1.event_count == 2 and s1.value_sum == 3.0
    assert str(s1.session_start) == "2024-01-01 10:00:00"
    assert str(s1.session_end) == "2024-01-01 10:40:00"  # last event + gap

    # a later batch advances the watermark past user 2's gap and extends
    # user 2 with an in-gap event first
    write_events(spark, src, [
        ("2024-01-01T11:45:00", 2, 7.0),   # within 30-min gap → same session
        ("2024-01-02T09:00:00", 3, 1.0),   # sentinel pushes watermark forward
    ])
    n2 = run_streaming_sessionization(spark, src, out, ckpt)
    got = {r.user_id: r for r in tbl.scan().collect()}
    assert 2 in got, "user 2's session closes once the watermark passes it"
    assert got[2].event_count == 2 and got[2].value_sum == 12.0
    assert str(got[2].session_end) == "2024-01-01 12:15:00"
    assert n2 == 1
    # exactly-once: no duplicate emission of user 1's session
    assert tbl.scan().filter("user_id = 1").count() == 1

    # re-run with no new data: checkpoint makes it a no-op
    n3 = run_streaming_sessionization(spark, src, out, ckpt)
    assert n3 == 0
