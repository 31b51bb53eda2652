"""Sessions-table maintenance (M4): open sessions extended by late events,
new sessions inserted, idempotent re-runs."""

from __future__ import annotations

import datetime

from ecommerce_lakehouse_spark.operators.sessionize import maintain_sessions_table


def ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime.fromisoformat(t), e, i) for u, t, e, i in rows],
        "user_id int, ts timestamp_ntz, et string, event_id int",
    )


def test_open_session_extended_and_new_inserted(spark, tmp_path):
    path = str(tmp_path / "sessions")
    batch1 = ev(spark, [
        (1, "2024-01-01T10:00:00", "view", 1),
        (1, "2024-01-01T10:05:00", "view", 2),
        (2, "2024-01-01T11:00:00", "view", 3),
    ])
    tbl, _ = maintain_sessions_table(
        spark, path, batch1, batch1, "user_id", "ts",
        event_type_col="et", conversion_type="purchase", tiebreak_col="event_id",
    )
    s1 = {r.user_id: r for r in tbl.scan().collect()}
    assert s1[1].event_count == 2 and not s1[1].converted

    # batch 2: user 1's open session continues (within gap) + converts;
    # user 3 starts a brand-new session; user 2 untouched
    batch2 = ev(spark, [
        (1, "2024-01-01T10:20:00", "purchase", 4),
        (3, "2024-01-01T12:00:00", "view", 5),
    ])
    all_events = batch1.unionByName(batch2)
    tbl, res = maintain_sessions_table(
        spark, path, all_events, batch2, "user_id", "ts",
        event_type_col="et", conversion_type="purchase", tiebreak_col="event_id",
    )
    assert res.rows_updated == 1 and res.rows_inserted == 1
    s2 = {r.user_id: r for r in tbl.scan().collect()}
    assert s2[1].event_count == 3 and s2[1].converted, "open session extended"
    assert s2[1].session_id == s1[1].session_id, "deterministic id stable"
    assert s2[1].session_duration_secs == 1200
    assert s2[2].event_count == 1, "unaffected entity untouched"
    assert s2[3].event_count == 1, "new entity inserted"

    # idempotency: re-running the same batch is a no-op on values
    state = sorted(map(tuple, tbl.scan().collect()))
    maintain_sessions_table(
        spark, path, all_events, batch2, "user_id", "ts",
        event_type_col="et", conversion_type="purchase", tiebreak_col="event_id",
    )
    assert sorted(map(tuple, tbl.scan().collect())) == state
