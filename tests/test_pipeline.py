"""Metadata-driven orchestration: watermark advance, empty short-circuit,
dependency validation, fail-stop, end-to-end bronze→silver incremental flow."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.operators.merge import merge_into
from ecommerce_lakehouse_spark.operators.pipeline import (
    RunReport,
    TransformSpec,
    WatermarkStore,
    run_pipeline,
)
from ecommerce_lakehouse_spark.operators.sessionize import (
    recompute_affected,
    sessionize,
)
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate


def test_watermark_store_roundtrip(tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    assert store.get("t1") == datetime.datetime(1900, 1, 1)
    assert not store.has("t1")
    ts = datetime.datetime(2024, 3, 4, 5, 6, 7)
    store.advance("t1", ts)
    assert store.get("t1") == ts and store.has("t1")


def test_pipeline_incremental_flow(spark, tmp_path):
    """bronze pages table → silver SCD1 table driven by watermarks: first run
    processes everything, second run only the delta, third run no-ops."""
    bronze = IcehouseTable.create(
        spark, str(tmp_path / "bronze"), generate_pages(spark, 200, seed=61, partitions=2)
    )
    silver_path = str(tmp_path / "silver")
    store = WatermarkStore(str(tmp_path / "wm"))
    processed = []

    def transform(s, incr):
        incr = incr.persist()
        processed.append(incr.count())
        tbl = IcehouseTable(s, silver_path)
        if not tbl.exists():
            IcehouseTable.create(s, silver_path, incr)
        else:
            merge_into(tbl, incr, "url")
        incr.unpersist()

    spec = TransformSpec(
        name="silver_pages",
        transform=transform,
        source=lambda s, wm: bronze.scan([Predicate("warc_ts", ">", wm)]),
        watermark_col="warc_ts",
    )
    r1 = run_pipeline(spark, [spec], store)
    assert r1.executed == ["silver_pages"] and processed == [200]

    # delta lands in bronze with strictly newer warc_ts (revision bump)
    bronze.append(generate_pages(spark, 50, seed=61, partitions=1, revision=2))
    r2 = run_pipeline(spark, [spec], store)
    assert r2.executed == ["silver_pages"] and processed[-1] == 50

    r3 = run_pipeline(spark, [spec], store)
    assert r3.skipped_empty == ["silver_pages"] and len(processed) == 2
    assert IcehouseTable(spark, silver_path).scan().count() == 200


def test_pipeline_dependency_validation(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    spec = TransformSpec(
        name="gold",
        transform=lambda s, d: None,
        source=lambda s, wm: s.range(0),
        watermark_col="id",
        dependencies=["silver_never_ran"],
    )
    with pytest.raises(RuntimeError, match="dependencies without watermark"):
        run_pipeline(spark, [spec], store)


def test_pipeline_failstop_keeps_watermark(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "id int, ts timestamp_ntz"
    )
    df.write.parquet(str(tmp_path / "src"))

    def boom(s, incr):
        raise ValueError("transform failed")

    spec = TransformSpec(
        name="t",
        transform=boom,
        source=lambda s, wm: s.read.parquet(str(tmp_path / "src")),
        watermark_col="ts",
    )
    with pytest.raises(ValueError):
        run_pipeline(spark, [spec], store)
    assert not store.has("t"), "watermark must not advance past a failure"


def test_pipeline_ordering_and_inactive(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    order = []
    df_path = str(tmp_path / "src2")
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "id int, ts timestamp_ntz"
    ).write.parquet(df_path)

    def mk(name):
        return TransformSpec(
            name=name,
            transform=lambda s, d, n=name: order.append(n),
            source=lambda s, wm: s.read.parquet(df_path),
            watermark_col="ts",
            processing_order={"b": 2, "a": 1, "z": 3}[name],
            is_active=(name != "z"),
        )

    report = run_pipeline(spark, [mk("b"), mk("z"), mk("a")], store)
    assert order == ["a", "b"]
    assert report.skipped_inactive == ["z"]


def test_sessionize_operator_edges(spark):
    """Gap boundary: exactly 30:00 continues the session, 30:01 splits."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), "view"),
        (1, datetime.datetime(2024, 1, 1, 0, 30, 0), "purchase"),   # == gap → same
        (1, datetime.datetime(2024, 1, 1, 1, 0, 1), "view"),        # > gap → new
        (2, datetime.datetime(2024, 1, 1, 23, 59, 0), "view"),      # single-event
        (3, datetime.datetime(2024, 1, 1, 23, 50, 0), "view"),      # cross-midnight
        (3, datetime.datetime(2024, 1, 2, 0, 10, 0), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp_ntz, et string")
    out = sessionize(
        df, "user_id", "ts", event_type_col="et", conversion_type="purchase"
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2
    first = min(by_user[1], key=lambda r: r.first_event_ts)
    assert first.event_count == 2 and first.converted
    assert first.session_duration_secs == 1800
    assert len(by_user[2]) == 1 and by_user[2][0].session_duration_secs == 0
    assert len(by_user[3]) == 1, "cross-midnight stays one session"
    assert str(by_user[3][0].session_date) == "2024-01-01"


def test_recompute_affected_matches_full_recompute(spark, sf_dir="/root/testdata/sf0.001"):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    incr = li.filter(F.col("l_shipdate") > "2001-01-01")

    def agg(df):
        return df.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))

    got = recompute_affected(li, incr, "l_orderkey", agg)
    keys = [r.l_orderkey for r in incr.select("l_orderkey").distinct().collect()]
    want = agg(li.filter(F.col("l_orderkey").isin(keys)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_hybrid_key_scope_large_set_takes_shuffle_path(spark, sf_dir="/root/testdata/sf0.001"):
    """A late-data storm touching more keys than the broadcast limit must
    NOT be broadcast (an unbounded broadcast OOMs at scale): past the
    threshold the plan joins without a BroadcastHashJoin, and the results
    are identical either way."""
    from ecommerce_lakehouse_spark.operators.sessionize import hybrid_key_scope

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys_df = li.select("l_orderkey").distinct()

    # disable auto-broadcast so the COUNTED hint is the only broadcast source
    # (at real scale Catalyst wouldn't auto-broadcast a 10^8-key set anyway;
    # the bug class being prevented is the FORCED broadcast hint)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = hybrid_key_scope(li, keys_df, "l_orderkey", key_limit=10**9)
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small, "under limit → broadcast hint"

        big = hybrid_key_scope(li, keys_df, "l_orderkey", key_limit=1)
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big, "over limit → no forced hint"
        assert big.count() == small.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_chunked_sessionize_identical_on_skewed_data(spark):
    """Skew guard (round 2): one bot entity holding ~50% of all events —
    chunked (entity, time-chunk) sessionization returns BIT-identical
    session ids and rollups to the serial LAG formulation, while its wide
    shuffle is keyed on (entity, chunk) so the bot's events spread across
    partitions instead of one straggler task."""
    import datetime as dt

    from ecommerce_lakehouse_spark.operators.sessionize import (
        sessionize,
        with_session_ids,
        with_session_ids_chunked,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # bot: 3000 events over ~10 days, bursts with gaps crossing chunk edges
    for i in range(3000):
        ts = base + dt.timedelta(minutes=7 * i + (i % 13))
        rows.append((9999, f"e{i}", ts, "view"))
    # 100 normal users, 30 events each
    for u in range(100):
        for i in range(30):
            ts = base + dt.timedelta(hours=u, minutes=40 * i)
            rows.append((u, f"u{u}_{i}", ts, "purchase" if i % 9 == 0 else "view"))
    ev = spark.createDataFrame(
        rows, "user_id long, event_id string, ts timestamp, event_type string"
    ).repartition(16)

    plain = with_session_ids(ev, "user_id", "ts", 1800, tiebreak_col="event_id")
    chunked = with_session_ids_chunked(
        ev, "user_id", "ts", 1800, chunk_seconds=86_400, tiebreak_col="event_id"
    )
    key = lambda df: sorted(
        (r.user_id, r.event_id, r.session_id) for r in df.collect()
    )
    assert key(plain) == key(chunked), "session ids must be bit-identical"

    # rollups agree too (counts, durations, conversion flags)
    roll = lambda c: sorted(
        map(tuple, sessionize(
            ev, "user_id", "ts", 1800, event_type_col="event_type",
            conversion_type="purchase", tiebreak_col="event_id", chunked=c,
        ).collect())
    )
    assert roll(False) == roll(True)

    # the scale property: the wide shuffle includes the chunk key
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan.split("Scan")[0]


def test_chunked_sessionize_boundary_cases(spark):
    """Sessions spanning chunk boundaries merge iff the gap allows; an
    empty chunk in between always splits (chunk_seconds > gap)."""
    import datetime as dt

    from ecommerce_lakehouse_spark.operators.sessionize import (
        with_session_ids,
        with_session_ids_chunked,
    )

    base = dt.datetime(2024, 1, 1, 23, 50)
    rows = [
        (1, "a", base),                                   # chunk 0
        (1, "b", base + dt.timedelta(minutes=15)),        # chunk 1, gap 15m → same session
        (1, "c", base + dt.timedelta(minutes=45)),        # gap 30m → same (<= is not >)
        (1, "d", base + dt.timedelta(days=2)),            # empty chunk between → new
        (2, "x", base + dt.timedelta(minutes=9)),         # other entity chunk 0
        (2, "y", base + dt.timedelta(days=1, minutes=9)), # adjacent chunk, huge gap → new
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id string, ts timestamp")
    plain = {
        (r.user_id, r.event_id): r.session_id
        for r in with_session_ids(ev, "user_id", "ts", 1800, tiebreak_col="event_id").collect()
    }
    chunked = {
        (r.user_id, r.event_id): r.session_id
        for r in with_session_ids_chunked(
            ev, "user_id", "ts", 1800, chunk_seconds=86_400, tiebreak_col="event_id"
        ).collect()
    }
    assert plain == chunked
    assert chunked[(1, "a")] == chunked[(1, "b")] == chunked[(1, "c")]
    assert chunked[(1, "d")] != chunked[(1, "a")]
    assert chunked[(2, "x")] != chunked[(2, "y")]
