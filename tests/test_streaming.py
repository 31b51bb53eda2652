"""Streaming ingest: dead-letter routing, checkpoint resume (exactly-once),
Kafka-shaped source schema, audit columns, CSV rescue."""

from __future__ import annotations

import datetime
import json

import pytest

from ecommerce_lakehouse_spark.sources.ingest import (
    read_csv_rescue,
    with_audit_columns,
)
from ecommerce_lakehouse_spark.streaming.clickstream import (
    run_clickstream_ingest,
)
from ecommerce_lakehouse_spark.table import IcehouseTable

NOW = datetime.datetime(2024, 5, 1, 8, 0, 0)


def make_events(good_n: int, start_offset: int = 0):
    rows = []
    for i in range(good_n):
        payload = json.dumps(
            {
                "event_id": f"e{start_offset + i}",
                "customer_id": 1 + (i % 5),
                "product_id": 10 + i,
                "event_type": "page_view",
                "session_id": f"s{i}",
                "page": "/home",
                "event_ts": f"2024-05-01T07:{i % 60:02d}:00",
            }
        )
        rows.append((None, payload.encode(), "clicks", 0, start_offset + i))
    return rows


def bad_events(start_offset: int):
    return [
        (None, b"{this is not json", "clicks", 0, start_offset),
        (None, json.dumps({"customer_id": 7}).encode(), "clicks", 0, start_offset + 1),
        (None, json.dumps({"event_id": "x"}).encode(), "clicks", 0, start_offset + 2),
    ]


def write_batch(spark, path, rows):
    df = spark.createDataFrame(
        [(k, v, t, p, o, NOW) for k, v, t, p, o in rows],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_dead_letter_routing_and_resume(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    valid_p = str(tmp_path / "clicks_valid")
    dead_p = str(tmp_path / "clicks_dead")
    ckpt = str(tmp_path / "ckpt")

    write_batch(spark, src, make_events(8) + bad_events(100))
    stats = run_clickstream_ingest(spark, src, valid_p, dead_p, ckpt, now=NOW)
    assert stats.valid_rows == 8
    assert stats.dead_rows == 3

    valid = IcehouseTable(spark, valid_p)
    dead = IcehouseTable(spark, dead_p)
    assert valid.scan().count() == 8
    got = {r.failure_reason for r in dead.scan().collect()}
    assert got == {"malformed_json", "missing_required_field"}
    # parsed types survived
    row = valid.scan().filter("event_id = 'e0'").first()
    assert row.customer_id == 1 and str(row.event_ts).startswith("2024-05-01 07:00")

    # --- resume: new file arrives; checkpoint must skip the old one --------
    write_batch(spark, src, make_events(4, start_offset=200))
    stats2 = run_clickstream_ingest(spark, src, valid_p, dead_p, ckpt, now=NOW)
    assert stats2.valid_rows == 4, "only the new file is processed"
    assert valid.scan().count() == 12
    assert dead.scan().count() == 3

    # re-run with nothing new: no-op
    stats3 = run_clickstream_ingest(spark, src, valid_p, dead_p, ckpt, now=NOW)
    assert stats3.valid_rows == 0 and stats3.dead_rows == 0
    assert valid.scan().count() == 12


def test_audit_columns_from_metadata(spark, tmp_path):
    p = str(tmp_path / "csvdir")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string").coalesce(
        1
    ).write.csv(p, header=True)
    df = with_audit_columns(
        spark.read.option("header", True).csv(p), now=NOW
    )
    rows = df.collect()
    assert all(r.source_file_path.endswith(".csv") for r in rows)
    assert all(r.source_file_size > 0 for r in rows)
    assert all(r.ingestion_timestamp == NOW for r in rows)


def test_csv_rescue_catches_bad_rows(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,amount\n1,10.5\n2,not_a_number\n3,30.25\n")
    df = read_csv_rescue(spark, str(p), schema="id int, amount double")
    good = df.filter("_rescued_data IS NULL")
    bad = df.filter("_rescued_data IS NOT NULL")
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_a_number" in bad.first()._rescued_data


def test_kafka_constructor_builds_real_source(spark):
    """read_kafka_stream wires format('kafka') with SASL/offset options —
    the production seam. The sandbox ships no Kafka connector, so the load
    fails with the data-source-not-found error, proving it reaches the real
    source lookup (not a silent stub)."""
    import pytest as _pytest

    from ecommerce_lakehouse_spark.sources.ingest import read_kafka_stream

    with _pytest.raises(Exception, match="(?i)kafka"):
        read_kafka_stream(
            spark, "broker:9092", "clickstream",
            max_offsets_per_trigger=10000,
            sasl_jaas="org.apache.kafka.common.security.plain.PlainLoginModule required;",
        )


def test_debug_memory_sink(spark, tmp_path):
    """S9: the memory/debug sink drains a stream into a queryable in-memory
    table (debug probe only — no checkpoint, not a production sink)."""
    import datetime as dt

    from ecommerce_lakehouse_spark.streaming.clickstream import debug_sink

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "id long, ts timestamp"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, ts timestamp").parquet(src)
    debug_sink(stream, "dbg_probe")
    assert spark.sql("SELECT * FROM dbg_probe").count() == 1
