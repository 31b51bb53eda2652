"""Checkpointed exactly-once stream ingest with dead-letter routing —
the reference's ``src/bronze/stream_clickstream.py`` rebuilt on Structured
Streaming + Icehouse sinks.

Pipeline parity (SURVEY §2.9, §3.2):
- fixed event schema that "must exactly match the producer"
  (``stream_clickstream.py:77-87``) → EVENT_SCHEMA
- cast value→string, ``from_json`` parse, validity flag on required fields
  (``:144-153``)
- ONE ``foreachBatch`` splits each micro-batch into valid + dead-letter and
  writes both, reading the source once (``:158-227`` — the single-consumer
  fan-out rationale)
- ``trigger(availableNow=True)`` drain-and-stop scheduling (``:226``,
  ``docs/kafka-concepts.md:224-237``)
- exactly-once: Structured Streaming checkpoints offsets per micro-batch,
  and because foreachBatch is only at-least-once (a crash between append and
  checkpoint commit replays the batch), every append carries a
  ``txn=(stream_id, batch_id)`` marker recorded atomically in the table's
  properties — replays of an already-committed batch are skipped (Delta's
  txnAppId/txnVersion pattern, ``kafka-concepts.md:114-169``). Each sink
  table tracks its own marker, so a crash after the valid-append but before
  the dead-letter append replays ONLY the missing sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..table.format import IcehouseTable

# must exactly match the producer (stream_clickstream.py:77-87)
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("customer_id", IntegerType()),
        StructField("product_id", IntegerType()),
        StructField("event_type", StringType()),
        StructField("session_id", StringType()),
        StructField("page", StringType()),
        StructField("event_ts", StringType()),
        # PERMISSIVE corrupt-record capture: unparseable payloads land here
        StructField("_corrupt", StringType()),
    ]
)

VALID_SCHEMA = (
    "event_id string, customer_id int, product_id int, event_type string, "
    "session_id string, page string, event_ts timestamp_ntz, "
    "kafka_offset long, kafka_partition int, ingested_at timestamp_ntz"
)
DEAD_SCHEMA = (
    "raw_payload string, kafka_offset long, kafka_partition int, "
    "kafka_timestamp timestamp_ntz, ingested_at timestamp_ntz, failure_reason string"
)


def parse_and_flag(raw: DataFrame) -> DataFrame:
    """value bytes → JSON struct + validity flag (stream_clickstream.py:144-153)."""
    parsed = raw.withColumn("value_str", F.col("value").cast("string")).withColumn(
        "data",
        F.from_json(
            F.col("value_str"),
            EVENT_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return parsed.withColumn(
        "_malformed", F.col("data").isNull() | F.col("data._corrupt").isNotNull()
    ).withColumn(
        "_is_valid",
        ~F.col("_malformed")
        & F.col("data.event_id").isNotNull()
        & F.col("data.customer_id").isNotNull(),
    )


@dataclass
class StreamStats:
    batches: int = 0
    valid_rows: int = 0
    dead_rows: int = 0
    batch_ids: list = field(default_factory=list)


def route_batch(
    batch_df: DataFrame,
    batch_id: int,
    valid_table: IcehouseTable,
    dead_table: IcehouseTable,
    stats: StreamStats,
    now=None,
    stream_id: str = "clickstream",
) -> None:
    """Split ONE micro-batch into valid events + dead letters and append both
    (single source read → two sinks, stream_clickstream.py:160-227).
    Appends are txn-marked per (stream_id, batch_id): a foreachBatch replay
    of an already-committed batch is a no-op on that sink."""
    flagged = parse_and_flag(batch_df).persist()
    ingest_ts = (
        F.lit(now).cast("timestamp_ntz") if now
        else F.current_timestamp().cast("timestamp_ntz")
    )
    try:
        valid = flagged.filter(F.col("_is_valid")).select(
            F.col("data.event_id").alias("event_id"),
            F.col("data.customer_id").alias("customer_id"),
            F.col("data.product_id").alias("product_id"),
            F.col("data.event_type").alias("event_type"),
            F.col("data.session_id").alias("session_id"),
            F.col("data.page").alias("page"),
            F.to_timestamp(F.col("data.event_ts")).cast("timestamp_ntz").alias("event_ts"),
            F.col("offset").alias("kafka_offset"),
            F.col("partition").alias("kafka_partition"),
            ingest_ts.alias("ingested_at"),
        )
        dead = flagged.filter(~F.col("_is_valid")).select(
            F.col("value_str").alias("raw_payload"),
            F.col("offset").alias("kafka_offset"),
            F.col("partition").alias("kafka_partition"),
            F.col("timestamp").cast("timestamp_ntz").alias("kafka_timestamp"),
            ingest_ts.alias("ingested_at"),
            F.when(F.col("_malformed"), "malformed_json")
            .otherwise("missing_required_field")
            .alias("failure_reason"),
        )
        n_valid = valid.count()
        n_dead = dead.count()
        if n_valid and valid_table.append(valid, txn=(stream_id, batch_id)) is None:
            n_valid = 0  # replayed batch — already in the table
        if n_dead and dead_table.append(dead, txn=(stream_id, batch_id)) is None:
            n_dead = 0
        stats.batches += 1
        stats.valid_rows += n_valid
        stats.dead_rows += n_dead
        stats.batch_ids.append(batch_id)
    finally:
        flagged.unpersist()


def run_clickstream_ingest(
    spark: SparkSession,
    source_path: str,
    valid_path: str,
    dead_path: str,
    checkpoint_path: str,
    now=None,
) -> StreamStats:
    """availableNow micro-batch ingest from a Kafka-shaped file stream into
    two Icehouse tables; resumes from the checkpoint on restart."""
    from ..sources.ingest import read_file_stream

    valid_table = _ensure(spark, valid_path, VALID_SCHEMA)
    dead_table = _ensure(spark, dead_path, DEAD_SCHEMA)
    stats = StreamStats()

    stream = read_file_stream(spark, source_path)
    # the checkpoint identifies the stream across restarts → txn app id
    stream_id = f"clickstream:{checkpoint_path}"
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: route_batch(
                df, bid, valid_table, dead_table, stats, now, stream_id
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def debug_sink(stream: DataFrame, name: str, output_mode: str = "append"):
    """S9 memory/debug sink (the reference's display()/memory-sink probes):
    drain a stream into an in-memory table queryable as ``SELECT * FROM
    {name}``. availableNow + NO checkpoint — the memory sink cannot recover
    from checkpoints, so this is strictly a debugging probe, never a
    production sink (production paths are the txn-marked Icehouse appends).
    Returns the terminated query."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _ensure(spark: SparkSession, path: str, ddl: str) -> IcehouseTable:
    tbl = IcehouseTable(spark, path)
    if not tbl.exists():
        from pyspark.sql.types import _parse_datatype_string

        empty = spark.createDataFrame([], _parse_datatype_string(ddl))
        tbl = IcehouseTable.create(spark, path, empty)
    return tbl
