"""True Structured-Streaming sessionization — the Spark-native alternative
to the reference's batch LAG formulation (SURVEY T5 notes both designs).

The reference computes sessions in batch (LAG + running sum) because its
watermarks are table-based (``stream_clickstream.py:135-137``: "the 10-min
watermark belongs in Silver's sessionization"). Here we also provide the
streaming-native version: ``withWatermark`` + ``session_window`` keeps the
gap-merge state inside Spark's state store, emits a session only once its
gap closes past the watermark, and scales state cleanly (per-key state,
watermark-driven eviction) on a real cluster.

Trade-offs vs the batch operator (operators/sessionize.py):
- streaming emits each closed session exactly once (append mode); late
  events beyond the watermark are DROPPED, while the batch affected-key
  recompute repairs arbitrarily late data;
- open sessions stay in state (not visible) until the watermark passes
  their gap; the batch version materializes open sessions and extends them
  via partial-update MERGE.
Both exist because the reference's semantics need the batch path (T6), and
a 100 TB live pipeline wants the streaming path for freshness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table.format import IcehouseTable

SESSIONS_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "event_count long, value_sum double"
)


def streaming_sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events (streaming DF) → closed sessions via native session_window."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(entity_col))
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col(entity_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "event_count",
            "value_sum",
        )
    )


def run_streaming_sessionization(
    spark: SparkSession,
    source_path: str,
    sessions_path: str,
    checkpoint_path: str,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> int:
    """availableNow micro-batch run: file-stream events → closed sessions
    appended to an Icehouse table. Returns rows appended this run."""
    tbl = IcehouseTable(spark, sessions_path)
    if not tbl.exists():
        from pyspark.sql.types import _parse_datatype_string

        tbl = IcehouseTable.create(
            spark, sessions_path,
            spark.createDataFrame([], _parse_datatype_string(SESSIONS_SCHEMA)),
        )
    appended = {"n": 0}

    events = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(source_path)
    sessions = streaming_sessionize(events, "user_id", "ts", gap, watermark_delay)

    stream_id = f"sessions:{checkpoint_path}"

    def sink(batch_df: DataFrame, bid: int) -> None:
        # foreachBatch is at-least-once: txn marker makes replays no-ops
        n = batch_df.count()
        if n and tbl.append(batch_df, txn=(stream_id, bid)) is not None:
            appended["n"] += n

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended["n"]
