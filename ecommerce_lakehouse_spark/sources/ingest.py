"""Batch/streaming ingestion — the bronze layer rebuilt on vanilla Spark.

Reference parity (SURVEY §2.1):
- S1 Auto Loader CSV scan → ``read_csv_rescue``: schema-or-infer CSV read in
  PERMISSIVE mode with a ``_rescued_data`` corrupt-record column (the
  vanilla-Spark equivalent of cloudFiles schemaEvolutionMode=rescue,
  ``src/bronze/ingest_bronze_tables.py:72-79``).
- S2 file-metadata enrichment → ``with_audit_columns``: ingestion_timestamp +
  source file path/name/size/mtime from the built-in ``_metadata`` struct
  (``src/bronze/ingest_bronze_tables.py:36-46``).
- S3 Kafka source → ``read_file_stream``: the sandbox has no broker, so the
  stream source is a file stream delivering the SAME downstream schema
  (key/value/topic/partition/offset/timestamp per ``docs/kafka-concepts.md:
  182-192``); on a real cluster swap ``format("kafka")`` in one place.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

RESCUE_COL = "_rescued_data"


def read_csv_rescue(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV read with rescue semantics: rows that don't fit the schema land
    intact in ``_rescued_data`` instead of failing the job."""
    reader = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", RESCUE_COL)
    )
    if schema is None:
        reader = reader.option("inferSchema", True)
        df = reader.csv(path)
        return df.withColumn(RESCUE_COL, F.lit(None).cast("string"))
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    schema = StructType(schema.fields + [StructType.fromDDL(f"{RESCUE_COL} string").fields[0]])
    # Spark disallows referencing only the corrupt-record column on an
    # uncached scan (SPARK-21610) — cache so callers can filter on it freely.
    return reader.schema(schema).csv(path).cache()


def with_audit_columns(df: DataFrame, now: datetime.datetime | None = None) -> DataFrame:
    """Append the reference's bronze audit columns from the hidden
    ``_metadata`` struct, then drop it (ingest_bronze_tables.py:36-46)."""
    ingest_ts = F.lit(now).cast("timestamp_ntz") if now else F.current_timestamp()
    return (
        df.withColumns(
            {
                "ingestion_timestamp": ingest_ts,
                "source_file_path": F.col("_metadata.file_path"),
                "source_file_name": F.col("_metadata.file_name"),
                "source_file_size": F.col("_metadata.file_size"),
                "source_file_modified_at": F.col("_metadata.file_modification_time"),
            }
        )
    )


KAFKA_LIKE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp"
)


def read_file_stream(
    spark: SparkSession, path: str, schema: str = KAFKA_LIKE_SCHEMA
) -> DataFrame:
    """Streaming source with the Kafka wire schema, backed by files
    (sandbox stand-in for ``readStream.format('kafka')``)."""
    return spark.readStream.schema(schema).parquet(path)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    sasl_jaas: str | None = None,
    extra_options: dict | None = None,
) -> DataFrame:
    """The REAL Kafka source (reference: stream_clickstream.py:107-120) —
    identical columns to :func:`read_file_stream`, so every downstream
    operator (parse_and_flag, route_batch, sessionization) is source-
    agnostic: swapping a file stream for Kafka is this one constructor.

    Requires the spark-sql-kafka connector on the cluster classpath
    (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    this sandbox ships no Kafka broker or connector, so the call raises a
    clear error here — it is the documented production seam, not a fake.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if sasl_jaas is not None:
        reader = (
            reader.option("kafka.security.protocol", "SASL_SSL")
            .option("kafka.sasl.mechanism", "PLAIN")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    # project to the exact wire schema read_file_stream produces
    return df.select("key", "value", "topic", "partition", "offset", "timestamp")
