"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``ecommerce_lakehouse_spark``; this module is a
thin adapter over ``ecommerce_lakehouse_spark.queries.REGISTRY``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402
from ecommerce_lakehouse_spark.queries import q_sessionize  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 30-min gap sessionization (the reference's signature
    transform — sessionize_clickstream.py) on /root/testdata/sf0.001."""
    return q_sessionize(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query.

    The maintenance oracles read pre-materialized fixture parquet (the same
    files the Spark queries ingest) — materialize them here too, Spark-free,
    so the SQL is runnable regardless of which side the driver runs first.
    """
    from ecommerce_lakehouse_spark.datagen.fixtures import ensure_fixtures

    ensure_fixtures()
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
