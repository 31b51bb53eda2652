"""The driver owns its SparkSession config. Queries must match their oracles
under a HOSTILE session (non-UTC timezone, different shuffle partitioning) —
regression guard for the UTC-pinning in the query helpers."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_spark.queries import REGISTRY

from .conftest import SF_SMALL
from .util_compare import assert_frames_match, duckdb_run

TZ_SENSITIVE = [
    "scd2_window_chain", "sessionize", "interval_join_pit",
    "global_watermark", "hourly_traffic", "orders_clean",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_matches_oracle_under_hostile_session(spark, name):
    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    ns.conf.set("spark.sql.shuffle.partitions", "7")
    fn, sql = REGISTRY[name]
    spark_pdf = fn(ns, SF_SMALL).toPandas()
    oracle_pdf = duckdb_run(sql, SF_SMALL)
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}@Asia/Tokyo")
