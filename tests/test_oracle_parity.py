"""Every REGISTRY query must match its DuckDB oracle exactly — the local
mirror of the driver's CORRECTNESS gate (order-insensitive value compare)."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_spark.queries import REGISTRY

from .conftest import SF_ORACLE
from .util_compare import assert_arrow_match, duckdb_arrow, spark_arrow

SQL_BACKED = [name for name, (_fn, sql) in REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, name):
    fn, sql = REGISTRY[name]
    spark_tbl = spark_arrow(fn(spark, SF_ORACLE))
    oracle_tbl = duckdb_arrow(sql, SF_ORACLE)
    assert_arrow_match(spark_tbl, oracle_tbl, name)
    # an oracle that passes on an empty result set verifies nothing
    # (VERDICT r02 #3) — every registry query must produce rows at sf0.01
    assert spark_tbl.num_rows > 0, f"{name}: oracle passed on empty output"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))

