"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA}/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", f"{TESTDATA}/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lakehouse-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
