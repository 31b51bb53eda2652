"""Driver-facing maintenance queries: deterministic row sets across runs."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_spark.queries_maintenance import MAINTENANCE_REGISTRY


@pytest.mark.parametrize("name", sorted(MAINTENANCE_REGISTRY))
def test_maintenance_query_deterministic(spark, name):
    fn, _ = MAINTENANCE_REGISTRY[name]
    a = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert len(a) > 0
    assert a == b, f"{name}: must be deterministic for the driver's value hash"
