"""AC-004 data-quality gate: >1% nulls fails; gate composes with the
pipeline's fail-stop (watermark not advanced past a bad batch)."""

from __future__ import annotations

import datetime

import pytest

from ecommerce_lakehouse_spark.operators.dq import DQRule, DQViolation, check, enforce
from ecommerce_lakehouse_spark.operators.pipeline import (
    TransformSpec,
    WatermarkStore,
    run_pipeline,
)


def df_with_nulls(spark, n, n_null):
    rows = [(i if i >= n_null else None, f"v{i}") for i in range(n)]
    return spark.createDataFrame(rows, "order_id int, v string")


def test_ac004_null_ratio_gate(spark):
    ok = df_with_nulls(spark, 1000, 5)       # 0.5% nulls
    bad = df_with_nulls(spark, 1000, 20)     # 2% nulls
    rules = [DQRule("max_null_ratio", "order_id", 0.01)]
    assert check(ok, rules) == []
    with pytest.raises(DQViolation) as e:
        enforce(bad, rules)
    assert e.value.failures[0]["observed"] == 0.02


def test_multiple_rules_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (1, -2.0), (2, 3.0)], "k int, amount double"
    )
    failures = check(
        df,
        [
            DQRule("max_duplicate_ratio", "k", 0.10),
            DQRule("not_negative", "amount", 0.0),
            DQRule("min_rows", threshold=10),
        ],
    )
    assert {f["rule"] for f in failures} == {
        "max_duplicate_ratio", "not_negative", "min_rows",
    }


def test_dq_gate_blocks_watermark_advance(spark, tmp_path):
    src_path = str(tmp_path / "src")
    df_bad = spark.createDataFrame(
        [(None, datetime.datetime(2024, 1, 1))] * 5
        + [(1, datetime.datetime(2024, 1, 1))],
        "order_id int, ts timestamp_ntz",
    )
    df_bad.write.parquet(src_path)
    store = WatermarkStore(str(tmp_path / "wm"))
    spec = TransformSpec(
        name="orders_clean",
        transform=lambda s, incr: enforce(
            incr, [DQRule("max_null_ratio", "order_id", 0.01)]
        ),
        source=lambda s, wm: s.read.parquet(src_path),
        watermark_col="ts",
    )
    with pytest.raises(DQViolation):
        run_pipeline(spark, [spec], store)
    assert not store.has("orders_clean"), "bad batch must not advance watermark"
