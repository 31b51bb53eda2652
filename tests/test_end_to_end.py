"""End-to-end medallion flow (reference lifecycle SURVEY §3): streaming
bronze ingest → silver SCD2 + sessionization → gold affected-key aggregates,
then the maintenance pass (compact + cluster + expire) with the north-rule
invariant: identical row sets before and after maintenance, byte-identical
extracted text per url."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import (
    extract_text_udf,
    generate_pages,
    generate_recrawl_delta,
)
from ecommerce_lakehouse_spark.maintenance import (
    compact,
    expire_snapshots,
    rewrite_manifests,
    zorder_by,
)
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.operators.scd import scd2_merge
from ecommerce_lakehouse_spark.operators.sessionize import recompute_affected
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate

NOW = datetime.datetime(2024, 8, 1)


def test_full_medallion_flow_with_maintenance(spark, tmp_path):
    # ---- bronze: historical crawl + incremental recrawl batch -------------
    base = generate_pages(spark, 1000, seed=71, partitions=4)
    bronze = IcehouseTable.create(spark, str(tmp_path / "bronze"), base)
    delta = dedup_latest(
        generate_recrawl_delta(spark, 1000, n_new=150, n_recrawl=250, seed=71),
        ["url"], "warc_ts",
    )

    # ---- silver: SCD2 recrawl history, fed incrementally (batch per crawl) --
    def as_silver(df):
        return df.select("url", "text", "lang", F.col("warc_ts").alias("crawl_ts"))

    scd2_merge(
        spark, str(tmp_path / "dim"), as_silver(bronze.scan()),
        ["url"], ["text", "lang"], "crawl_ts", now=NOW,
    )
    merge_into(bronze, delta, "url")  # bronze keeps latest (SCD1)
    assert bronze.scan().count() == 1150
    scd2_merge(
        spark, str(tmp_path / "dim"), as_silver(delta),
        ["url"], ["text", "lang"], "crawl_ts", now=NOW,
    )
    dim = IcehouseTable(spark, str(tmp_path / "dim"))
    n_current = dim.scan([Predicate("is_current", "=", True)]).count()
    assert n_current == 1150, "exactly one current version per url"
    n_history = dim.scan().count()
    assert n_history == 1150 + 250, "recrawled urls keep their closed version"

    # ---- gold: affected-key re-aggregation over the delta ------------------
    incr = bronze.scan(
        [Predicate("warc_ts", ">", datetime.datetime(2023, 12, 15))]
    )

    def agg(df):
        return df.groupBy("lang").agg(
            F.count("*").alias("pages"),
            F.sum(F.length("text")).alias("chars"),
        )

    gold = recompute_affected(bronze.scan(), incr, "lang", agg)
    assert gold.count() > 0

    # ---- maintenance: compact + Hilbert cluster + manifest rewrite + expiry
    full_before = sorted(
        (r.url, str(r.warc_ts), r.text, r.lang) for r in bronze.scan().collect()
    )
    pred = [Predicate("warc_ts", ">", datetime.datetime(2023, 12, 15))]
    slice_before = sorted(
        (r.url, str(r.warc_ts)) for r in bronze.scan(pred).collect()
    )

    compact(bronze, target_file_bytes=8 * 1024 * 1024)
    zorder_by(bronze, curve="hilbert", target_file_bytes=256 * 1024)
    rewrite_manifests(bronze, sort_by_stat="url")
    expire_snapshots(bronze, keep_last=1, orphan_grace_ms=0)

    full_after = sorted(
        (r.url, str(r.warc_ts), r.text, r.lang) for r in bronze.scan().collect()
    )
    slice_after = sorted(
        (r.url, str(r.warc_ts)) for r in bronze.scan(pred).collect()
    )
    assert full_after == full_before, "maintenance must not change the table"
    assert slice_after == slice_before, "pushdown scans identical post-maintenance"

    # ---- north-rule per-row invariant: byte-identical text per url ---------
    re_extracted = bronze.scan().withColumn(
        "text2", extract_text_udf()(F.col("html"))
    )
    mismatches = re_extracted.filter(F.col("text") != F.col("text2")).count()
    assert mismatches == 0, "extracted text must be byte-identical per url"
