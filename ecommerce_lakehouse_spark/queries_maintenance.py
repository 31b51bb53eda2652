"""Maintenance-suite queries for the driver's rows-only checks.

Each entry builds a deterministic Icehouse pages table in a scratch dir,
runs real maintenance (MERGE / SCD2 / compact+Z-order / expire), and returns
the resulting scan. No SQL oracle exists (the ops run over our own table
format), so the driver records rows-only results — which are still exact:
the datagen is a pure function of (seed, index) and every maintenance op is
deterministic, so row sets are stable across runs.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXED_NOW = datetime.datetime(2024, 7, 1, 0, 0, 0)


def _fresh_dir() -> str:
    return tempfile.mkdtemp(prefix="icehouse-q-")


def _pages_out(df: DataFrame) -> DataFrame:
    """Deterministic, hash-friendly projection of a pages scan."""
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    return df.select(
        "url",
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
        F.length("text").alias("text_len"),
        "lang",
    )


def m_merge_scd1_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE over the pages table: 2000 base, 400 recrawls, 200 new."""
    from .datagen import generate_pages, generate_recrawl_delta
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", generate_pages(spark, 2000, seed=5, partitions=4)
        )
        delta = dedup_latest(
            generate_recrawl_delta(spark, 2000, n_new=200, n_recrawl=400, seed=5),
            ["url"], "warc_ts",
        )
        merge_into(tbl, delta, "url")
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_compact_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction + Z-order, then a predicate-pushdown scan: returns the
    post-maintenance watermark slice (must equal the pre-maintenance one —
    the north-rule identical-row-sets invariant, asserted in tests)."""
    from .datagen import generate_pages
    from .maintenance import compact, zorder_by
    from .table import IcehouseTable, Predicate

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", generate_pages(spark, 1500, seed=9, partitions=5)
        )
        tbl.append(generate_pages(spark, 500, seed=9, partitions=3, revision=2))
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        zorder_by(tbl, curve="hilbert", target_file_bytes=512 * 1024)
        cutoff = datetime.datetime(2023, 12, 1)
        return _pages_out(tbl.scan([Predicate("warc_ts", ">", cutoff)])).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_scd2_history_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 recrawl history: two batches → closed/open version chains."""
    from .datagen import generate_pages
    from .operators.scd import scd2_merge
    from .table import IcehouseTable

    d = _fresh_dir()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        base = generate_pages(spark, 800, seed=11, partitions=2).select(
            "url", "text", "lang", F.col("warc_ts").alias("crawl_ts")
        )
        recrawl = generate_pages(spark, 300, seed=11, partitions=2, revision=1).select(
            "url", "text", "lang", F.col("warc_ts").alias("crawl_ts")
        )
        scd2_merge(spark, f"{d}/dim", base, ["url"], ["text", "lang"], "crawl_ts",
                   now=FIXED_NOW)
        scd2_merge(spark, f"{d}/dim", recrawl, ["url"], ["text", "lang"], "crawl_ts",
                   now=FIXED_NOW)
        tbl = IcehouseTable(spark, f"{d}/dim")
        return tbl.scan().select(
            "url",
            F.length("text").alias("text_len"),
            F.unix_micros(F.col("effective_from").cast("timestamp")).alias("from_us"),
            F.unix_micros(F.col("effective_to").cast("timestamp")).alias("to_us"),
            "is_current",
            "version_sk",
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expiry keeps the current snapshot byte-identical while sweeping
    unreferenced files; returns the post-expiry scan."""
    from .datagen import generate_pages
    from .maintenance import compact, expire_snapshots, rewrite_manifests
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", generate_pages(spark, 600, seed=13, partitions=3)
        )
        tbl.append(generate_pages(spark, 200, seed=14, partitions=2))
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        rewrite_manifests(tbl, target_entries=100)
        expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_delete_vectors_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full merge-on-read delete stack, deterministically: positional
    DELETE WHERE (deletion vectors, no file rewrite), compaction
    MATERIALIZES those, then an EQUALITY delete (no position scan) followed
    by a re-insert of one key proving added_by sequence semantics. Returns
    the final scan — victims are fixed url slices."""
    import pyspark.sql.functions as _F

    from .datagen import generate_pages
    from .maintenance import compact
    from .table import IcehouseTable, Predicate, delete_by_key, delete_where

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", generate_pages(spark, 1500, seed=9, partitions=3)
        )
        urls = sorted(
            r.url for r in tbl.scan().select("url").distinct().collect()
        )
        victims = tuple(urls[::97][:12])
        snap = delete_where(tbl, [Predicate("url", "in", victims)])
        assert snap is not None and snap.summary["deleted_rows"] >= 12
        assert tbl.current_snapshot().delete_manifest is not None
        compact(tbl, target_file_bytes=1 << 30)
        assert tbl.current_snapshot().delete_manifest is None

        eq_victims = [u for u in urls[3::101][:8] if u not in victims]
        revived = eq_victims[0]
        revived_rows = tbl.scan().filter(_F.col("url") == revived).collect()
        delete_by_key(tbl, "url", eq_victims)
        # sequence semantics: a later append of a deleted key is visible
        tbl.append(spark.createDataFrame(revived_rows, tbl.scan().schema))
        out = tbl.scan()
        assert out.filter(_F.col("url") == revived).count() == 1
        return _pages_out(out).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


MAINTENANCE_REGISTRY: dict = {
    "m_merge_scd1_pages": (m_merge_scd1_pages, None),
    "m_compact_zorder_pruned_scan": (m_compact_zorder_pruned_scan, None),
    "m_scd2_history_pages": (m_scd2_history_pages, None),
    "m_snapshot_expire": (m_snapshot_expire, None),
    "m_delete_vectors_pages": (m_delete_vectors_pages, None),
}
