"""File-level key sketches (sketch.cols): zero-read MERGE discovery cut on
layouts where nothing else routes — unbucketed AND un-clustered (every
file spans the whole key range, so interval routing self-disables, and
there are no bucket tags)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable
from ecommerce_lakehouse_spark.table.format import (
    SKETCH_BITS,
    SKETCH_STAT_PREFIX,
    _sketch_hits,
    sketch_position_expr,
)


@pytest.fixture()
def sketched(spark, tmp_path):
    # round-robin repartition: every file spans the full url range, the
    # worst case for interval routing and exactly what the sketch is for
    df = generate_pages(spark, 800, seed=71, partitions=2).repartition(8)
    return IcehouseTable.create(
        spark, str(tmp_path / "t"), df,
        properties={"sketch.cols": "url"},
    )


def test_every_file_carries_a_sketch(spark, sketched):
    files = sketched.live_files()
    assert len(files) == 8
    for f in files:
        entry = f.stats.get(f"{SKETCH_STAT_PREFIX}url")
        assert entry and entry["bits"] == SKETCH_BITS
        # the sketch must contain every key actually in the file
        positions = [
            r["__p"]
            for r in spark.read.parquet(f"{sketched.path}/{f.path}")
            .select(sketch_position_expr("url").alias("__p"))
            .distinct().collect()
        ]
        assert _sketch_hits(entry["b64"], positions)


def test_sketch_cuts_point_merge_discovery(spark, sketched):
    # keys SPREAD across the whole range: global bounds keep every file,
    # per-file intervals keep every file (round-robin layout) — only the
    # sketch can cut
    all_urls = sorted(
        r.url for r in sketched.scan().select("url").distinct().collect()
    )
    urls = all_urls[:: len(all_urls) // 3][:3]
    delta = dedup_latest(
        sketched.scan().filter(F.col("url").isin(urls))
        .withColumn("text", F.concat(F.lit("rev "), F.col("text"))),
        ["url"], "warc_ts",
    )
    n_target = sketched.scan().filter(F.col("url").isin(urls)).count()
    res = merge_into(sketched, delta, "url")
    assert res.rows_updated == n_target
    s = sketched.current_snapshot().summary
    # with every file spanning the whole url range, only the sketch cuts
    assert s["merge_candidates_scanned"] < s["merge_candidates_global"], (
        f"sketch routing should prune discovery: {s}"
    )
    assert sketched.scan().count() == 800


def test_sketchless_files_always_kept_and_correct(spark, sketched, tmp_path):
    """Compaction outputs carry no sketch — they are conservatively always
    scanned, never wrongly dropped."""
    from ecommerce_lakehouse_spark.maintenance import compact

    compact(sketched, target_file_bytes=1 << 30)
    assert sketched.scan().count() == 800
    urls = [r.url for r in sketched.scan().select("url").distinct()
            .orderBy("url").limit(2).collect()]
    delta = dedup_latest(
        sketched.scan().filter(F.col("url").isin(urls))
        .withColumn("text", F.concat(F.lit("rev2 "), F.col("text"))),
        ["url"], "warc_ts",
    )
    n_target = sketched.scan().filter(F.col("url").isin(urls)).count()
    res = merge_into(sketched, delta, "url")
    assert res.rows_updated == n_target
    assert sketched.scan().count() == 800


def test_sketch_ndv_estimates_distinct_keys(spark, sketched):
    """The same membership bitmaps double as linear-counting NDV
    estimators: per-file and table-level (bitmap-union) estimates must
    land within the estimator's error envelope of the exact counts —
    all from metadata, zero data read."""
    from ecommerce_lakehouse_spark.table.format import sketch_ndv

    exact_total = sketched.scan().select("url").distinct().count()
    est_total = sketched.approx_distinct_keys("url")
    assert est_total is not None
    assert abs(est_total - exact_total) / exact_total < 0.05

    # per-file estimates via the files() metadata table, capped by rows
    per_file = {r.path: r for r in sketched.files().collect()}
    for f in sketched.live_files():
        row = per_file[f.path]
        assert "url" in row.ndv and row.ndv["url"] <= row.row_count
        exact = (
            sketched.read_files([f]).select("url").distinct().count()
        )
        assert abs(row.ndv["url"] - exact) / exact < 0.10
        # a raw estimate exists for every sketched file
        st = f.stats[f"{SKETCH_STAT_PREFIX}url"]
        assert sketch_ndv(st["b64"]) is not None

    # union semantics sanity: the table estimate sits near the per-file
    # sum here (keys are unique across files), and never collapses below
    # the largest single file's estimate. Strict sub-additivity does NOT
    # hold for noisy linear-counting estimates — only approximate bounds.
    per_sum = sum(r.ndv["url"] for r in per_file.values())
    assert est_total <= per_sum * 1.05
    assert est_total >= max(r.ndv["url"] for r in per_file.values())


def test_approx_distinct_keys_none_without_full_sketch_coverage(spark, tmp_path):
    """Unsketched table → None (a partial estimate would silently lie);
    same once an unsketched file joins a sketched lineage."""
    plain = IcehouseTable.create(
        spark, str(tmp_path / "plain"),
        generate_pages(spark, 100, seed=72, partitions=1),
    )
    assert plain.approx_distinct_keys("url") is None


def test_auto_salt_sizes_from_ndv_and_merge_stays_correct(spark, tmp_path):
    """salt_buckets="auto": metadata-only NDV (sketch bitmaps) sizes the
    salt — heavy key duplication turns salting on, unique keys leave it
    off, unsketched candidates resolve to None (no behavior change) —
    and the salted merge's result is value-identical to the plain one."""
    from ecommerce_lakehouse_spark.datagen import generate_recrawl_delta
    from ecommerce_lakehouse_spark.operators.merge import _auto_salt, merge_into

    base = generate_pages(spark, 200, seed=73, partitions=1)
    dup = base.withColumn(
        "__i", F.explode(F.array(*[F.lit(i) for i in range(16)]))
    ).drop("__i")
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "dup"), dup.repartition(4),
        properties={"sketch.cols": "url"},
    )
    cands = tbl.live_files()
    n = _auto_salt(cands, "url")
    assert n == 16  # 16 copies per key → salt 16 (2^ceil(log2(16)))

    uniq = IcehouseTable.create(
        spark, str(tmp_path / "uniq"),
        generate_pages(spark, 200, seed=74, partitions=2),
        properties={"sketch.cols": "url"},
    )
    assert _auto_salt(uniq.live_files(), "url") is None  # dup ≈ 1
    plain = IcehouseTable.create(
        spark, str(tmp_path / "plain"),
        generate_pages(spark, 50, seed=75, partitions=1),
    )
    assert _auto_salt(plain.live_files(), "url") is None  # no sketches

    delta = dedup_latest(
        generate_recrawl_delta(spark, 200, 10, 30, seed=73, partitions=1),
        ["url"], "warc_ts",
    )
    res = merge_into(tbl, delta, "url", salt_buckets="auto")
    assert res.snapshot is not None
    # every copy of a matched url carries the delta's text; new urls in once
    got = tbl.scan()
    assert got.count() == 200 * 16 + 10
    joined = got.join(delta.select("url", F.col("text").alias("want")), "url")
    assert joined.filter(F.col("text") != F.col("want")).count() == 0
