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
