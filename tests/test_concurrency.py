"""Optimistic concurrency: snapshot isolation across concurrent MERGE +
compaction (north_rule), composing appends, parallel commit races."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance import compact, plan_compaction
from ecommerce_lakehouse_spark.maintenance.compact import _rewrite_bin
from ecommerce_lakehouse_spark.operators.merge import merge_into
from ecommerce_lakehouse_spark.table import CommitConflict, IcehouseTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = None
    for i in range(3):
        df = generate_pages(spark, 100, seed=51 + i, partitions=2)
        if t is None:
            t = IcehouseTable.create(spark, str(tmp_path / "c"), df)
        else:
            t.append(df)
    return t


def test_merge_during_compaction_conflicts(spark, tbl):
    """Compaction staged its rewrite, then a MERGE rewrites one of its input
    files and commits first → compaction's commit must abort, and the
    merged data must survive (no lost update)."""
    bins = plan_compaction(tbl, target_file_bytes=64 * 1024 * 1024)
    assert bins
    staged = [(b, _rewrite_bin(tbl, b, 64 * 1024 * 1024, None)) for b in bins]

    # concurrent merge rewrites a file that is a compaction input
    victim_url_row = (
        spark.read.schema(tbl.schema())
        .parquet(f"{tbl.path}/{bins[0].files[0].path}")
        .orderBy("url")
        .limit(1)
    )
    src = victim_url_row.withColumn("lang", F.lit("xx"))
    res = merge_into(tbl, src, "url")
    assert res.snapshot is not None

    removed = [f.path for b, _ in staged for f in b.files]
    added = [o for _, outs in staged for o in outs]
    with pytest.raises(CommitConflict):
        tbl.replace_files(removed, None, operation="compact", precomputed_added=added)

    # lost-update check: the merge's change is still visible (>=1: the url
    # may legitimately exist in several appends → multi-match update)
    assert tbl.scan().filter(F.col("lang") == "xx").count() >= 1


def test_compaction_then_stale_merge_conflicts(spark, tbl):
    """Merge staged against a pre-compaction snapshot must abort when the
    compaction replaced its affected files first."""
    files_before = tbl.live_files()
    snap = compact(tbl, target_file_bytes=64 * 1024 * 1024)
    assert snap is not None
    # a replace based on the OLD file list is now stale
    with pytest.raises(CommitConflict):
        tbl.replace_files(
            [files_before[0].path], None, operation="merge", precomputed_added=[]
        )


def test_concurrent_appends_all_commit(spark, tbl):
    """Appends never conflict: N racing writers all land, data = union."""
    before = tbl.scan().count()

    def do_append(i):
        return tbl.append(generate_pages(spark, 20, seed=100 + i, partitions=1))

    with ThreadPoolExecutor(max_workers=4) as pool:
        snaps = list(pool.map(do_append, range(4)))
    assert len({s.snapshot_id for s in snaps}) == 4
    assert tbl.scan().count() == before + 80
    # lineage is a clean chain
    ids = [s.snapshot_id for s in tbl.snapshots()]
    assert ids == sorted(ids)


def test_compaction_concurrent_with_append(spark, tbl):
    """An append landing between compaction staging and commit composes:
    compaction's rebase keeps the appended files."""
    bins = plan_compaction(tbl, target_file_bytes=64 * 1024 * 1024)
    staged = [(b, _rewrite_bin(tbl, b, 64 * 1024 * 1024, None)) for b in bins]
    tbl.append(generate_pages(spark, 30, seed=200, partitions=1))
    removed = [f.path for b, _ in staged for f in b.files]
    added = [o for _, outs in staged for o in outs]
    snap = tbl.replace_files(removed, None, operation="compact", precomputed_added=added)
    assert snap is not None
    assert tbl.scan().count() == 330, "append + compaction both visible"
