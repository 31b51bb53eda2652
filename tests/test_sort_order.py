"""The "sort.order" table property (Iceberg write sort-order analog):
plain appends range-distribute + sort on the declared columns, so each
staged file carries a DISJOINT key range and manifest-stats pruning cuts
files on the hot column without a Z-order rewrite. The merge writer must
degrade to a within-partition sort (range sampling would double its
Observation counters), and "sort.order.distribution"="local" opts any
writer down to the within-partition sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.operators.merge import merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate


def _shuffled_pages(spark, n=400, seed=91):
    """Pages hash-redistributed on url so every input partition spans the
    FULL warc_ts range — the layout where sort.order has to earn the cut."""
    return generate_pages(spark, n, seed=seed, partitions=4).repartition(4, "url")


def _ts_cutoff(df, frac=0.25):
    lo, hi = df.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    return lo + (hi - lo) * frac


def test_sort_order_appends_get_disjoint_bounds_and_prune(spark, tmp_path):
    df = _shuffled_pages(spark)
    plain = IcehouseTable.create(spark, str(tmp_path / "plain"), df)
    sorted_t = IcehouseTable.create(
        spark, str(tmp_path / "sorted"), df,
        properties={"sort.order": "warc_ts"},
    )
    assert sorted_t.scan().count() == plain.scan().count() == 400
    pred = [Predicate("warc_ts", "<", _ts_cutoff(df))]
    n_sorted = len(sorted_t.planned_files(pred))
    n_plain = len(plain.planned_files(pred))
    # unsorted twin: every file spans the full ts range — zero pruning
    assert n_plain == len(plain.live_files())
    assert n_sorted < len(sorted_t.live_files())
    # disjoint ranges: per-file (min, max) intervals must not overlap
    bounds = sorted(
        (f.stats["warc_ts"]["min"], f.stats["warc_ts"]["max"])
        for f in sorted_t.live_files()
    )
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo
    # values identical to the unsorted twin (sorting is layout-only)
    assert (
        sorted_t.scan().exceptAll(plain.scan()).count() == 0
        and plain.scan().exceptAll(sorted_t.scan()).count() == 0
    )


def test_sort_order_local_distribution_keeps_layout(spark, tmp_path):
    df = _shuffled_pages(spark)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"), df,
        properties={"sort.order": "warc_ts",
                    "sort.order.distribution": "local"},
    )
    # local mode: no redistribution, so files keep spanning the range —
    # but within every file the rows are sorted (row-group stats tighten)
    assert len(tbl.live_files()) == 4
    for f in tbl.live_files():
        ts = [
            r.warc_ts for r in
            spark.read.parquet(f"{tbl.path}/{f.path}").select("warc_ts").collect()
        ]
        assert ts == sorted(ts)


def test_sort_order_merge_metrics_stay_exact(spark, tmp_path):
    """The merge path must NOT range-sample (Observation counters would
    double) — counts stay exact and the table still scans correctly."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 400, seed=92, partitions=4),
        properties={"sort.order": "warc_ts"},
    )
    delta = generate_recrawl_delta(spark, 400, 50, 80, seed=92, partitions=2)
    res = merge_into(tbl, delta, key_cols=["url"])
    assert (res.rows_updated, res.rows_inserted) == (80, 50)
    assert tbl.scan().count() == 450


def test_sort_order_ignores_unknown_columns(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 100, seed=93, partitions=2),
        properties={"sort.order": "no_such_col"},
    )
    assert tbl.scan().count() == 100


def test_compaction_preserves_sort_order_pruning(spark, tmp_path):
    """Sort-rewrite compaction: two overlapping-range appends (every file
    narrow within its own batch, ranges overlapping ACROSS batches) pack
    into RANGE-ADJACENT bins, so each compacted output covers a narrow
    contiguous slice again and the ts-slice cut survives the rewrite.
    (Plain FFD would interleave ranges and widen every output back out.)"""
    from ecommerce_lakehouse_spark.maintenance import compact

    df = _shuffled_pages(spark, n=600, seed=94)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"), df,
        properties={"sort.order": "warc_ts"},
    )
    tbl.append(_shuffled_pages(spark, n=600, seed=95))
    before = tbl.scan().collect()
    res = compact(tbl, target_file_bytes=256 * 1024)
    live = tbl.live_files()
    assert res is not None and len(live) > 1
    spans = [
        (f.stats["warc_ts"]["min"], f.stats["warc_ts"]["max"]) for f in live
    ]
    table_lo = min(lo for lo, _ in spans)
    table_hi = max(hi for _, hi in spans)
    # every compacted file covers a NARROW contiguous slice, not the
    # whole range (boundary ties between range-adjacent bins are fine)
    for lo, hi in spans:
        assert (hi - lo) <= (table_hi - table_lo) * 0.6
    pred = [Predicate("warc_ts", "<", _ts_cutoff(df))]
    assert len(tbl.planned_files(pred)) < len(live)
    after = tbl.scan().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
