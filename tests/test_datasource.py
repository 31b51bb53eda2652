"""spark.read.format("icehouse"): parity with IcehouseTable.scan, the
relation-scoped `predicates` option → manifest-stats file pruning, time
travel, schema evolution."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.sources.datasource import (
    IcehouseReader,
    register,
)
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate


def rows_of(df):
    return sorted((r.url, str(r.warc_ts), r.text, r.lang) for r in df.collect())


def test_format_icehouse_matches_scan(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 300, seed=91, partitions=3),
    )
    register(spark)
    via_ds = spark.read.format("icehouse").load(tbl.path)
    assert via_ds.schema == tbl.schema()
    assert rows_of(via_ds) == rows_of(tbl.scan())


def test_dsv2_row_filter_matches_scan_without_pushdown(spark, tmp_path):
    # several appends with disjoint revisions; no pushFilters (the reader
    # deliberately doesn't implement it) — Spark applies the filter
    # row-level and the result must equal the native predicate scan
    tbl = None
    for i in range(4):
        d = generate_pages(spark, 120, seed=92 + i, partitions=1, revision=i)
        if tbl is None:
            tbl = IcehouseTable.create(spark, str(tmp_path / "t"), d)
        else:
            tbl.append(d)
    register(spark)
    cutoff = datetime.datetime(2024, 1, 20)  # past rev 0/1, inside rev 2/3

    via_ds = (
        spark.read.format("icehouse").load(tbl.path)
        .filter(F.col("warc_ts") > F.lit(cutoff))
    )
    want = tbl.scan([Predicate("warc_ts", ">", cutoff)])
    assert rows_of(via_ds) == rows_of(want)
    assert via_ds.count() > 0


def test_snapshot_option_time_travel(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 100, seed=96, partitions=2),
    )
    v1 = tbl.current_snapshot().snapshot_id
    tbl.append(generate_pages(spark, 50, seed=97, partitions=1))
    register(spark)
    old = (
        spark.read.format("icehouse")
        .option("snapshot_id", v1).load(tbl.path)
    )
    assert old.count() == 100
    assert spark.read.format("icehouse").load(tbl.path).count() == 150


def test_as_of_timestamp_option_time_travel(spark, tmp_path):
    import time

    import pytest

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 100, seed=96, partitions=2),
    )
    time.sleep(0.05)
    mid = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    # a staged (WAP) append after `mid` must stay invisible: as-of walks
    # the main chain only
    tbl.append(generate_pages(spark, 25, seed=95, partitions=1), publish=False)
    tbl.append(generate_pages(spark, 50, seed=97, partitions=1))
    register(spark)
    old = (
        spark.read.format("icehouse")
        .option("as_of_timestamp", mid.isoformat(sep=" ")).load(tbl.path)
    )
    assert old.count() == 100
    # epoch-millis form addresses the same snapshot
    ms = int(mid.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    old_ms = (
        spark.read.format("icehouse")
        .option("as_of_timestamp", str(ms)).load(tbl.path)
    )
    assert old_ms.count() == 100
    with pytest.raises(Exception, match="conflicts"):
        (
            spark.read.format("icehouse")
            .option("as_of_timestamp", str(ms))
            .option("snapshot_id", tbl.current_snapshot().snapshot_id)
            .load(tbl.path)
            .count()
        )


def test_datasource_reads_across_schema_evolution(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 80, seed=98, partitions=2),
    )
    tbl.append(
        generate_pages(spark, 20, seed=99, partitions=1).withColumn(
            "fetch_status", F.lit(200).cast("int")
        ),
        merge_schema=True,
    )
    register(spark)
    df = spark.read.format("icehouse").load(tbl.path)
    assert df.count() == 100
    assert df.filter(F.col("fetch_status").isNull()).count() == 80
    assert df.filter(F.col("fetch_status") == 200).count() == 20


def test_write_format_icehouse_creates_and_appends(spark, tmp_path):
    """df.write.format("icehouse"): create on first save, append after,
    snapshots atomic, stats collected (pruning works on the written table)."""
    register(spark)
    path = str(tmp_path / "w")
    df = generate_pages(spark, 150, seed=201, partitions=3)
    df.write.format("icehouse").mode("append").save(path)
    tbl = IcehouseTable(spark, path)
    assert tbl.exists()
    assert tbl.scan().count() == 150
    assert tbl.schema() == df.schema
    assert all(f.stats.get("url") for f in tbl.live_files()), "footer stats in manifests"

    generate_pages(spark, 50, seed=202, partitions=1).write.format(
        "icehouse"
    ).mode("append").save(path)
    assert tbl.scan().count() == 200
    assert tbl.current_snapshot().operation == "append"
    # read back through the DSv2 reader: full round trip
    assert spark.read.format("icehouse").load(path).count() == 200


def test_write_overwrite_replaces_atomically(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "w")
    generate_pages(spark, 100, seed=203, partitions=2).write.format(
        "icehouse"
    ).mode("append").save(path)
    tbl = IcehouseTable(spark, path)
    v1 = tbl.current_snapshot().snapshot_id
    generate_pages(spark, 40, seed=204, partitions=1).write.format(
        "icehouse"
    ).mode("overwrite").save(path)
    assert tbl.scan().count() == 40
    assert tbl.current_snapshot().operation == "overwrite"
    # time travel still sees the pre-overwrite data
    assert tbl.scan(snapshot_id=v1).count() == 100


def test_write_merge_schema_option(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "w")
    generate_pages(spark, 60, seed=205, partitions=2).write.format(
        "icehouse"
    ).mode("append").save(path)
    widened = generate_pages(spark, 20, seed=206, partitions=1).withColumn(
        "fetch_status", F.lit(200).cast("int")
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="merge_schema|mergeSchema|new column"):
        widened.write.format("icehouse").mode("append").save(path)
    widened.write.format("icehouse").mode("append").option(
        "mergeSchema", "true"
    ).save(path)
    tbl = IcehouseTable(spark, path)
    assert tbl.scan().count() == 80
    assert tbl.scan().filter(F.col("fetch_status").isNull()).count() == 60


def test_dsv2_prunes_on_extra_clustered_axis(spark, tmp_path):
    """After k-dim clustering on (url, ts, lang), a lang-equality
    predicates option must prune FILE partitions in the DSv2 reader
    (manifest stats on every clustered axis), and results must match the
    native scan."""
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.maintenance.zorder import zorder_by
    from ecommerce_lakehouse_spark.sources.datasource import IcehouseReader, register
    from ecommerce_lakehouse_spark.table import IcehouseTable

    df = generate_pages(spark, 2000, seed=97, partitions=4)
    tbl = IcehouseTable.create(spark, str(tmp_path / "pages"), df)
    total = sum(f.size_bytes for f in tbl.live_files())
    zorder_by(tbl, curve="morton", extra_cols=["lang"],
              target_file_bytes=max(1, total // 12))
    rare = (
        tbl.scan().groupBy("lang").count().orderBy("count", "lang").first()["lang"]
    )

    # planner-level: a lang predicates-option cuts the partition list
    import json

    reader = IcehouseReader({"path": tbl.path}, tbl.schema())
    n_all = len(reader.partitions())
    reader2 = IcehouseReader(
        {"path": tbl.path,
         "predicates": json.dumps([["lang", "=", rare]])},
        tbl.schema(),
    )
    n_pruned = len(reader2.partitions())
    assert 0 < n_pruned < n_all, (rare, n_pruned, n_all)

    # end-to-end parity with the native scan
    register(spark)
    got = (
        spark.read.format("icehouse").load(tbl.path)
        .filter(F.col("lang") == rare).count()
    )
    want = tbl.scan().filter(F.col("lang") == rare).count()
    assert got == want > 0


def test_dsv2_two_axis_conjunction_prunes_more_than_either_axis(spark, tmp_path):
    """VERDICT r03 #6: a lang+ts conjunction after k-dim clustering must
    prune partitions() on BOTH axes' stats — strictly tighter than either
    single-axis filter — with results matching the native scan."""
    import datetime
    import json

    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.maintenance.zorder import zorder_by
    from ecommerce_lakehouse_spark.sources.datasource import IcehouseReader, register
    from ecommerce_lakehouse_spark.table import IcehouseTable

    df = generate_pages(spark, 2000, seed=98, partitions=4)
    tbl = IcehouseTable.create(spark, str(tmp_path / "pages"), df)
    total = sum(f.size_bytes for f in tbl.live_files())
    zorder_by(tbl, curve="hilbert", extra_cols=["lang"],
              target_file_bytes=max(1, total // 16))
    rare = (
        tbl.scan().groupBy("lang").count().orderBy("count", "lang").first()["lang"]
    )
    cut = datetime.datetime(2023, 12, 5)

    def n_parts(triples):
        opts = {"path": tbl.path}
        if triples:
            opts["predicates"] = json.dumps(triples)
        return len(IcehouseReader(opts, tbl.schema()).partitions())

    lang_eq = ["lang", "=", rare]
    ts_gt = ["warc_ts", ">", cut.isoformat()]
    n_all = n_parts([])
    n_lang = n_parts([lang_eq])
    n_ts = n_parts([ts_gt])
    n_both = n_parts([lang_eq, ts_gt])
    assert n_lang < n_all and n_ts < n_all, (n_all, n_lang, n_ts)
    assert n_both <= min(n_lang, n_ts), (n_both, n_lang, n_ts)
    assert n_both < max(n_lang, n_ts), "conjunction must out-prune one axis"

    register(spark)
    cond = (F.col("lang") == rare) & (F.col("warc_ts") > cut)
    got = spark.read.format("icehouse").load(tbl.path).filter(cond).count()
    want = tbl.scan().filter(cond).count()
    assert got == want > 0


def test_dsv2_handles_all_files_pruned(spark, tmp_path):
    """A predicate no file can satisfy prunes the whole partition list;
    the reader must return a typed empty result, not crash on a None
    partition (found via probe: Spark hands read() None for an empty
    partitions() list)."""
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.sources.datasource import register
    from ecommerce_lakehouse_spark.table import IcehouseTable

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 300, seed=3, partitions=2),
    )
    register(spark)
    got = (
        spark.read.format("icehouse").load(tbl.path)
        .filter(F.col("lang") == "zz")  # > every max stat -> prunes all files
    )
    assert got.count() == 0
    assert got.columns == [f.name for f in tbl.schema().fields]


def test_dsv2_reads_tagged_snapshot(spark, tmp_path):
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.sources.datasource import register
    from ecommerce_lakehouse_spark.table import IcehouseTable

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 100, seed=90, partitions=1),
    )
    tbl.create_tag("v1")
    tbl.append(generate_pages(spark, 30, seed=91, partitions=1))
    register(spark)
    got = spark.read.format("icehouse").option("tag", "v1").load(tbl.path)
    assert got.count() == 100
    assert spark.read.format("icehouse").load(tbl.path).count() == 130


def test_incremental_from_reads_only_appended_rows(spark, tmp_path):
    """.option('incremental_from', id): the O(new data) consumption surface
    — only files appended after `id` are planned, compaction in the range
    is silent, and deletes registered at the read point still apply."""
    from ecommerce_lakehouse_spark.maintenance import compact
    from ecommerce_lakehouse_spark.table import Predicate, delete_where

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 200, seed=96, partitions=2),
    )
    base_snap = tbl.current_snapshot().snapshot_id
    tbl.append(generate_pages(spark, 60, seed=97, partitions=1))
    compact(tbl, target_file_bytes=64 * 1024 * 1024)
    register(spark)

    inc = (
        spark.read.format("icehouse")
        .option("incremental_from", base_snap).load(tbl.path)
    )
    assert rows_of(inc) == rows_of(tbl.changes(base_snap))
    assert inc.count() == 60

    # a row-set-changing snapshot in the range makes the append-only read
    # inexpressible — planning must raise, mirroring changes()
    victim = tbl.changes(base_snap).select("url").orderBy("url").first().url
    delete_where(tbl, [Predicate("url", "in", (victim,))])
    inc2 = (
        spark.read.format("icehouse")
        .option("incremental_from", base_snap).load(tbl.path)
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        inc2.count()


def test_dsv2_reads_initial_defaults_per_era(spark, tmp_path):
    """format("icehouse") must mirror read_files' default boundary: the
    driver resolves which files predate add_column(default=…) and the
    Arrow kernel fills the constant — old-era rows read 'cc-main', rows
    stored after the add read their stored value, including explicit
    NULLs (never blanketed by the default)."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 120, seed=95, partitions=2),
    )
    tbl.add_column("crawl_tier", "string", default="cc-main")
    newer = generate_pages(spark, 50, seed=96, partitions=1).withColumn(
        "crawl_tier", F.when(F.length("url") % 2 == 0, F.lit("news"))
    )
    tbl.append(newer)
    register(spark)
    via_ds = spark.read.format("icehouse").load(tbl.path)
    assert via_ds.count() == 170
    assert via_ds.filter(F.col("crawl_tier") == "cc-main").count() == 120
    n_null = newer.filter(F.col("crawl_tier").isNull()).count()
    assert via_ds.filter(F.col("crawl_tier").isNull()).count() == n_null
    # exact parity with the scan path
    from collections import Counter

    a = Counter((r.url, r.crawl_tier) for r in via_ds.select("url", "crawl_tier").collect())
    b = Counter((r.url, r.crawl_tier) for r in tbl.scan().select("url", "crawl_tier").collect())
    assert a == b


def test_dsv2_reads_widened_column_across_eras(spark, tmp_path):
    """format("icehouse") over a widen_column table: old int32 files and
    new int64 files resolve under one LONG schema via the Arrow cast."""
    from pyspark.sql.types import LongType

    base = generate_pages(spark, 100, seed=97, partitions=2).withColumn(
        "fetch_status", (F.crc32("url") % 500).cast("int")
    )
    tbl = IcehouseTable.create(spark, str(tmp_path / "t"), base)
    tbl.widen_column("fetch_status", "long")
    tbl.append(
        generate_pages(spark, 30, seed=98, partitions=1).withColumn(
            "fetch_status", (F.crc32("url") % 500).cast("long")
        )
    )
    register(spark)
    via_ds = spark.read.format("icehouse").load(tbl.path)
    assert isinstance(via_ds.schema["fetch_status"].dataType, LongType)
    assert via_ds.count() == 130
    assert via_ds.filter(F.col("fetch_status").isNull()).count() == 0
    a = sorted((r.url, r.fetch_status) for r in via_ds.select("url", "fetch_status").collect())
    b = sorted((r.url, r.fetch_status) for r in tbl.scan().select("url", "fetch_status").collect())
    assert a == b


def test_dsv2_unfiltered_action_after_filtered_sees_all_rows(spark, tmp_path):
    """Regression for the PythonDataSourceV2 readInfo cache leak: Spark
    keeps ONE mutable partition plan per loaded relation and only
    filtered queries replan. With automatic Python filter pushdown
    enabled, a filtered action pruned files and a later UNFILTERED
    action on the same DataFrame silently reused the pruned plan
    (observed: .filter(isNull).count() then .collect() → 0 rows).
    Auto pushdown is now off; this pins the end-to-end symptom."""
    tbl = None
    for i in range(3):
        d = generate_pages(spark, 100, seed=300 + i, partitions=1, revision=i)
        if tbl is None:
            tbl = IcehouseTable.create(spark, str(tmp_path / "t"), d)
        else:
            tbl.append(d)
    register(spark)
    df = spark.read.format("icehouse").load(tbl.path)
    # filtered first (would prune to rev-2 files under auto pushdown) …
    cutoff = datetime.datetime(2024, 2, 1)
    assert df.filter(F.col("warc_ts") > F.lit(cutoff)).count() < 300
    # … then unfiltered actions on the SAME DataFrame: all rows, twice
    assert df.count() == 300
    assert len(df.collect()) == 300
    # and a DIFFERENT filter is answered from its own plan, not the old one
    assert df.filter(F.col("warc_ts") <= F.lit(cutoff)).count() > 0


def test_dsv2_predicates_option_prunes_files_and_matches_scan(spark, tmp_path):
    """Relation-scoped pruning: .option("predicates", …) is part of the
    relation identity (cache-safe, unlike pushFilters) and must cut the
    planned partition list by manifest stats. It prunes FILES
    conservatively; pairing with the same .filter gives exact rows."""
    import json

    tbl = None
    for i in range(4):
        d = generate_pages(spark, 120, seed=310 + i, partitions=1, revision=i)
        if tbl is None:
            tbl = IcehouseTable.create(spark, str(tmp_path / "t"), d)
        else:
            tbl.append(d)
    register(spark)
    cutoff = datetime.datetime(2024, 1, 20)
    preds = json.dumps([["warc_ts", ">", cutoff.isoformat()]])

    # planner-level: the option alone shrinks partitions()
    r_all = IcehouseReader({"path": tbl.path}, tbl.schema())
    r_opt = IcehouseReader(
        {"path": tbl.path, "predicates": preds}, tbl.schema()
    )
    n_all, n_opt = len(r_all.partitions()), len(r_opt.partitions())
    assert 0 < n_opt < n_all
    assert n_opt == len(tbl.planned_files([Predicate("warc_ts", ">", cutoff)]))

    # end-to-end: option + matching row filter == native predicate scan
    got = (
        spark.read.format("icehouse").option("predicates", preds)
        .load(tbl.path).filter(F.col("warc_ts") > F.lit(cutoff))
    )
    assert rows_of(got) == rows_of(tbl.scan([Predicate("warc_ts", ">", cutoff)]))
