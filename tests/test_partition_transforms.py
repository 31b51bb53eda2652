"""Partition transforms (identity/year/month/day/hour/truncate): spec in
properties, write-path fanout via partitionBy on transient JVM columns,
per-file __pt: tags, partitions() rollup, spec evolution, compaction
isolation, and the hive-escape roundtrip for url-shaped values.

Parity target: Iceberg's partition-transform family; the reference's
date-partitioned bronze writes (src/utils/02_bronze_ingest.py) are the
identity/day special case.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen.pages import generate_pages
from ecommerce_lakehouse_spark.table import IcehouseTable
from ecommerce_lakehouse_spark.table.partitioning import (
    PT_STAT_PREFIX,
    Transform,
    hive_unescape,
    parse_transform_text,
    partition_tuple_of_file,
)


def _day_of_micros(v: int) -> datetime.date:
    """Stats store timestamps as epoch MICROseconds (table/stats.py)."""
    return datetime.datetime.fromtimestamp(
        v / 1_000_000, tz=datetime.timezone.utc
    ).date()


def _mk(spark, tmp_path, props, n=300, seed=77, partitions=4):
    df = generate_pages(spark, n, seed=seed, partitions=partitions)
    return IcehouseTable.create(spark, str(tmp_path / "t"), df, properties=props), df


# ------------------------------------------------------------ transform unit


def test_parse_transform_text_forms():
    assert parse_transform_text("day(warc_ts)") == Transform("day", "warc_ts")
    assert parse_transform_text("DAYS(warc_ts)") == Transform("day", "warc_ts")
    assert parse_transform_text("truncate(url, 16)") == Transform(
        "truncate", "url", 16
    )
    assert parse_transform_text("lang") == Transform("identity", "lang")
    with pytest.raises(ValueError):
        parse_transform_text("bucket(url, 8)")  # bucket has its own spec


def test_transform_validation():
    with pytest.raises(ValueError):
        Transform("truncate", "url")  # needs width
    with pytest.raises(ValueError):
        Transform("day", "warc_ts", 3)  # width on a date transform
    Transform("day", "x").validate("timestamp_ntz")
    with pytest.raises(ValueError):
        Transform("day", "x").validate("string")
    with pytest.raises(ValueError):
        Transform("truncate", "x", 4).validate("timestamp")


def test_hive_unescape_roundtrip():
    # the chars Hive escapes in partition dir names — url values hit these
    assert hive_unescape("https%3A%2F%2Fa.example%2Fp%3Fq%3D1") == (
        "https://a.example/p?q=1"
    )
    assert hive_unescape("plain-2024-03-01") == "plain-2024-03-01"
    assert hive_unescape("%25") == "%"


# -------------------------------------------------------------- write + tags


def test_day_partition_tags_and_layout(spark, tmp_path):
    tbl, df = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    files = tbl.live_files()
    # every file carries exactly one day tag, and one FILE per day exists
    # (hash write-distribution: file count tracks distinct values)
    days = set()
    for f in files:
        pt = partition_tuple_of_file(f)
        assert pt is not None and len(pt) == 1
        label, value = pt[0]
        assert label == "day(warc_ts)"
        days.add(value)
    want_days = {
        r[0]
        for r in df.select(F.date_format("warc_ts", "yyyy-MM-dd")).distinct().collect()
    }
    assert days == want_days
    # the transform makes source-column stats exact: min==max at day grain
    for f in files:
        st = f.stats["warc_ts"]
        assert _day_of_micros(st["min"]) == _day_of_micros(st["max"])
    # scan returns the exact input rows
    got = tbl.scan().select("url", "warc_ts").sort("url")
    want = df.select("url", "warc_ts").sort("url")
    assert got.collect() == want.collect()


def test_truncate_url_tag_survives_escaping(spark, tmp_path):
    # url values contain ':' and '/' — dir names are Hive-escaped and the
    # staging walk must invert the escaping exactly
    tbl, df = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "truncate", "col": "url", "w": 12}]'},
    )
    want = {
        r[0] for r in df.select(F.substring("url", 1, 12)).distinct().collect()
    }
    got = set()
    for f in tbl.live_files():
        (label, value), = partition_tuple_of_file(f)
        assert label == "truncate(url,12)"
        got.add(value)
    assert got == want
    assert any("/" in v or ":" in v for v in got)  # escaping was exercised


def test_numeric_truncate_floors_to_multiple(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "n"), df,
        properties={
            "partition.spec": '[{"transform": "truncate", "col": "k", "w": 25}]'
        },
    )
    vals = {partition_tuple_of_file(f)[0][1] for f in tbl.live_files()}
    assert vals == {"0", "25", "50", "75"}
    assert tbl.scan().count() == 100


def test_identity_and_multi_transform_compose(spark, tmp_path):
    tbl, df = _mk(
        spark, tmp_path,
        {
            "partition.spec": (
                '[{"transform": "identity", "col": "lang"},'
                ' {"transform": "month", "col": "warc_ts"}]'
            )
        },
    )
    for f in tbl.live_files():
        pt = dict(partition_tuple_of_file(f))
        assert set(pt) == {"identity(lang)", "month(warc_ts)"}
    want = df.groupBy(
        F.col("lang"), F.date_format("warc_ts", "yyyy-MM").alias("m")
    ).count().count()
    assert len(tbl.live_files()) == want  # one file per (lang, month)


def test_null_partition_value(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x"), ("b", None), ("c", "x")], "url string, lang string"
    )
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "z"), df,
        properties={"partition.spec": '[{"transform": "identity", "col": "lang"}]'},
    )
    by_val = {partition_tuple_of_file(f)[0][1]: f for f in tbl.live_files()}
    assert set(by_val) == {"x", None}
    null_tag = by_val[None].stats[f"{PT_STAT_PREFIX}identity(lang)"]
    assert null_tag["null_count"] == by_val[None].row_count == 1
    assert tbl.scan().count() == 3


# ----------------------------------------------------- bucket + cluster compose


def test_partition_composes_with_bucket(spark, tmp_path):
    tbl, df = _mk(
        spark, tmp_path,
        {
            "partition.spec": '[{"transform": "day", "col": "warc_ts"}]',
            "bucket.key": "url",
            "bucket.n": "4",
        },
    )
    from ecommerce_lakehouse_spark.table.format import bucket_of_file

    for f in tbl.live_files():
        assert bucket_of_file(f) is not None
        assert partition_tuple_of_file(f) is not None
    assert tbl.scan().count() == 300


# --------------------------------------------------------------- evolution


def test_spec_evolution_metadata_only(spark, tmp_path):
    tbl, df = _mk(spark, tmp_path, None)  # created unpartitioned
    files_before = {f.path for f in tbl.live_files()}
    tbl.set_partition_spec(["day(warc_ts)"])
    # metadata-only: no data file changed
    assert {f.path for f in tbl.live_files()} == files_before
    assert [t.label for t in tbl.partition_spec()] == ["day(warc_ts)"]
    # old files untagged, new writes tagged
    delta = generate_pages(spark, 50, seed=78, partitions=2)
    tbl.append(delta)
    tagged = [f for f in tbl.live_files() if partition_tuple_of_file(f)]
    untagged = [f for f in tbl.live_files() if not partition_tuple_of_file(f)]
    assert tagged and untagged
    assert all(f.path not in files_before for f in tagged)
    assert tbl.scan().count() == 350


def test_spec_evolution_changes_generation(spark, tmp_path):
    tbl, _ = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    tbl.set_partition_spec(["month(warc_ts)"])
    tbl.append(generate_pages(spark, 50, seed=79, partitions=2))
    labels = {
        label
        for f in tbl.live_files()
        for label, _v in (partition_tuple_of_file(f) or ())
    }
    assert labels == {"day(warc_ts)", "month(warc_ts)"}  # both generations live


def test_set_partition_spec_validates(spark, tmp_path):
    tbl, _ = _mk(spark, tmp_path, None)
    with pytest.raises(ValueError):
        tbl.set_partition_spec(["day(nope)"])
    with pytest.raises(ValueError):
        tbl.set_partition_spec(["day(url)"])  # wrong type
    with pytest.raises(ValueError):
        tbl.set_partition_spec(["day(warc_ts)", "day(warc_ts)"])


def test_rename_guard_covers_partition_cols(spark, tmp_path):
    tbl, _ = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    with pytest.raises(ValueError):
        tbl.rename_column("warc_ts", "ts2")


# --------------------------------------------------- maintenance interaction


def test_compaction_never_mixes_partitions(spark, tmp_path):
    from ecommerce_lakehouse_spark.maintenance.compact import compact

    tbl, df = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    # several small appends → many small files per day
    for s in (81, 82):
        tbl.append(generate_pages(spark, 120, seed=s, partitions=3))
    before = tbl.scan().sort("url", "warc_ts").collect()
    snap = compact(tbl, target_file_bytes=64 * 1024 * 1024)
    assert snap is not None
    for f in tbl.live_files():
        pt = partition_tuple_of_file(f)
        assert pt is not None  # outputs keep (pass through) their day tag
        st = f.stats["warc_ts"]
        assert _day_of_micros(st["min"]) == _day_of_micros(st["max"])  # one day
    assert tbl.scan().sort("url", "warc_ts").collect() == before


def test_merge_rederives_tags_under_current_spec(spark, tmp_path):
    from ecommerce_lakehouse_spark.operators.merge import merge_into

    tbl, df = _mk(spark, tmp_path, None, n=200)
    tbl.set_partition_spec(["day(warc_ts)"])
    delta = generate_pages(spark, 200, seed=77, partitions=2, revision=1)
    merge_into(tbl, delta, "url")
    # the merge REWRITES matched files through the partition-aware writer:
    # its outputs are tagged even though the base files predate the spec
    rewritten = [
        f for f in tbl.live_files()
        if partition_tuple_of_file(f) is not None
    ]
    assert rewritten
    # correctness: merged table is latest-wins over url
    assert tbl.scan().count() == 200
    assert tbl.scan().filter(F.col("warc_ts").isNull()).count() == 0


def test_partitions_rollup_groups_by_tuple(spark, tmp_path):
    tbl, df = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    rows = tbl.partitions().collect()
    assert sum(r.n_rows for r in rows) == 300
    n_days = df.select(F.to_date("warc_ts")).distinct().count()
    assert len(rows) == n_days
    assert all(r.partition and "day(warc_ts)" in r.partition for r in rows)
    # files() exposes the tuple as a queryable map
    fr = tbl.files().select(
        F.element_at("partition", "day(warc_ts)").alias("d")
    ).distinct()
    assert fr.count() == n_days


# ----------------------------------------------------------------- SQL DDL


def test_sql_set_partition_spec(spark, tmp_path):
    from ecommerce_lakehouse_spark.sql import IcehouseSQL

    tbl, _ = _mk(spark, tmp_path, None)
    sql = IcehouseSQL(spark)
    path = f"'{tmp_path / 't'}'"
    sql.sql(
        f"ALTER TABLE {path} SET PARTITION SPEC (day(warc_ts), truncate(url, 8))"
    )
    assert [t.label for t in tbl.partition_spec()] == [
        "day(warc_ts)", "truncate(url,8)"
    ]
    sql.sql(f"ALTER TABLE {path} SET PARTITION SPEC ()")
    assert tbl.partition_spec() == []


def test_sql_show_partitions_files_manifests(spark, tmp_path):
    from ecommerce_lakehouse_spark.sql import IcehouseSQL

    tbl, df = _mk(
        spark, tmp_path,
        {"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    sql = IcehouseSQL(spark)
    path = f"'{tmp_path / 't'}'"
    parts = sql.sql(f"SHOW PARTITIONS {path}")
    n_days = df.select(F.to_date("warc_ts")).distinct().count()
    assert parts.count() == n_days
    assert sql.sql(f"SHOW FILES {path}").count() == len(tbl.live_files())
    assert sql.sql(f"SHOW MANIFESTS {path}").count() >= 1
    # SHOW SNAPSHOTS joined the grammar with snapshots_df() (seventh
    # session) — the out-of-grammar probe moves to a nonsense keyword
    assert sql.sql(f"SHOW SNAPSHOTS {path}").count() >= 1
    with pytest.raises(Exception, match="SHOW supports"):
        sql.sql(f"SHOW SEGMENTS {path}")


def test_streaming_sink_fans_out_partition_tags(spark, tmp_path):
    """icehouse→icehouse streaming: epochs append through the partition-
    aware writer, so a pre-created partitioned sink gets tagged files."""
    from ecommerce_lakehouse_spark.sources.datasource import register

    src = IcehouseTable.create(
        spark, str(tmp_path / "ssrc"),
        generate_pages(spark, 120, seed=85, partitions=2),
    )
    register(spark)
    sink_path = str(tmp_path / "spt")
    IcehouseTable.create(
        spark, sink_path,
        spark.createDataFrame([], src.scan().schema),
        properties={"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    q = (
        spark.readStream.format("icehouse").load(src.path)
        .writeStream.format("icehouse").option("path", sink_path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    sink = IcehouseTable(spark, sink_path)
    assert sink.row_count() == 120
    live = [f for f in sink.live_files() if f.row_count]
    assert live and all(partition_tuple_of_file(f) for f in live)
