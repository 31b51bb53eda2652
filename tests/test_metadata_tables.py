"""Metadata tables: files() / manifests() / partitions() DataFrames.

Relational twins of the Python-API introspection the maintenance planners
use — asserted for parity against live_files()/manifest_entries_of(), and
row_count() is cross-checked against files() as a consistency invariant.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate, delete_where


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 300, seed=51, partitions=3)
    return IcehouseTable.create(spark, str(tmp_path / "t"), df)


def test_files_matches_live_files(spark, table):
    table.append(generate_pages(spark, 60, seed=52, partitions=2))
    rows = {r.path: r for r in table.files().collect()}
    live = {f.path: f for f in table.live_files()}
    assert set(rows) == set(live)
    for path, f in live.items():
        r = rows[path]
        assert (r.row_count, r.size_bytes, r.added_by) == (
            f.row_count, f.size_bytes, f.added_by
        )
        assert json.loads(r.stats_json) == json.loads(
            json.dumps(f.stats, sort_keys=True, default=str)
        )


def test_files_time_travel_and_delete_rows(spark, table):
    snap1 = table.current_snapshot().snapshot_id
    urls = [r.url for r in table.scan().select("url").distinct()
            .orderBy("url").limit(5).collect()]
    delete_where(table, [Predicate("url", "in", tuple(urls))])
    cur = table.files()
    assert cur.agg(F.sum("delete_rows")).collect()[0][0] == 5
    # at the old snapshot no deletes are registered
    old = table.files(snapshot_id=snap1)
    assert old.agg(F.sum("delete_rows")).collect()[0][0] == 0


def test_row_count_consistent_with_files(spark, table):
    """Metadata-only row_count() must equal the files() rollup."""
    urls = [r.url for r in table.scan().select("url").distinct()
            .orderBy("url").limit(4).collect()]
    delete_where(table, [Predicate("url", "in", tuple(urls))])
    agg = table.files().agg(
        (F.sum("row_count") - F.sum("delete_rows")).alias("n")
    ).collect()[0].n
    assert table.row_count() == agg == 296


def test_manifests_matches_entries(spark, table):
    table.append(generate_pages(spark, 40, seed=53, partitions=1))
    got = sorted(
        (r.path, r.n_files, r.n_rows, r.n_bytes)
        for r in table.manifests().collect()
    )
    want = sorted(
        (e["path"], e["n_files"], e["n_rows"], e["n_bytes"])
        for e in table.manifest_entries_of(table.current_snapshot())
    )
    assert got == want


def test_partitions_bucket_rollup(spark, tmp_path):
    df = generate_pages(spark, 400, seed=54, partitions=4)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "b"), df,
        properties={"bucket.key": "url", "bucket.n": "8"},
    )
    parts = tbl.partitions().collect()
    # every file is bucket-tagged: no NULL group; totals add up
    assert all(r.bucket is not None for r in parts)
    assert sum(r.n_rows for r in parts) == 400
    assert sum(r.n_files for r in parts) == len(tbl.live_files())
    # parity with a SQL rollup over files()
    via_sql = {
        r.bucket: (r.n_files, r.n_rows)
        for r in tbl.files().groupBy("bucket").agg(
            F.count("*").alias("n_files"), F.sum("row_count").alias("n_rows")
        ).collect()
    }
    assert {r.bucket: (r.n_files, r.n_rows) for r in parts} == via_sql


def test_metadata_tables_empty_table(spark, tmp_path):
    t = IcehouseTable(spark, str(tmp_path / "none"))
    # unborn table: resolve fails cleanly rather than returning garbage
    with pytest.raises(Exception):
        t.files().collect()


def test_register_table_views_sql_surface(spark, table):
    """name + name_files/_manifests/_partitions/_history as SQL views."""
    from ecommerce_lakehouse_spark.sources.datasource import register_table_views

    register_table_views(spark, table.path, "pages_t")
    assert spark.sql("SELECT count(*) AS n FROM pages_t").collect()[0].n == 300
    got = spark.sql(
        "SELECT sum(row_count) AS r, count(*) AS f FROM pages_t_files"
    ).collect()[0]
    assert (got.r, got.f) == (300, len(table.live_files()))
    assert spark.sql(
        "SELECT count(*) AS n FROM pages_t_history"
    ).collect()[0].n >= 1
    assert spark.sql(
        "SELECT sum(n_rows) AS r FROM pages_t_manifests"
    ).collect()[0].r == 300
    # pinned at registration: a later append is invisible until re-register
    from ecommerce_lakehouse_spark.datagen import generate_pages

    table.append(generate_pages(spark, 10, seed=55, partitions=1))
    assert spark.sql("SELECT count(*) AS n FROM pages_t").collect()[0].n == 300
    register_table_views(spark, table.path, "pages_t")
    assert spark.sql("SELECT count(*) AS n FROM pages_t").collect()[0].n == 310


def test_refs_df_lists_main_tags_branches(spark, table):
    table.create_tag("v1")
    table.create_branch("dev")
    table.set_properties({"history.expire.max-ref-age-ms": "86400000"})
    rows = {r.name: r for r in table.refs_df().collect()}
    assert set(rows) == {"main", "v1", "dev"}
    cur = table.current_snapshot().snapshot_id
    assert rows["main"].type == "branch"
    assert rows["main"].snapshot_id == cur
    assert rows["main"].max_ref_age_ms is None  # main never ages out
    assert rows["v1"].type == "tag"
    assert rows["v1"].snapshot_id == table.refs()["v1"]
    assert rows["v1"].max_ref_age_ms == 86400000
    assert rows["dev"].type == "branch"
    assert rows["dev"].snapshot_id == table.branches()["dev"]


def test_snapshots_df_matches_metadata(spark, table):
    table.append(generate_pages(spark, 30, seed=53, partitions=1))
    rows = {r.snapshot_id: r for r in table.snapshots_df().collect()}
    snaps = {s.snapshot_id: s for s in table.snapshots()}
    assert set(rows) == set(snaps)
    for sid, s in snaps.items():
        r = rows[sid]
        assert r.parent_id == s.parent_id
        assert r.operation == s.operation
        assert r.manifest_list == s.manifest_list
        assert r.summary == {k: str(v) for k, v in s.summary.items()}
    # unlike history() (lineage narration), snapshots_df is the raw log:
    # every snapshot in metadata appears, including staged/off-chain ones
    assert len(rows) == len(snaps)


def test_show_refs_and_snapshots_sql(spark, table):
    from ecommerce_lakehouse_spark.sql import IcehouseSQL

    table.create_tag("train-v1")
    sql = IcehouseSQL(spark)
    refs = {r.name for r in sql.sql(f"SHOW REFS '{table.path}'").collect()}
    assert refs == {"main", "train-v1"}
    n = sql.sql(f"SHOW SNAPSHOTS '{table.path}'").count()
    assert n == len(table.snapshots())


def test_register_table_views_refs_snapshots(spark, table):
    from ecommerce_lakehouse_spark.sources.datasource import register_table_views

    table.create_tag("v1")
    register_table_views(spark, table.path, "pages_m")
    assert spark.sql(
        "SELECT count(*) AS n FROM pages_m_refs WHERE type = 'tag'"
    ).collect()[0].n == 1
    assert spark.sql(
        "SELECT count(*) AS n FROM pages_m_snapshots"
    ).collect()[0].n >= 2
