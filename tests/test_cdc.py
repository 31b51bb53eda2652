"""Row-level CDC: ``IcehouseTable.changes(cdc=True)``.

The feed must carry every logical row change across appends, MERGE,
positional/equality deletes and overwrites — with content-neutral rewrites
(compaction) emitting nothing — and REPLAYING the feed in commit order onto
an empty table must reproduce the final scan exactly (the invariant that
makes a 100-TB table consumable incrementally by a downstream pipeline).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.table import (
    IcehouseTable,
    Predicate,
    delete_by_key,
    delete_where,
)

CDC_COLS = ["_change_type", "_commit_snapshot_id"]


def _multiset(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*sorted(cols)).collect())


@pytest.fixture()
def cdc_table(spark, tmp_path):
    df = generate_pages(spark, 300, seed=21, partitions=3)
    return IcehouseTable.create(spark, str(tmp_path / "t"), df)


def test_cdc_appends_are_inserts(spark, cdc_table):
    cdc_table.append(generate_pages(spark, 80, seed=22, partitions=2))
    feed = cdc_table.changes(0, cdc=True)
    assert set(r._change_type for r in feed.select("_change_type").distinct().collect()) == {"insert"}
    by_snap = {
        r._commit_snapshot_id: r["count"]
        for r in feed.groupBy("_commit_snapshot_id").count().collect()
    }
    assert by_snap == {1: 300, 2: 80}
    # the insert feed equals the table scan, column for column
    assert _multiset(feed.drop(*CDC_COLS)) == _multiset(cdc_table.scan())


def test_cdc_merge_emits_update_pairs_and_inserts(spark, cdc_table):
    delta = dedup_latest(
        generate_recrawl_delta(spark, base_n=300, n_new=25, n_recrawl=60, seed=21, partitions=2),
        ["url"], "warc_ts",
    )
    merge_into(cdc_table, delta, "url")
    sid = cdc_table.current_snapshot().snapshot_id
    feed = cdc_table.changes(1, cdc=True, key_cols=["url"])
    counts = {
        r._change_type: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert counts.get("insert", 0) == 25
    assert counts.get("update_before", 0) == counts.get("update_after", 0) == 60
    assert "delete" not in counts
    assert feed.select("_commit_snapshot_id").distinct().collect()[0][0] == sid
    # after-images must equal the delta rows; before-images the old rows
    after = feed.filter(F.col("_change_type") == "update_after").drop(*CDC_COLS)
    want = delta.join(
        cdc_table.scan(snapshot_id=1).select("url"), "url", "left_semi"
    )
    assert _multiset(after) == _multiset(want)


def test_cdc_positional_delete_emits_deletes(spark, cdc_table):
    urls = [r.url for r in cdc_table.scan().select("url").distinct()
            .orderBy("url").limit(7).collect()]
    delete_where(cdc_table, [Predicate("url", "in", tuple(urls))])
    feed = cdc_table.changes(1, cdc=True)
    got = _multiset(feed.filter(F.col("_change_type") == "delete").select("url"))
    want = sorted((u,) for u in urls)
    assert got == want
    assert feed.filter(F.col("_change_type") != "delete").count() == 0


def test_cdc_equality_delete_and_reinsert(spark, cdc_table):
    urls = [r.url for r in cdc_table.scan().select("url").distinct()
            .orderBy("url").limit(3).collect()]
    keep = cdc_table.scan().filter(F.col("url") == urls[0]).collect()
    delete_by_key(cdc_table, "url", urls)
    cdc_table.append(spark.createDataFrame(keep, cdc_table.schema()))
    feed = cdc_table.changes(1, cdc=True)
    counts = {
        r._change_type: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert counts["delete"] == 3
    assert counts["insert"] == 1
    # sequence semantics survive CDC: the re-inserted key is live at head
    assert cdc_table.scan().filter(F.col("url") == urls[0]).count() == 1


def test_cdc_skips_content_neutral_rewrites(spark, cdc_table):
    from ecommerce_lakehouse_spark.maintenance import compact

    cdc_table.append(generate_pages(spark, 40, seed=23, partitions=2))
    compact(cdc_table, target_file_bytes=64 * 1024 * 1024)
    feed = cdc_table.changes(1, cdc=True)
    # only the append shows; the compaction snapshot is silent
    assert feed.select("_commit_snapshot_id").distinct().count() == 1
    assert feed.count() == 40


def test_cdc_overwrite_is_full_delete_plus_insert(spark, cdc_table):
    new = generate_pages(spark, 50, seed=24, partitions=1)
    cdc_table.overwrite(new)
    feed = cdc_table.changes(1, cdc=True)
    counts = {
        r._change_type: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert counts == {"delete": 300, "insert": 50}


def test_cdc_replay_reproduces_table(spark, cdc_table):
    """Apply the feed commit-by-commit onto nothing → the final scan."""
    delta = dedup_latest(
        generate_recrawl_delta(spark, base_n=300, n_new=15, n_recrawl=40, seed=21, partitions=2),
        ["url"], "warc_ts",
    )
    merge_into(cdc_table, delta, "url")
    urls = [r.url for r in cdc_table.scan().select("url").distinct()
            .orderBy("url").limit(5).collect()]
    delete_where(cdc_table, [Predicate("url", "in", tuple(urls))])
    cdc_table.append(generate_pages(spark, 30, seed=25, partitions=1))

    feed = cdc_table.changes(0, cdc=True, key_cols=["url"]).localCheckpoint()
    sids = sorted(
        r._commit_snapshot_id
        for r in feed.select("_commit_snapshot_id").distinct().collect()
    )
    cols = cdc_table.scan().columns
    state = spark.createDataFrame([], cdc_table.schema())
    for sid in sids:
        batch = feed.filter(F.col("_commit_snapshot_id") == sid)
        dels = batch.filter(
            F.col("_change_type").isin("delete", "update_before")
        ).select(*cols)
        ins = batch.filter(
            F.col("_change_type").isin("insert", "update_after")
        ).select(*cols)
        state = state.exceptAll(dels).unionByName(ins)
    assert _multiset(state) == _multiset(cdc_table.scan())


def test_cdc_without_keys_falls_back_to_delete_insert(spark, cdc_table):
    delta = dedup_latest(
        generate_recrawl_delta(spark, base_n=300, n_new=0, n_recrawl=10, seed=21, partitions=1),
        ["url"], "warc_ts",
    )
    merge_into(cdc_table, delta, "url")
    feed = cdc_table.changes(1, cdc=True)  # no key_cols
    counts = {
        r._change_type: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert counts == {"delete": 10, "insert": 10}


def test_cdc_append_only_mode_still_raises_on_merge(spark, cdc_table):
    delta = dedup_latest(
        generate_recrawl_delta(spark, base_n=300, n_new=0, n_recrawl=5, seed=21, partitions=1),
        ["url"], "warc_ts",
    )
    merge_into(cdc_table, delta, "url")
    with pytest.raises(ValueError, match="cdc=True"):
        cdc_table.changes(1)


def test_cdc_over_branch_range(spark, cdc_table):
    """changes(to_snapshot_id="branch") resolves the branch head: a
    downstream consumer can audit a branch's pending row-level changes
    BEFORE publish — CDC as the WAP audit tool."""
    cdc_table.create_branch("b")
    base = cdc_table.branches()["b"]  # the fork point ON the branch lineage
    delta = dedup_latest(
        generate_recrawl_delta(spark, base_n=300, n_new=5, n_recrawl=15,
                               seed=21, partitions=1),
        ["url"], "warc_ts",
    )
    merge_into(cdc_table, delta, "url", branch="b")
    feed = cdc_table.changes(base, to_snapshot_id="b", cdc=True,
                             key_cols=["url"])
    counts = {
        r._change_type: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert counts.get("insert") == 5
    assert counts.get("update_before") == counts.get("update_after") == 15
    # main has no changes in that range
    assert cdc_table.changes(base, cdc=True).count() == 0


def test_cdc_across_schema_evolution_commits(spark, cdc_table):
    """A CDC range spanning rename + widen + add_column(default) commits:
    set-schema snapshots emit NO rows, the feed carries the CURRENT
    schema (renamed/widened/defaulted columns), and replaying it onto
    nothing reproduces the final scan — so an incremental consumer
    survives live schema evolution without resyncing."""
    from pyspark.sql.types import LongType

    cdc_table.add_column("fetch_status", "int")
    cdc_table.append(
        generate_pages(spark, 40, seed=26, partitions=1).withColumn(
            "fetch_status", (F.crc32("url") % 500).cast("int")
        )
    )
    cdc_table.rename_column("url", "page_url")
    cdc_table.widen_column("fetch_status", "long")
    cdc_table.add_column("crawl_tier", "string", default="cc-main")
    delta = dedup_latest(
        generate_recrawl_delta(
            spark, base_n=300, n_new=20, n_recrawl=30, seed=21, partitions=2
        ),
        ["url"], "warc_ts",
    ).withColumnRenamed("url", "page_url").withColumn(
        "fetch_status", (F.crc32("page_url") % 500).cast("int")  # narrow writer
    )
    merge_into(cdc_table, delta, "page_url")

    feed = cdc_table.changes(0, cdc=True, key_cols=["page_url"]).localCheckpoint()
    assert isinstance(feed.schema["fetch_status"].dataType, LongType)
    assert "page_url" in feed.columns and "crawl_tier" in feed.columns

    # set-schema commits contribute no rows: every feed snapshot id must be
    # a data commit (create/append/merge), never one of the 4 schema commits
    data_ops = {"append", "merge", "overwrite"}
    by_id = {s.snapshot_id: s.operation for s in cdc_table.snapshots()}
    for r in feed.select("_commit_snapshot_id").distinct().collect():
        assert by_id[r._commit_snapshot_id] in data_ops, (
            r._commit_snapshot_id, by_id[r._commit_snapshot_id]
        )

    # replay the feed commit-by-commit onto nothing → final scan
    sids = sorted(
        r._commit_snapshot_id
        for r in feed.select("_commit_snapshot_id").distinct().collect()
    )
    cols = cdc_table.scan().columns
    state = spark.createDataFrame([], cdc_table.schema())
    for sid in sids:
        batch = feed.filter(F.col("_commit_snapshot_id") == sid)
        dels = batch.filter(
            F.col("_change_type").isin("delete", "update_before")
        ).select(*cols)
        ins = batch.filter(
            F.col("_change_type").isin("insert", "update_after")
        ).select(*cols)
        state = state.exceptAll(dels).unionByName(ins)
    from collections import Counter

    bag = lambda df: Counter(  # noqa: E731 — None-safe multiset
        tuple(r) for r in df.select(*sorted(df.columns)).collect()
    )
    assert bag(state) == bag(cdc_table.scan())
