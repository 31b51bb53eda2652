"""CDC apply / mirror (streaming/cdc_apply.py): a downstream replica
maintained purely from the change feed must converge to the source's
scan after any mix of appends, merges and deletes — batch catch-up,
streaming foreachBatch, and replayed (at-least-once) slices alike.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.streaming.cdc_apply import (
    apply_cdc,
    collapse_cdc,
    mirror_stream,
    mirror_table,
)
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate
from ecommerce_lakehouse_spark.table.deletes import delete_where


def rows_of(df):
    return sorted((r.url, str(r.warc_ts), r.text, r.lang) for r in df.collect())


def _make_source(spark, path, n=200, seed=51):
    tbl = IcehouseTable.create(
        spark, path, generate_pages(spark, n, seed=seed, partitions=2)
    )
    merge_into(
        tbl,
        dedup_latest(
            generate_recrawl_delta(spark, n, n // 10, n // 5, seed=seed),
            ["url"], "warc_ts",
        ),
        "url",
    )
    some_urls = tuple(
        r.url for r in tbl.scan().select("url").limit(5).collect()
    )
    delete_where(tbl, [Predicate("url", "in", some_urls)])
    return tbl


def test_batch_mirror_matches_source(spark, tmp_path):
    src = _make_source(spark, str(tmp_path / "src"))
    stats = mirror_table(
        spark, src.path, str(tmp_path / "dst"), key_cols="url"
    )
    assert stats.get("created")
    dst = IcehouseTable(spark, str(tmp_path / "dst"))
    assert rows_of(dst.scan()) == rows_of(src.scan())


def test_incremental_mirror_catchup(spark, tmp_path):
    src = _make_source(spark, str(tmp_path / "src"))
    dst_path = str(tmp_path / "dst")
    s1 = mirror_table(spark, src.path, dst_path, key_cols="url")
    # more upstream churn AFTER the first sync
    merge_into(
        src,
        dedup_latest(
            generate_recrawl_delta(spark, 200, 30, 40, seed=77),
            ["url"], "warc_ts",
        ),
        "url",
    )
    url = src.scan().select("url").first().url
    delete_where(src, [Predicate("url", "=", url)])
    s2 = mirror_table(
        spark, src.path, dst_path, key_cols="url",
        from_snapshot_id=s1["applied_through"],
    )
    dst = IcehouseTable(spark, dst_path)
    assert rows_of(dst.scan()) == rows_of(src.scan())
    assert s2["deletes"] >= 1


def test_collapse_takes_latest_image_per_key(spark, tmp_path):
    src = _make_source(spark, str(tmp_path / "src"))
    feed = src.changes(0, cdc=True, key_cols=["url"])
    upserts, delete_keys = collapse_cdc(feed, ["url"])
    # key-unique outputs, disjoint sets
    assert upserts.groupBy("url").count().filter("count > 1").count() == 0
    assert (
        upserts.join(delete_keys, "url", "inner").count() == 0
    )
    # upsert images equal the source's live rows for those keys
    live = src.scan()
    assert rows_of(upserts) == rows_of(live)


def test_apply_replay_converges(spark, tmp_path):
    """At-least-once delivery: applying the SAME slice twice must leave
    the identical table state (foreachBatch retry semantics)."""
    src = _make_source(spark, str(tmp_path / "src"))
    dst = IcehouseTable.create(
        spark, str(tmp_path / "dst"),
        generate_pages(spark, 200, seed=51, partitions=2),
    )
    feed = src.changes(0, cdc=True, key_cols=["url"]).localCheckpoint()
    apply_cdc(dst, feed, "url")
    first = rows_of(dst.scan())
    assert first == rows_of(src.scan())
    apply_cdc(dst, feed, "url")  # replay
    assert rows_of(dst.scan()) == first


def test_mirror_stream_available_now_and_resume(spark, tmp_path):
    src = _make_source(spark, str(tmp_path / "src"), n=150, seed=61)
    dst_path = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    mirror_stream(spark, src.path, dst_path, ckpt, key_cols="url")
    dst = IcehouseTable(spark, dst_path)
    assert rows_of(dst.scan()) == rows_of(src.scan())
    n_commits_first = len(dst.snapshots())
    # upstream churn, then resume from the SAME checkpoint: only the new
    # snapshots flow, and the replica converges again
    merge_into(
        src,
        dedup_latest(
            generate_recrawl_delta(spark, 150, 20, 30, seed=62),
            ["url"], "warc_ts",
        ),
        "url",
    )
    url = src.scan().select("url").first().url
    delete_where(src, [Predicate("url", "=", url)])
    mirror_stream(spark, src.path, dst_path, ckpt, key_cols="url")
    dst = IcehouseTable(spark, dst_path)
    assert rows_of(dst.scan()) == rows_of(src.scan())
    assert len(dst.snapshots()) > n_commits_first


def test_changes_from_creation_raises_after_history_expiry(spark, tmp_path):
    """Silent-loss guard (caught live by the packaged mirror drive): a
    from-creation feed over a table whose early history was EXPIRED must
    raise, never return the partial range as if it were complete."""
    import pytest

    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    src = _make_source(spark, str(tmp_path / "src"))
    expire_snapshots(src, keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        src.changes(0, cdc=True, key_cols=["url"]).count()


def test_mirror_bootstraps_full_scan_after_expiry(spark, tmp_path):
    """A FRESH mirror of an expired-history source falls back to a
    full-scan bootstrap (initial-snapshot semantics) and then catches up
    incrementally from applied_through."""
    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    src = _make_source(spark, str(tmp_path / "src"))
    expire_snapshots(src, keep_last=1)
    dst_path = str(tmp_path / "dst")
    s1 = mirror_table(spark, src.path, dst_path, key_cols="url")
    assert s1.get("bootstrap_full_scan")
    dst = IcehouseTable(spark, dst_path)
    assert rows_of(dst.scan()) == rows_of(src.scan())
    # incremental catch-up after further churn uses the normal feed
    merge_into(
        src,
        dedup_latest(
            generate_recrawl_delta(spark, 200, 15, 25, seed=88),
            ["url"], "warc_ts",
        ),
        "url",
    )
    s2 = mirror_table(
        spark, src.path, dst_path, key_cols="url",
        from_snapshot_id=s1["applied_through"],
    )
    assert not s2.get("bootstrap_full_scan")
    dst = IcehouseTable(spark, dst_path)
    assert rows_of(dst.scan()) == rows_of(src.scan())
    # an EXISTING mirror that lost feed coverage must surface the gap
    expire_snapshots(src, keep_last=1)
    import pytest

    with pytest.raises(ValueError, match="expired"):
        mirror_table(spark, src.path, dst_path, key_cols="url",
                     from_snapshot_id=0)


def test_mirror_excludes_content_neutral_maintenance(spark, tmp_path):
    """Compaction upstream must not disturb the replica: content-neutral
    snapshots emit no CDC rows, so catch-up after OPTIMIZE is a no-op."""
    from ecommerce_lakehouse_spark.maintenance import compact

    src = _make_source(spark, str(tmp_path / "src"))
    dst_path = str(tmp_path / "dst")
    s1 = mirror_table(spark, src.path, dst_path, key_cols="url")
    compact(src, target_file_bytes=32 * 1024 * 1024)
    s2 = mirror_table(
        spark, src.path, dst_path, key_cols="url",
        from_snapshot_id=s1["applied_through"],
    )
    assert s2["upserts"] == 0 and s2["deletes"] == 0
    dst = IcehouseTable(spark, dst_path)
    assert rows_of(dst.scan()) == rows_of(src.scan())
