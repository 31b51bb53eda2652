"""Icehouse table format: snapshots, stats, pruning, atomic commits."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import CommitConflict, IcehouseTable, Predicate


@pytest.fixture()
def pages_table(spark, tmp_path):
    df = generate_pages(spark, 400, seed=7, partitions=4)
    tbl = IcehouseTable.create(spark, str(tmp_path / "pages"), df)
    return tbl


def test_create_and_scan_roundtrip(spark, pages_table):
    df = pages_table.scan()
    assert df.count() == 400
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}
    # schema preserved through metadata
    assert pages_table.schema() == df.schema


def test_append_creates_new_snapshot(spark, pages_table):
    before = pages_table.current_snapshot()
    delta = generate_pages(spark, 100, seed=9, partitions=2)
    snap = pages_table.append(delta)
    assert snap.parent_id == before.snapshot_id
    assert pages_table.scan().count() == 500
    # time travel: old snapshot still readable
    assert pages_table.scan(snapshot_id=before.snapshot_id).count() == 400
    assert snap.summary["added_rows"] == 100
    assert snap.summary["total_rows"] == 500


def test_txn_append_is_idempotent(spark, pages_table):
    """Delta-style (txnAppId, txnVersion) dedup: replaying the same
    (stream, batch) append is a no-op — the foreachBatch at-least-once
    contract becomes exactly-once per sink table."""
    delta = generate_pages(spark, 50, seed=11, partitions=1)
    snap = pages_table.append(delta, txn=("streamA", 7))
    assert snap is not None
    assert pages_table.scan().count() == 450
    assert pages_table.last_txn_version("streamA") == 7

    # replay of the same batch: skipped, no new snapshot
    v = pages_table.current_version()
    assert pages_table.append(delta, txn=("streamA", 7)) is None
    assert pages_table.current_version() == v
    assert pages_table.scan().count() == 450
    # an OLDER batch id is also a replay
    assert pages_table.append(delta, txn=("streamA", 6)) is None

    # the next batch commits; other app ids are independent
    assert pages_table.append(delta, txn=("streamA", 8)) is not None
    assert pages_table.append(delta, txn=("streamB", 1)) is not None
    assert pages_table.scan().count() == 550
    assert pages_table.last_txn_version("streamA") == 8
    assert pages_table.last_txn_version("streamB") == 1


def test_stats_collected_per_file(pages_table):
    files = pages_table.live_files()
    assert len(files) == 4
    for f in files:
        assert f.row_count > 0
        assert f.size_bytes > 0
        assert "url" in f.stats and f.stats["url"]["min"] is not None
        assert "warc_ts" in f.stats
        assert isinstance(f.stats["warc_ts"]["min"], int)  # epoch micros
        assert "html" not in f.stats  # binary skipped


def test_predicate_pruning_skips_files(spark, tmp_path):
    """Files with disjoint warc_ts ranges must be pruned by the planner and
    the surviving scan must return exactly the rows a full-scan filter does."""
    base = generate_pages(spark, 300, seed=3, partitions=3)
    tbl = IcehouseTable.create(spark, str(tmp_path / "t"), base)
    # appends with disjoint, later time ranges (revision bumps warc_ts +35d)
    tbl.append(generate_pages(spark, 100, seed=3, partitions=2, revision=2))
    tbl.append(generate_pages(spark, 100, seed=3, partitions=2, revision=4))
    assert len(tbl.live_files()) == 7

    cutoff = datetime.datetime(2024, 3, 1)  # after base+rev2, before rev4
    pred = [Predicate("warc_ts", ">", cutoff)]
    planned = tbl.planned_files(pred)
    assert 0 < len(planned) < 7, "pruning must actually skip files"

    got = tbl.scan(pred).count()
    expected = tbl.scan().filter(F.col("warc_ts") > F.lit(cutoff)).count()
    assert got == expected > 0


def test_string_predicate_pruning(spark, tmp_path):
    df = generate_pages(spark, 200, seed=5, partitions=2)
    # write sorted by url so per-file url ranges are narrow
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "s"), df.repartitionByRange(4, "url")
    )
    pred = [Predicate("url", ">=", "https://site040")]
    planned = tbl.planned_files(pred)
    assert len(planned) < len(tbl.live_files())
    assert tbl.scan(pred).count() == df.filter(F.col("url") >= "https://site040").count()


def test_empty_scan_returns_typed_empty_df(spark, pages_table):
    pred = [Predicate("warc_ts", ">", datetime.datetime(2999, 1, 1))]
    df = pages_table.scan(pred)
    assert df.count() == 0
    assert df.schema == pages_table.schema()


def test_replace_files_copy_on_write(spark, pages_table):
    files = pages_table.live_files()
    victim = files[0]
    remaining = pages_table.scan().filter(F.col("lang") == "xx")  # empty
    snap = pages_table.replace_files([victim.path], remaining, operation="delete")
    assert snap.operation == "delete"
    assert pages_table.scan().count() == 400 - victim.row_count
    # victim's bytes still on disk (needed by older snapshots until expiry)
    assert os.path.exists(os.path.join(pages_table.path, victim.path))


def test_commit_conflict_on_concurrent_replace(spark, pages_table):
    """Two writers removing the same file: second must abort (snapshot
    isolation), an appender must NOT abort (operations compose)."""
    victim = pages_table.live_files()[0]
    empty = pages_table.scan().limit(0)
    pages_table.replace_files([victim.path], empty, operation="replace")
    with pytest.raises(CommitConflict):
        pages_table.replace_files([victim.path], empty, operation="replace")
    # append still fine after the replace
    pages_table.append(generate_pages(spark, 10, seed=1, partitions=1))


def test_commit_cas_retry(spark, pages_table, tmp_path):
    """Losing the version-file race retries against the new base."""
    v = pages_table.current_version()
    # squat the next version file to force one failed CAS
    squat = pages_table._version_file(v + 1)
    md = pages_table.load_metadata()
    with open(squat, "w") as f:
        json.dump(md, f)
    snap = pages_table.append(generate_pages(spark, 10, seed=2, partitions=1))
    assert pages_table.current_version() == v + 2
    assert snap.summary["added_rows"] == 10


def test_datagen_deterministic(spark):
    a = generate_pages(spark, 50, seed=11, partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 50, seed=11, partitions=5).orderBy("url").collect()
    assert a == b, "generation must not depend on partitioning"


def test_hot_prefix_skew_exists(spark):
    df = generate_pages(spark, 2000, seed=42, partitions=4)
    top = (
        df.groupBy(F.regexp_extract("url", r"https://(site\d+)", 1).alias("d"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top["count"] > 2000 * 0.15, "domain skew is required for salting tests"


def test_changes_incremental_append_scan(spark, tmp_path):
    """changes(from, to): appended rows only; content-neutral rewrites are
    skipped; row-set-changing snapshots raise; deletes at the read point
    mask emitted rows."""
    import pytest as _pytest

    from ecommerce_lakehouse_spark.maintenance import compact
    from ecommerce_lakehouse_spark.operators.merge import merge_into
    from ecommerce_lakehouse_spark.table import Predicate, delete_where

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 200, seed=31, partitions=2),
    )
    tbl.append(generate_pages(spark, 50, seed=32, partitions=1))   # snap 2
    compact(tbl, target_file_bytes=1 << 30)                        # snap 3
    tbl.append(generate_pages(spark, 30, seed=33, partitions=1))   # snap 4

    got = {r.url for r in tbl.changes(1).select("url").collect()}
    want = {r.url for r in generate_pages(spark, 50, seed=32, partitions=1)
            .unionByName(generate_pages(spark, 30, seed=33, partitions=1))
            .select("url").collect()}
    assert got == want
    assert tbl.changes(3).count() == 30
    assert tbl.changes(1, 2).count() == 50
    assert tbl.changes(4).count() == 0

    # a delete at the read point masks emitted rows
    victim = sorted(got)[0]
    delete_where(tbl, [Predicate("url", "=", victim)])             # snap 5
    with _pytest.raises(ValueError, match="not append-only"):
        tbl.changes(1)  # delete in range -> inexpressible
    assert tbl.changes(1, 4).count() == 80, "bounded range still works"

    # merge in range raises too
    src = tbl.scan().orderBy("url").limit(1)
    merge_into(tbl, src, "url")                                    # snap 6
    with _pytest.raises(ValueError, match="not append-only"):
        tbl.changes(4)


def test_row_count_from_metadata_only(spark, tmp_path):
    from ecommerce_lakehouse_spark.maintenance import rewrite_delete_vectors
    from ecommerce_lakehouse_spark.table import Predicate, delete_by_key, delete_where

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 300, seed=41, partitions=3),
    )
    assert tbl.row_count() == 300
    urls = [r.url for r in tbl.scan().select("url").orderBy("url").limit(7).collect()]
    delete_where(tbl, [Predicate("url", "in", tuple(urls[:5]))])
    assert tbl.row_count() == 295  # metadata-only: manifests minus DV rows
    # live equality deletes force the counting-scan fallback
    delete_by_key(tbl, "url", urls[5:])
    assert tbl.row_count() == 293
    # conversion restores the metadata-only path
    rewrite_delete_vectors(tbl, min_dv_files=1)
    assert tbl.eq_deletes() == []
    assert tbl.row_count() == 293 == tbl.scan().count()
    # time travel counts
    assert tbl.row_count(snapshot_id=1) == 300


def test_snapshot_tags_pin_scans_and_survive_expiry(spark, tmp_path):
    """create_tag pins a named snapshot: scans address it by name, expiry
    retains it (and its files), drop_tag releases it; changes() treats the
    ref commit as content-neutral."""
    from ecommerce_lakehouse_spark.maintenance import compact, expire_snapshots

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 200, seed=55, partitions=2),
    )
    tbl.create_tag("train-v1")                                  # pins snap 1
    tbl.append(generate_pages(spark, 40, seed=56, partitions=1))
    compact(tbl, target_file_bytes=1 << 30)
    assert tbl.refs() == {"train-v1": 1}
    assert tbl.scan(snapshot_id="train-v1").count() == 200
    assert tbl.scan().count() == 240

    # the ref commit is neutral for incremental consumers
    assert tbl.changes(1).count() == 40

    expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    # tagged snapshot AND its files survived the sweep
    assert tbl.scan(snapshot_id="train-v1").count() == 200
    assert tbl.scan().count() == 240

    tbl.drop_tag("train-v1")
    assert tbl.refs() == {}
    expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown tag"):
        tbl.scan(snapshot_id="train-v1")
    assert tbl.scan().count() == 240

    with _pytest.raises(ValueError, match="invalid tag name"):
        tbl.create_tag("bad.name")


def test_history_dataframe(spark, pages_table):
    pages_table.append(generate_pages(spark, 10, seed=3, partitions=1))
    h = pages_table.history().orderBy("snapshot_id").collect()
    assert [r.operation for r in h][:2] == ["append", "append"]
    assert h[0].parent_id is None and h[1].parent_id == h[0].snapshot_id
    assert h[-1].total_rows == pages_table.scan().count()


def test_bloom_cols_property_embeds_parquet_bloom_filters(spark, tmp_path):
    """bloom.cols writes row-group bloom filters through the JVM parquet
    writer (adaptive sizing): a small bounded size footprint on identical
    content, results unchanged."""
    df = generate_pages(spark, 2000, seed=71, partitions=1)
    plain = IcehouseTable.create(spark, str(tmp_path / "plain"), df)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "bloom"), df,
        properties={"bloom.cols": "url"},
    )
    plain_bytes = sum(f.size_bytes for f in plain.live_files())
    bloom_bytes = sum(f.size_bytes for f in tbl.live_files())
    # adaptive bloom adds a small, bounded footprint (measured ~7% here;
    # neither pyarrow nor duckdb expose the footer bloom offset to assert
    # on directly). Identical content otherwise, so the delta IS the bloom.
    assert plain_bytes * 1.02 < bloom_bytes < plain_bytes * 1.25, (
        plain_bytes, bloom_bytes,
    )
    assert tbl.scan().count() == 2000
    one = tbl.scan().select("url").orderBy("url").first().url
    assert tbl.scan([Predicate("url", "=", one)]).count() == 1


def test_write_audit_publish(spark, pages_table):
    """publish=False stages an append: readers keep the old current, the
    staged snapshot audits by id, publish_snapshot fast-forwards."""
    base_count = pages_table.scan().count()
    staged = pages_table.append(
        generate_pages(spark, 20, seed=61, partitions=1), publish=False
    )
    assert pages_table.scan().count() == base_count, "readers must not see staged"
    assert pages_table.current_snapshot().snapshot_id == staged.parent_id
    # the audit: scan the staged snapshot directly
    assert pages_table.scan(snapshot_id=staged.snapshot_id).count() == base_count + 20

    pages_table.publish_snapshot(staged.snapshot_id)
    assert pages_table.scan().count() == base_count + 20
    # idempotent re-publish
    pages_table.publish_snapshot(staged.snapshot_id)
    assert pages_table.current_snapshot().snapshot_id == staged.snapshot_id


def test_wap_cherry_pick_after_current_moved(spark, pages_table):
    """When commits land after staging, fast-forward publish conflicts and
    cherry_pick re-applies the staged files (no data rewrite) on the new
    current, with added_by re-stamped for eq-delete sequence semantics."""
    from ecommerce_lakehouse_spark.table.format import CommitConflict

    base_count = pages_table.scan().count()
    staged = pages_table.append(
        generate_pages(spark, 15, seed=62, partitions=1), publish=False
    )
    pages_table.append(generate_pages(spark, 5, seed=63, partitions=1))

    with pytest.raises(CommitConflict, match="cherry_pick"):
        pages_table.publish_snapshot(staged.snapshot_id)
    picked = pages_table.cherry_pick(staged.snapshot_id)
    assert pages_table.scan().count() == base_count + 20
    live = {f.path: f for f in pages_table.live_files()}
    staged_files = [
        f for e in pages_table.manifest_entries_of(staged)
        for f in pages_table._read_manifest(e["path"])
        if f.added_by == staged.snapshot_id
    ]
    for f in staged_files:  # same physical files, new lineage stamp
        assert live[f.path].added_by == picked.snapshot_id

    # changes() walks the published chain only: the staged side snapshot
    # never appears, the cherry-picked rows do
    assert pages_table.changes(staged.parent_id).count() == 20

    # double-apply is refused (would duplicate rows)
    with pytest.raises(ValueError, match="already applied"):
        pages_table.cherry_pick(staged.snapshot_id)
    # and a fast-forward publish of the consumed staged snapshot conflicts
    from ecommerce_lakehouse_spark.table.format import CommitConflict as _CC
    with pytest.raises(_CC):
        pages_table.publish_snapshot(staged.snapshot_id)


def test_expire_keeps_pending_staged_snapshots(spark, pages_table):
    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    staged = pages_table.append(
        generate_pages(spark, 10, seed=64, partitions=1), publish=False
    )
    pages_table.append(generate_pages(spark, 5, seed=65, partitions=1))
    expire_snapshots(pages_table, keep_last=1, orphan_grace_ms=0)
    # the staged snapshot survived (pending publish decision) and its
    # files are intact; an age cutoff in the future sweeps it
    n = pages_table.scan(snapshot_id=staged.snapshot_id).count()
    assert n == pages_table.scan().count() - 5 + 10
    expire_snapshots(pages_table, keep_last=1, orphan_grace_ms=0,
                     older_than_ms=staged.timestamp_ms + 10_000)
    with pytest.raises(ValueError, match="unknown snapshot"):
        pages_table.scan(snapshot_id=staged.snapshot_id)


def test_cherry_pick_twice_refused_even_after_compaction(spark, pages_table):
    """ADVICE r04: the live-files guard alone is defeated once compaction
    rewrites the first applied copy out of live_files — the parent-chain
    summary scan must still refuse the second apply."""
    from ecommerce_lakehouse_spark.maintenance import compact

    staged = pages_table.append(
        generate_pages(spark, 15, seed=71, partitions=1), publish=False
    )
    pages_table.append(generate_pages(spark, 5, seed=72, partitions=1))
    pages_table.cherry_pick(staged.snapshot_id)
    n = pages_table.scan().count()
    compact(pages_table, target_file_bytes=64 * 1024 * 1024)
    assert pages_table.scan().count() == n
    with pytest.raises(ValueError, match="already cherry-picked"):
        pages_table.cherry_pick(staged.snapshot_id)
    assert pages_table.scan().count() == n


def test_expire_sweeps_consumed_staged_snapshots(spark, pages_table):
    """ADVICE r04: a staged original already consumed by cherry_pick is
    permanently off-chain — default expiry (no age cutoff) must reclaim
    it instead of pinning it forever as 'pending publish'."""
    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    staged = pages_table.append(
        generate_pages(spark, 12, seed=73, partitions=1), publish=False
    )
    pages_table.append(generate_pages(spark, 5, seed=74, partitions=1))
    pages_table.cherry_pick(staged.snapshot_id)
    n = pages_table.scan().count()
    expire_snapshots(pages_table, keep_last=1, orphan_grace_ms=0)
    # consumed staged snapshot is gone; the cherry-picked data survives
    with pytest.raises(ValueError, match="unknown snapshot"):
        pages_table.scan(snapshot_id=staged.snapshot_id)
    assert pages_table.scan().count() == n


def test_add_files_imports_without_rewrite(spark, tmp_path):
    """add_files registers existing parquet as one append: same inode
    (hardlink, zero bytes moved), footer stats present so pruning works,
    and the rows are scan-identical to reading the source directly."""
    import os

    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.table import IcehouseTable

    src = str(tmp_path / "plain_parquet")
    generate_pages(spark, 400, seed=11, partitions=3).write.parquet(src)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 50, seed=12, partitions=1),
    )
    snap = tbl.add_files(src)
    assert snap.summary["imported_files"] == 3
    assert snap.summary["imported_rows"] == 400
    assert tbl.row_count() == 450
    # zero-copy: the imported files are hardlinks of the source files
    imported = [
        f for f in tbl.live_files() if f.added_by == snap.snapshot_id
    ]
    src_inodes = {
        os.stat(os.path.join(src, n)).st_ino
        for n in os.listdir(src) if n.endswith(".parquet")
    }
    for f in imported:
        assert os.stat(os.path.join(tbl.path, f.path)).st_ino in src_inodes
        # footer stats landed (pruning works immediately)
        assert f.stats["warc_ts"]["min"] is not None
    # value identity: the table is now the multiset union of the base
    # rows and the imported source (plain append semantics)
    want = sorted(
        tuple(r) for r in spark.read.parquet(src)
        .unionByName(tbl.scan(snapshot_id=tbl.snapshots()[0].snapshot_id))
        .select("url", "warc_ts", "text").collect()
    )
    got = sorted(
        tuple(r)
        for r in tbl.scan().select("url", "warc_ts", "text").collect()
    )
    assert got == want


def test_add_files_schema_gate_and_call_procedure(spark, tmp_path):
    from ecommerce_lakehouse_spark.datagen import generate_pages
    from ecommerce_lakehouse_spark.sql import IcehouseSQL
    from ecommerce_lakehouse_spark.table import IcehouseTable

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 50, seed=12, partitions=1),
    )
    # schema mismatch refuses (extra/missing columns)
    bad = str(tmp_path / "bad")
    generate_pages(spark, 10, seed=13, partitions=1).drop("html").write.parquet(bad)
    with pytest.raises(ValueError, match="does not match table schema"):
        tbl.add_files(bad)
    # empty source is a no-op
    empty = tmp_path / "empty"
    empty.mkdir()
    assert tbl.add_files(str(empty)) is None
    # CALL surface, copy mode
    src = str(tmp_path / "src")
    generate_pages(spark, 60, seed=14, partitions=2).write.parquet(src)
    isql = IcehouseSQL(spark)
    res = isql.sql(
        f"CALL add_files('{tbl.path}', '{src}', mode => 'copy')"
    )
    assert res.detail.summary["imported_rows"] == 60
    assert res.detail.summary["import_mode"] == "copy"
    assert tbl.row_count() == 110
