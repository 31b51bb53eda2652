"""Maintenance suite: compaction, Z-order/Hilbert clustering, snapshot
expiry, manifest rewrite, resumable ledger. North-rule invariants: identical
row sets before/after every maintenance op; pruning improves; resume works."""

from __future__ import annotations

import datetime
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.functions.zorder_kernel import (
    hilbert_index,
    hilbert_index_slow,
    morton_interleave,
)
from ecommerce_lakehouse_spark.maintenance import (
    JobLedger,
    compact,
    expire_snapshots,
    plan_compaction,
    rewrite_manifests,
    zorder_by,
)
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate


def table_rows(tbl, snapshot_id=None):
    return sorted(
        (r.url, str(r.warc_ts), r.text, r.lang)
        for r in tbl.scan(snapshot_id=snapshot_id).collect()
    )


@pytest.fixture()
def fragmented_table(spark, tmp_path):
    """A table with many small files: 5 appends x 4 partitions."""
    tbl = None
    for i in range(5):
        df = generate_pages(spark, 120, seed=31 + i, partitions=4, revision=i)
        if tbl is None:
            tbl = IcehouseTable.create(spark, str(tmp_path / "frag"), df)
        else:
            tbl.append(df)
    return tbl


# ---------------------------------------------------------------- kernels


def test_morton_kernel_reference_values():
    x = np.array([0, 1, 0, 1, 0b101], dtype=np.int64)
    y = np.array([0, 0, 1, 1, 0b011], dtype=np.int64)
    got = morton_interleave(x, y)
    # interleave(x=101, y=011) = y2x2 y1x1 y0x0 = 01 10 11 = 0b011011 = 27
    assert list(got) == [0, 1, 2, 3, 0b011011]


def test_morton_locality():
    """Adjacent points map to nearby codes more often than random pairs."""
    x = np.arange(1000, dtype=np.int64)
    z_row = morton_interleave(x, np.zeros_like(x))
    assert (np.diff(z_row.astype(np.int64)) > 0).all(), "monotone along an axis"


def test_morton_jvm_expression_parity(spark):
    """The r6 JVM-expression Morton (zorder_kernel.morton_col — the kernel
    the production 2-D Z-order rewrite now uses) must agree bit-for-bit
    with the vectorized pandas kernel, including null handling and values
    at/over the 31-bit mask."""
    from ecommerce_lakehouse_spark.functions.zorder_kernel import (
        morton_col,
        morton_udf,
    )

    rng = np.random.RandomState(11)
    xs = rng.randint(0, 1 << 31, size=2000).tolist() + [
        0, 1, (1 << 31) - 1, 1 << 31, (1 << 32) + 5, None,
    ]
    ys = rng.randint(0, 1 << 31, size=2000).tolist() + [
        (1 << 31) - 1, None, 7, 123456789, 0, 42,
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y in zip(xs, ys)], "x long, y long"
    )
    got = df.select(
        morton_col(F.col("x"), F.col("y")).alias("jvm"),
        morton_udf(F.col("x"), F.col("y")).alias("py"),
    ).collect()
    assert all(r.jvm == r.py for r in got)
    # and against the numpy kernel directly for the non-null rows
    nn = [(x, y) for x, y in zip(xs, ys) if x is not None and y is not None]
    ref = morton_interleave(
        np.array([x for x, _ in nn], dtype=np.int64),
        np.array([y for _, y in nn], dtype=np.int64),
    )
    jvm_nn = [
        r.jvm for r, (x, y) in zip(got, zip(xs, ys))
        if x is not None and y is not None
    ]
    assert jvm_nn == [int(v) for v in ref.astype(np.int64)]


def test_hilbert_matches_slow_reference():
    rng = np.random.RandomState(7)
    for bits in (2, 4, 8, 16):
        n = 200
        x = rng.randint(0, 1 << bits, n).astype(np.int64)
        y = rng.randint(0, 1 << bits, n).astype(np.int64)
        fast = hilbert_index(x, y, bits)
        slow = np.array([hilbert_index_slow(int(a), int(b), bits) for a, b in zip(x, y)])
        assert (fast.astype(np.int64) == slow).all()


def test_hilbert_is_bijective_small_grid():
    bits = 4
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    d = hilbert_index(xs.ravel().astype(np.int64), ys.ravel().astype(np.int64), bits)
    assert sorted(d.tolist()) == list(range(256))


# ------------------------------------------------------------- compaction


def test_compaction_packs_small_files(spark, fragmented_table):
    tbl = fragmented_table
    before_rows = table_rows(tbl)
    n_before = len(tbl.live_files())
    assert n_before == 20
    snap = compact(tbl, target_file_bytes=64 * 1024 * 1024)
    assert snap is not None and snap.operation == "compact"
    n_after = len(tbl.live_files())
    assert n_after < n_before
    assert table_rows(tbl) == before_rows, "compaction must not change data"
    # second run: nothing (or strictly less) left to do
    again = compact(tbl, target_file_bytes=64 * 1024 * 1024)
    assert again is None or len(tbl.live_files()) <= n_after


def test_compaction_plan_respects_target(spark, fragmented_table):
    bins = plan_compaction(fragmented_table, target_file_bytes=200_000)
    assert bins, "fragmented table must produce bins"
    for b in bins:
        assert len(b.files) >= 2
        assert b.bytes <= 200_000 or len(b.files) == 1


def test_compaction_ledger_resume(spark, fragmented_table, monkeypatch):
    """Crash after some bins: re-run adopts completed bins from the ledger
    instead of rewriting them (resumable mid-rewrite, north_rule)."""
    tbl = fragmented_table
    import sys

    import ecommerce_lakehouse_spark.maintenance.compact  # noqa: F401

    C = sys.modules["ecommerce_lakehouse_spark.maintenance.compact"]
    calls = {"n": 0}
    real = C._rewrite_bin

    def exploding(table, b, target, cols, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated crash")
        return real(table, b, target, cols, *a, **kw)

    monkeypatch.setattr(C, "_rewrite_bin", exploding)
    with pytest.raises(RuntimeError):
        compact(tbl, target_file_bytes=150_000, max_concurrency=1)
    done_units = calls["n"] - 1

    monkeypatch.setattr(C, "_rewrite_bin", real)
    before_rows = table_rows(tbl)
    rewrites_before_resume = calls["n"]
    snap = compact(tbl, target_file_bytes=150_000, max_concurrency=1)
    assert snap is not None
    assert table_rows(tbl) == before_rows
    # ledger adopted the completed bins: they were not rewritten again
    ledger_dir = os.path.join(tbl.path, "ledger")
    jobs = os.listdir(ledger_dir)
    assert any(j.startswith("compact-") for j in jobs)
    assert done_units >= 1


# ------------------------------------------------------------- clustering


@pytest.mark.parametrize("curve", ["morton", "hilbert"])
def test_cluster_preserves_rows_and_improves_pruning(spark, tmp_path, curve):
    df = generate_pages(spark, 1500, seed=13, partitions=6)
    tbl = IcehouseTable.create(spark, str(tmp_path / f"z_{curve}"), df)
    before_rows = table_rows(tbl)
    n_files_before = len(tbl.live_files())

    # small target → several output files so pruning is observable
    total = sum(f.size_bytes for f in tbl.live_files())
    snap = zorder_by(tbl, curve=curve, target_file_bytes=max(1, total // 8))
    assert snap.operation == f"cluster-{curve}"
    assert table_rows(tbl) == before_rows, "clustering must not change data"

    files = tbl.live_files()
    assert len(files) >= 4
    # a timestamp slice must now skip files (before clustering, every append
    # had full ts coverage → no pruning possible within one revision)
    mid = datetime.datetime(2023, 11, 29)
    planned = tbl.planned_files([Predicate("warc_ts", ">", mid)])
    assert len(planned) < len(files), f"{curve}: ts pruning should skip files"
    # url-range pruning also works post-cluster
    planned_url = tbl.planned_files([Predicate("url", ">=", "https://site040")])
    assert len(planned_url) <= len(files)
    got = tbl.scan([Predicate("warc_ts", ">", mid)]).count()
    want = tbl.scan().filter(F.col("warc_ts") > F.lit(mid)).count()
    assert got == want > 0


def test_zorder_plan_has_no_row_python_except_kernel(spark, tmp_path):
    """The clustering plan's only Python is the ArrowEvalPython kernel —
    never BatchEvalPython (per-row UDF), per SURVEY §2.10."""
    df = generate_pages(spark, 100, seed=1, partitions=2)
    tbl = IcehouseTable.create(spark, str(tmp_path / "zp"), df)
    from ecommerce_lakehouse_spark.functions.zorder_kernel import (
        coord31,
        morton_udf,
        url_hash31,
    )

    coded = tbl.scan().withColumn(
        "__z",
        morton_udf(
            url_hash31(F.col("url")),
            coord31(F.unix_micros(F.col("warc_ts").cast("timestamp"))),
        ),
    )
    plan = coded._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


# ----------------------------------------------------------------- expiry


def test_expire_snapshots_sweeps_unreferenced(spark, fragmented_table):
    tbl = fragmented_table
    compact(tbl, target_file_bytes=64 * 1024 * 1024)
    all_data = set(os.listdir(os.path.join(tbl.path, "data")))
    live = {os.path.basename(f.path) for f in tbl.live_files()}
    assert all_data - live, "pre-expiry: old snapshot files still on disk"

    rows_before = table_rows(tbl)
    res = expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    assert res.expired_snapshots
    assert res.deleted_data_files > 0 and res.freed_bytes > 0
    assert table_rows(tbl) == rows_before, "current snapshot untouched"
    remaining = set(os.listdir(os.path.join(tbl.path, "data")))
    assert remaining == live, "exactly the live files remain"
    assert len(tbl.snapshots()) == 1


def test_expire_refuses_current(spark, fragmented_table):
    with pytest.raises(ValueError):
        expire_snapshots(fragmented_table, keep_last=0)


def test_orphan_sweep_protects_unfinished_ledger_and_fresh_files(spark, tmp_path):
    """ADVICE r01: staged outputs of an UNFINISHED ledger job (a rewrite in
    progress — a later resume will commit them) must survive the orphan
    sweep, as must any file younger than the clamped grace period; a true
    abandoned orphan older than the grace is swept."""
    import json as _json
    import time as _time

    df = generate_pages(spark, 100, seed=61, partitions=2)
    tbl = IcehouseTable.create(spark, str(tmp_path / "orph"), df)
    tbl.append(generate_pages(spark, 50, seed=62, partitions=1))

    old = _time.time() - 86400  # 1 day old: past any grace
    def make_data_file(name, mtime=None):
        p = os.path.join(tbl.data_dir, name)
        with open(p, "wb") as f:
            f.write(b"x" * 64)
        if mtime is not None:
            os.utime(p, (mtime, mtime))
        return p

    orphan_old = make_data_file("abandoned-stage.parquet", old)
    orphan_fresh = make_data_file("fresh-stage.parquet")  # now → inside grace
    staged = make_data_file("ledger-staged.parquet", old)

    # unfinished ledger job (no _SUCCESS) claiming the staged file
    jdir = os.path.join(tbl.ledger_dir, "compact-snap2-test")
    os.makedirs(jdir)
    with open(os.path.join(jdir, "unit-0.json"), "w") as f:
        _json.dump({"unit_id": "0", "inputs": [],
                    "outputs": [{"path": "data/ledger-staged.parquet",
                                 "row_count": 1, "size_bytes": 64}]}, f)

    expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)  # 0 → clamped
    assert not os.path.exists(orphan_old), "old orphan must be swept"
    assert os.path.exists(orphan_fresh), "fresh file inside grace survives"
    assert os.path.exists(staged), "unfinished-ledger output must survive"
    assert tbl.scan().count() == 150


def test_expire_shared_files_survive(spark, tmp_path):
    """Files shared between retained and expired snapshots must survive
    (reference counting, not naive per-snapshot delete)."""
    df = generate_pages(spark, 100, seed=2, partitions=2)
    tbl = IcehouseTable.create(spark, str(tmp_path / "sh"), df)
    tbl.append(generate_pages(spark, 50, seed=3, partitions=1))  # snap 2
    tbl.append(generate_pages(spark, 50, seed=4, partitions=1))  # snap 3
    # snap 1&2's files are all still live in snap 3
    res = expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    assert res.deleted_data_files == 0
    assert tbl.scan().count() == 200


# ------------------------------------------------------- manifest rewrite


def test_rewrite_manifests_consolidates(spark, fragmented_table):
    tbl = fragmented_table
    snap = tbl.current_snapshot()
    n_manifests = len(tbl.manifests_of(snap))
    assert n_manifests == 5, "one manifest per append"
    rows_before = table_rows(tbl)
    new = rewrite_manifests(tbl, target_entries=1000, sort_by_stat="url")
    assert new.operation == "rewrite-manifests"
    assert len(tbl.manifests_of(new)) == 1
    assert table_rows(tbl) == rows_before
    assert new.summary["manifests_before"] == 5


def test_prefix_zorder_prunes_both_dimensions(spark, tmp_path):
    """Value (prefix) Z-order: url-RANGE and ts predicates both skip files
    post-cluster, and pruned scans equal full-scan filters exactly."""
    df = generate_pages(spark, 2000, seed=17, partitions=5)
    tbl = IcehouseTable.create(spark, str(tmp_path / "zp"), df)
    total = sum(f.size_bytes for f in tbl.live_files())
    zorder_by(tbl, curve="morton", url_coord="prefix",
              target_file_bytes=max(1, total // 10))
    n = len(tbl.live_files())
    assert n >= 8
    ts_pred = [Predicate("warc_ts", ">", datetime.datetime(2023, 12, 5))]
    url_pred = [Predicate("url", ">=", "https://site030")]
    assert len(tbl.planned_files(ts_pred)) < n
    assert len(tbl.planned_files(url_pred)) < n, "url ranges must prune (value z-order)"
    assert tbl.scan(url_pred).count() == tbl.scan().filter(
        F.col("url") >= "https://site030"
    ).count()


# ------------------------------------------------- incremental clustering


def test_incremental_cluster_rewrites_only_new_files(spark, tmp_path):
    """Daily OPTIMIZE...ZORDER at 10^12 docs can't rewrite the whole table:
    scope="incremental" clusters only files added after the last cluster-*
    snapshot, leaving previously clustered files byte-identical on disk,
    while full and pruned scans stay exact (north-rule invariant)."""
    df = generate_pages(spark, 1200, seed=41, partitions=5)
    tbl = IcehouseTable.create(spark, str(tmp_path / "inc"), df)
    total = sum(f.size_bytes for f in tbl.live_files())
    snap1 = zorder_by(tbl, curve="morton", target_file_bytes=max(1, total // 6))
    clustered_paths = {f.path for f in tbl.live_files()}

    # new day's append — later revision shifts warc_ts
    tbl.append(generate_pages(spark, 400, seed=42, partitions=3, revision=6))
    before_rows = table_rows(tbl)
    new_paths = {f.path for f in tbl.live_files()} - clustered_paths
    assert len(new_paths) == 3

    snap2 = zorder_by(
        tbl, curve="morton", target_file_bytes=max(1, total // 6),
        scope="incremental",
    )
    assert snap2 is not None and snap2.operation == "cluster-morton"
    assert snap2.summary["cluster_scope"] == "incremental"
    assert snap2.summary["cluster_files_in"] == 3, "only the appended files"

    after = {f.path for f in tbl.live_files()}
    assert clustered_paths <= after, "previously clustered files untouched"
    assert not (new_paths & after), "unclustered appends were rewritten"
    assert table_rows(tbl) == before_rows, "full scan identical"

    # pruned scan still exact vs a full-scan filter
    mid = datetime.datetime(2023, 11, 29)
    pred = [Predicate("warc_ts", ">", mid)]
    assert tbl.scan(pred).count() == tbl.scan().filter(
        F.col("warc_ts") > F.lit(mid)
    ).count()

    # an immediate re-run finds nothing to do and commits nothing
    v = tbl.current_version()
    assert zorder_by(tbl, curve="morton", scope="incremental") is None
    assert tbl.current_version() == v


def test_predicate_scoped_cluster(spark, tmp_path):
    """predicates=[...] restricts the rewrite to stats-overlapping files
    (Iceberg rewriteDataFiles file-filter analog)."""
    tbl = None
    for i in range(4):
        d = generate_pages(spark, 150, seed=51 + i, partitions=2, revision=i)
        if tbl is None:
            tbl = IcehouseTable.create(spark, str(tmp_path / "ps"), d)
        else:
            tbl.append(d)
    before_rows = table_rows(tbl)
    n_files = len(tbl.live_files())
    # revisions shift warc_ts +35d each over a 30d spread (base 2023-11-14):
    # this cutoff is past rev 0/1 max, inside rev 2/3 → strict file subset
    cutoff = datetime.datetime(2024, 1, 20)
    scoped = tbl.planned_files([Predicate("warc_ts", ">", cutoff)])
    assert 0 < len(scoped) < n_files, "predicate must select a strict subset"
    snap = zorder_by(
        tbl, curve="morton", target_file_bytes=1,
        predicates=[Predicate("warc_ts", ">", cutoff)],
    )
    assert snap.summary["cluster_files_in"] == len(scoped)
    assert table_rows(tbl) == before_rows


def test_zorder_falls_back_to_data_bounds_without_stats(spark, tmp_path, monkeypatch):
    """Stats-less scoped subsets (legacy manifests) must not crash the
    coordinate scaling: bounds fall back to one agg over the files being
    rewritten (ADVICE r02)."""
    import ecommerce_lakehouse_spark.maintenance.zorder as z

    df = generate_pages(spark, 400, seed=91, partitions=4)
    tbl = IcehouseTable.create(spark, str(tmp_path / "pages"), df)
    before = sorted(r.url for r in tbl.scan().select("url").collect())

    def _no_stats(files, ts_col):
        raise ValueError(f"no stats for {ts_col}; cannot scale coordinates")

    monkeypatch.setattr(z, "_ts_bounds_from_stats", _no_stats)
    snap = z.zorder_by(tbl, target_file_bytes=1 << 20)
    assert snap is not None and snap.operation.startswith("cluster-")
    assert sorted(r.url for r in tbl.scan().select("url").collect()) == before


def test_zorder_third_dimension_prunes(spark, tmp_path):
    """k-dim clustering (VERDICT r02 #7): adding lang as a 3rd Z-order axis
    must make lang-equality predicates prune files via manifest stats, while
    table contents stay identical."""
    from ecommerce_lakehouse_spark.table import Predicate

    df = generate_pages(spark, 2000, seed=93, partitions=4)
    tbl = IcehouseTable.create(spark, str(tmp_path / "pages"), df)
    before = sorted(r.url for r in tbl.scan().select("url").collect())

    total = sum(f.size_bytes for f in tbl.live_files())
    snap = zorder_by(
        tbl, curve="morton", extra_cols=["lang"],
        target_file_bytes=max(1, total // 12),
    )
    assert snap is not None
    files = tbl.live_files()
    assert len(files) >= 8
    # the rarest present language must be readable from a strict file subset
    rare = (
        tbl.scan().groupBy("lang").count()
        .orderBy("count", "lang").first()["lang"]
    )
    kept = tbl.planned_files([Predicate("lang", "=", rare)])
    assert 0 < len(kept) < len(files), (rare, len(kept), len(files))
    # correctness: clustering only relocates rows
    assert sorted(r.url for r in tbl.scan().select("url").collect()) == before
    got = {r.lang for r in tbl.scan([Predicate("lang", "=", rare)]).select("lang").collect()}
    assert got == {rare}


def test_zorder_hilbert_k3_roundtrip(spark, tmp_path):
    """3-D Hilbert clustering commits and preserves contents."""
    df = generate_pages(spark, 800, seed=95, partitions=2)
    tbl = IcehouseTable.create(spark, str(tmp_path / "pages"), df)
    n = tbl.scan().count()
    snap = zorder_by(tbl, curve="hilbert", extra_cols=["lang"],
                     target_file_bytes=1 << 18)
    assert snap is not None and snap.operation == "cluster-hilbert"
    assert tbl.scan().count() == n


def test_expire_trims_metadata_log(spark, tmp_path):
    """Old v{N}.metadata.json files are pure history (commits CAS on
    current+1; time travel resolves through the CURRENT snapshot list) —
    expiry trims the log so a commit-heavy table doesn't pay O(commits^2)
    metadata bytes."""
    import os

    from ecommerce_lakehouse_spark.maintenance import expire_snapshots
    from ecommerce_lakehouse_spark.table import IcehouseTable

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 50, seed=81, partitions=1),
    )
    for i in range(7):
        tbl.append(generate_pages(spark, 10, seed=90 + i, partitions=1))
    assert tbl.current_version() == 8

    expire_snapshots(tbl, keep_last=2, orphan_grace_ms=0,
                     keep_metadata_versions=3)
    left = sorted(
        f for f in os.listdir(tbl.meta_dir) if f.endswith(".metadata.json")
    )
    # expire itself committed v9; versions <= 9-3 are gone
    assert left == [f"v{v:010d}.metadata.json" for v in (7, 8, 9)]
    # the table still reads, time-travels within retained, and commits
    assert tbl.scan().count() == 120
    pre = tbl.current_snapshot().snapshot_id
    assert tbl.scan(snapshot_id=pre).count() == 120
    tbl.append(generate_pages(spark, 5, seed=99, partitions=1))
    assert tbl.scan().count() == 125


# --------------------------------------------- predicate-scoped compaction


def test_predicate_scoped_compaction_touches_only_matching_files(spark, tmp_path):
    """Iceberg rewrite_data_files `where`: only files whose stats might
    match are planned; everything else keeps its exact file identity."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "scoped"),
        generate_pages(spark, 300, seed=71, partitions=3),
        properties={"partition.spec": '[{"transform": "day", "col": "warc_ts"}]'},
    )
    for s in (72, 73):
        tbl.append(generate_pages(spark, 120, seed=s, partitions=3))
    before = table_rows(tbl)
    files_before = {f.path for f in tbl.live_files()}

    from ecommerce_lakehouse_spark.table.partitioning import partition_tuple_of_file

    days = sorted({
        v for f in tbl.live_files() for _l, v in (partition_tuple_of_file(f) or ())
    })
    target_day = days[0]
    lo = datetime.datetime.strptime(target_day, "%Y-%m-%d")
    hi = lo + datetime.timedelta(days=1)
    preds = [Predicate("warc_ts", ">=", lo), Predicate("warc_ts", "<", hi)]

    in_scope_before = {
        f.path for f in tbl.live_files()
        if dict(partition_tuple_of_file(f) or ()).get("day(warc_ts)") == target_day
    }
    assert len(in_scope_before) >= 2  # several small files to pack
    snap = compact(tbl, target_file_bytes=64 * 1024 * 1024, predicates=preds)
    assert snap is not None
    files_after = {f.path for f in tbl.live_files()}
    # out-of-scope files are untouched, byte-for-byte the same entries
    assert files_before - in_scope_before <= files_after
    # in-scope small files were packed
    assert not (in_scope_before & files_after)
    assert table_rows(tbl) == before


def test_sql_optimize_where_scopes_plan(spark, tmp_path):
    from ecommerce_lakehouse_spark.sql import IcehouseSQL

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "sqlopt"),
        generate_pages(spark, 200, seed=74, partitions=2),
    )
    tbl.append(generate_pages(spark, 80, seed=75, partitions=2))
    # revision=1 shifts warc_ts +35 days: wholly AFTER the cutoff below,
    # so these files must survive the scoped rewrite untouched
    tbl.append(generate_pages(spark, 80, seed=76, partitions=2, revision=1))
    before = table_rows(tbl)
    files_before = {f.path for f in tbl.live_files()}
    cut = "2023-12-15 00:00:00"
    isql = IcehouseSQL(spark)
    res = isql.sql(
        f"OPTIMIZE '{tbl.path}' WHERE warc_ts < TIMESTAMP '{cut}'"
    )
    assert res.statement == "optimize-compact" and res.detail is not None
    # any surviving original file must lie wholly OUTSIDE the scope
    # (min >= cutoff: its stats prove no row could match warc_ts < cutoff)
    cut_us = int(
        datetime.datetime(2023, 12, 15, tzinfo=datetime.timezone.utc).timestamp()
        * 1_000_000
    )
    survivors = [f for f in tbl.live_files() if f.path in files_before]
    assert survivors  # the fixture spans the cutoff on both sides
    for f in survivors:
        assert f.stats["warc_ts"]["min"] >= cut_us
    assert table_rows(tbl) == before
