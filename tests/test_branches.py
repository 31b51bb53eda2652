"""Writable branches: multi-commit isolation, CAS vs main, publish, expiry.

The branch primitive extends round-4's single-commit WAP staging to whole
workflows: N commits land on ``branch.<name>`` while readers of main see
nothing, then fast_forward/merge_branch publishes atomically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance import expire_snapshots
from ecommerce_lakehouse_spark.table import CommitConflict, IcehouseTable


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 200, seed=31, partitions=2)
    return IcehouseTable.create(spark, str(tmp_path / "t"), df)


def test_multi_commit_branch_then_fast_forward(spark, table):
    table.create_branch("audit")
    table.append(generate_pages(spark, 50, seed=32, partitions=1), branch="audit")
    table.append(generate_pages(spark, 25, seed=33, partitions=1), branch="audit")
    # main is untouched; the branch sees both commits
    assert table.scan().count() == 200
    assert table.scan(snapshot_id="audit").count() == 275
    # audit passed: publish is a pointer move, no data rewritten
    table.fast_forward("audit")
    assert table.scan().count() == 275
    table.drop_branch("audit")
    assert "audit" not in table.branches()


def test_branch_commits_never_lose_main_commits(spark, table):
    """Main and branch writers interleave on the one CAS counter — every
    commit lands, neither lineage loses an update."""
    table.create_branch("b")
    table.append(generate_pages(spark, 10, seed=34, partitions=1), branch="b")
    table.append(generate_pages(spark, 20, seed=35, partitions=1))  # main
    table.append(generate_pages(spark, 5, seed=36, partitions=1), branch="b")
    assert table.scan().count() == 220
    assert table.scan(snapshot_id="b").count() == 215
    # diverged: fast-forward must refuse (main is no ancestor of the head)
    with pytest.raises(CommitConflict, match="merge_branch"):
        table.fast_forward("b")


def test_merge_branch_cherry_picks_appends_after_divergence(spark, table):
    table.create_branch("b")
    table.append(generate_pages(spark, 10, seed=34, partitions=1), branch="b")
    table.append(generate_pages(spark, 20, seed=35, partitions=1))  # main
    table.append(generate_pages(spark, 5, seed=36, partitions=1), branch="b")
    table.merge_branch("b")
    # all three appends present exactly once (double-apply would overshoot)
    assert table.scan().count() == 235
    assert "b" not in table.branches()


def test_branch_overwrite_isolated_from_main(spark, table):
    table.create_branch("rewrite")
    new = generate_pages(spark, 40, seed=37, partitions=1)
    removed = [f.path for f in table.live_files(table._resolve_snapshot("rewrite"))]
    table.replace_files(removed, new, operation="overwrite", branch="rewrite")
    assert table.scan().count() == 200
    assert table.scan(snapshot_id="rewrite").count() == 40
    table.fast_forward("rewrite")
    assert table.scan().count() == 40


def test_expire_retains_branch_lineage(spark, table):
    import time

    table.create_branch("keep")
    table.append(generate_pages(spark, 30, seed=38, partitions=1), branch="keep")
    table.append(generate_pages(spark, 10, seed=39, partitions=1))  # main
    table.append(generate_pages(spark, 15, seed=40, partitions=1), branch="keep")
    # aggressive expiry: age cutoff in the future sweeps everything not
    # pinned — branch-exclusive snapshots must survive it
    expire_snapshots(
        table, keep_last=1, older_than_ms=int(time.time() * 1000) + 60_000,
        orphan_grace_ms=0,
    )
    assert table.scan(snapshot_id="keep").count() == 245
    assert table.scan().count() == 210
    # publish still works after expiry
    table.merge_branch("keep")
    assert table.scan().count() == 255


def test_dsv2_branch_read_and_write(spark, table):
    from ecommerce_lakehouse_spark.sources.datasource import register

    register(spark)
    table.create_branch("wip")
    (
        generate_pages(spark, 35, seed=41, partitions=1)
        .write.format("icehouse").mode("append")
        .option("path", table.path).option("branch", "wip").save()
    )
    main_df = spark.read.format("icehouse").load(table.path)
    wip_df = (
        spark.read.format("icehouse")
        .option("branch", "wip").load(table.path)
    )
    assert main_df.count() == 200
    assert wip_df.count() == 235
    table.fast_forward("wip")
    assert spark.read.format("icehouse").load(table.path).count() == 235


def test_branch_write_to_unknown_branch_raises(spark, table):
    with pytest.raises(ValueError, match="unknown branch"):
        table.append(generate_pages(spark, 5, seed=42, partitions=1),
                     branch="nope")


def test_merge_branch_refuses_diverged_nonappend(spark, table):
    table.create_branch("b")
    # a row-set-changing commit ON THE BRANCH while main moves
    new = generate_pages(spark, 10, seed=43, partitions=1)
    head_files = [
        f.path for f in table.live_files(table._resolve_snapshot("b"))
    ]
    table.replace_files(head_files[:1], new, operation="replace", branch="b")
    table.append(generate_pages(spark, 5, seed=44, partitions=1))  # main
    with pytest.raises(CommitConflict, match="non-append"):
        table.merge_branch("b")


def test_branch_scoped_maintenance_then_publish(spark, table):
    """Write-audit-publish MAINTENANCE: merge+compact+zorder run against a
    branch head and advance only the branch; main readers see nothing
    until fast_forward."""
    from ecommerce_lakehouse_spark.maintenance import compact, zorder_by
    from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into

    before = sorted(
        (r.url, r.text) for r in table.scan().select("url", "text").collect()
    )
    table.create_branch("maint")
    delta = dedup_latest(
        table.scan().limit(20).withColumn(
            "text", F.concat(F.lit("maint "), F.col("text"))
        ),
        ["url"], "warc_ts",
    )
    res = merge_into(table, delta, "url", branch="maint")
    assert res.rows_updated == 20
    compact(table, target_file_bytes=1 << 30, branch="maint")
    zorder_by(table, curve="morton", target_file_bytes=1 << 20,
              branch="maint")
    # main is byte-identical through the whole pass
    after_main = sorted(
        (r.url, r.text) for r in table.scan().select("url", "text").collect()
    )
    assert after_main == before
    # the branch carries the merged + rewritten state
    branch_rows = sorted(
        (r.url, r.text)
        for r in table.scan(snapshot_id="maint").select("url", "text").collect()
    )
    assert branch_rows != before
    assert len(branch_rows) == len(before)
    assert sum(1 for _u, t in branch_rows if t.startswith("maint ")) == 20
    # publish: pointer move only
    table.fast_forward("maint")
    assert sorted(
        (r.url, r.text) for r in table.scan().select("url", "text").collect()
    ) == branch_rows


def test_rollback_to_ancestor_and_refuse_side_lineage(spark, table):
    s1 = table.current_snapshot().snapshot_id
    table.append(generate_pages(spark, 30, seed=45, partitions=1))
    table.append(generate_pages(spark, 20, seed=46, partitions=1))
    assert table.scan().count() == 250
    table.rollback_to(s1)
    assert table.scan().count() == 200
    # the rolled-over commits remain time-travelable
    assert table.scan(snapshot_id=s1 + 2).count() == 250
    # writing after a rollback forks cleanly from the restored state
    table.append(generate_pages(spark, 5, seed=47, partitions=1))
    assert table.scan().count() == 205
    # a staged side snapshot is NOT an ancestor: refuse
    staged = table.append(generate_pages(spark, 9, seed=48, partitions=1),
                          publish=False)
    with pytest.raises(ValueError, match="not an .*ancestor|not an ancestor"):
        table.rollback_to(staged.snapshot_id)


def test_expire_sweeps_dropped_branch_snapshots(spark, table):
    """drop_branch abandons the branch-exclusive snapshots — default
    expiry (no age cutoff) reclaims them instead of pinning them forever
    as pending WAP stages."""
    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    table.create_branch("tmp")
    table.append(generate_pages(spark, 30, seed=49, partitions=1), branch="tmp")
    b_head = table.branches()["tmp"]
    table.append(generate_pages(spark, 10, seed=50, partitions=1))  # main
    table.drop_branch("tmp")
    expire_snapshots(table, keep_last=1, orphan_grace_ms=0)
    with pytest.raises(ValueError, match="unknown snapshot"):
        table.scan(snapshot_id=b_head)
    assert table.scan().count() == 210
    # a LIVE branch's snapshots survive the same default expiry
    table.create_branch("live")
    table.append(generate_pages(spark, 7, seed=51, partitions=1), branch="live")
    expire_snapshots(table, keep_last=1, orphan_grace_ms=0)
    assert table.scan(snapshot_id="live").count() == 217
