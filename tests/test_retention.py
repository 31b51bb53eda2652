"""Retention policies as table properties (Iceberg history.expire.*
analog): a default ``expire_snapshots(table)`` run honors per-table
``min-snapshots-to-keep`` / ``max-snapshot-age-ms`` / ``max-ref-age-ms``
set once via ``set_properties`` — so one fleet-wide maintenance sweep
enforces each table's own policy. Explicit arguments always win.
"""

from __future__ import annotations

import time

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance import expire_snapshots
from ecommerce_lakehouse_spark.maintenance.expire import (
    PROP_MAX_REF_AGE,
    PROP_MAX_SNAPSHOT_AGE,
    PROP_MIN_SNAPSHOTS,
)
from ecommerce_lakehouse_spark.table import IcehouseTable


def _table_with_history(spark, tmp_path, appends=3):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 40, seed=61, partitions=1),
    )
    for i in range(appends):
        tbl.append(generate_pages(spark, 10, seed=62 + i, partitions=1))
    return tbl


def test_min_snapshots_to_keep_property_drives_default_expire(spark, tmp_path):
    tbl = _table_with_history(spark, tmp_path, appends=3)  # snapshots 1..4
    tbl.set_properties({PROP_MIN_SNAPSHOTS: "3"})  # snapshot 5 (set-props)
    res = expire_snapshots(tbl, orphan_grace_ms=0)
    kept = {s.snapshot_id for s in tbl.snapshots()}
    # the newest 3 PUBLISHED snapshots survive; explicit args still win
    assert len(kept) == 3 and res.expired_snapshots
    assert tbl.scan().count() == 70  # data intact: manifests self-contained
    res2 = expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    assert len(list(tbl.snapshots())) == 1
    assert sorted(res2.expired_snapshots) == sorted(kept - {max(kept)})


def test_max_snapshot_age_property_expires_old_history(spark, tmp_path):
    tbl = _table_with_history(spark, tmp_path, appends=2)  # snapshots 1..3
    time.sleep(0.2)
    cutoff_probe = int(time.time() * 1000)
    tbl.append(generate_pages(spark, 10, seed=69, partitions=1))  # snap 4
    # anything older than 150ms-ago is expirable; snapshots 1..3 committed
    # >=200ms ago, snapshot 4 just now
    tbl.set_properties({PROP_MAX_SNAPSHOT_AGE: "150"})
    res = expire_snapshots(tbl, orphan_grace_ms=0)
    kept = {s.snapshot_id for s in tbl.snapshots()}
    assert 4 in kept and 1 not in kept and 2 not in kept
    # everything that survived either post-dates the cutoff probe or is
    # the (always-protected) current snapshot
    assert all(
        s.timestamp_ms >= cutoff_probe
        or s.snapshot_id == tbl.current_snapshot().snapshot_id
        for s in tbl.snapshots()
    )
    assert set(res.expired_snapshots) >= {1, 2}
    assert tbl.scan().count() == 70


def test_max_ref_age_drops_stale_tag_and_branch(spark, tmp_path):
    tbl = _table_with_history(spark, tmp_path, appends=1)  # snaps 1,2
    tbl.create_tag("old-training-set")
    tbl.create_branch("stale-audit")
    time.sleep(0.2)
    tbl.append(generate_pages(spark, 10, seed=77, partitions=1))
    tbl.set_properties({PROP_MAX_REF_AGE: "150"})
    assert "old-training-set" in tbl.refs()
    assert "stale-audit" in tbl.branches()
    expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    # both refs aged out: they no longer pin lineage, so only current stays
    assert "old-training-set" not in tbl.refs()
    assert "stale-audit" not in tbl.branches()
    assert len(list(tbl.snapshots())) == 1


def test_fresh_refs_survive_ref_age_policy(spark, tmp_path):
    tbl = _table_with_history(spark, tmp_path, appends=1)
    tbl.set_properties({PROP_MAX_REF_AGE: str(24 * 3600 * 1000)})
    tbl.create_tag("fresh")
    tbl.create_branch("wip")
    expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    assert "fresh" in tbl.refs() and "wip" in tbl.branches()
    # the tagged snapshot stays readable
    assert tbl.scan(snapshot_id="fresh").count() == 50


def test_set_properties_commit_is_content_neutral_for_changes(spark, tmp_path):
    tbl = _table_with_history(spark, tmp_path, appends=0)
    tbl.set_properties({"custom.owner": "pipeline-team"})
    assert tbl.properties()["custom.owner"] == "pipeline-team"
    # a set-properties commit moves no rows: incremental consumers skip it
    assert tbl.changes(1).count() == 0
    assert tbl.changes(1, cdc=True).count() == 0
    # tombstone removal
    tbl.set_properties({"custom.owner": None})
    assert "custom.owner" not in tbl.properties()


def test_dry_run_skips_ref_aging_and_is_conservative(spark, tmp_path):
    """dry_run previews without mutating refs: an aged tag still pins its
    snapshot in the preview (conservative bound), and the refs survive."""
    tbl = _table_with_history(spark, tmp_path, appends=1)  # snaps 1,2
    tbl.create_tag("aged")
    time.sleep(0.2)
    tbl.append(generate_pages(spark, 10, seed=79, partitions=1))
    tbl.set_properties({PROP_MAX_REF_AGE: "150"})
    preview = expire_snapshots(
        tbl, keep_last=1, orphan_grace_ms=0, dry_run=True
    )
    assert "aged" in tbl.refs(), "dry run must not drop refs"
    tagged = tbl.refs()["aged"]
    assert tagged not in preview.expired_snapshots
    real = expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
    assert "aged" not in tbl.refs()
    # the real run reclaims at least everything the preview promised
    assert set(real.expired_snapshots) >= set(preview.expired_snapshots)
    assert real.freed_bytes >= preview.freed_bytes
