"""fsck: metadata/filesystem integrity checker."""

from __future__ import annotations

import os

import pytest

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate, delete_where
from ecommerce_lakehouse_spark.table.validate import fsck


@pytest.fixture()
def table(spark, tmp_path):
    t = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 150, seed=61, partitions=2),
    )
    t.append(generate_pages(spark, 50, seed=62, partitions=1))
    return t


def test_fsck_clean_table_is_ok(spark, table):
    table.create_tag("t1")
    table.create_branch("b1")
    urls = [r.url for r in table.scan().select("url").orderBy("url")
            .limit(3).collect()]
    delete_where(table, [Predicate("url", "in", tuple(urls))])
    rep = fsck(table, deep=True)
    assert rep.ok, rep.errors
    assert rep.checked_snapshots >= 5
    assert rep.checked_data_files >= 3
    assert rep.checked_delete_files >= 1


def test_fsck_detects_missing_data_file(spark, table):
    victim = table.live_files()[0]
    os.unlink(os.path.join(table.path, victim.path))
    rep = fsck(table)
    assert not rep.ok
    assert any("data file missing" in e for e in rep.errors)


def test_fsck_detects_truncated_data_file(spark, table):
    victim = table.live_files()[0]
    p = os.path.join(table.path, victim.path)
    with open(p, "r+b") as f:
        f.truncate(victim.size_bytes // 2)
    rep = fsck(table)
    assert not rep.ok
    assert any("size" in e for e in rep.errors)


def test_fsck_detects_missing_manifest_and_dangling_ref(spark, table):
    table.create_tag("pin")
    # remove one manifest of the current snapshot
    rel = table.manifests_of(table.current_snapshot())[0]
    os.unlink(os.path.join(table.path, rel))
    rep = fsck(table)
    assert not rep.ok
    assert any("manifest missing" in e for e in rep.errors)


def test_fsck_detects_missing_dv_sidecar(spark, table):
    urls = [r.url for r in table.scan().select("url").orderBy("url")
            .limit(2).collect()]
    delete_where(table, [Predicate("url", "in", tuple(urls))])
    reg = table.delete_registry()
    dv_rel = next(iter(reg.values()))["dvs"][0]
    os.unlink(os.path.join(table.path, dv_rel))
    rep = fsck(table)
    assert not rep.ok
    assert any("DV sidecar missing" in e for e in rep.errors)


def test_fsck_clean_after_expiry_horizon(spark, table):
    """Expire trims ancestors but children keep parent_id — the resulting
    dangling parent is the expiry horizon, not corruption."""
    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    table.append(generate_pages(spark, 20, seed=63, partitions=1))
    expire_snapshots(table, keep_last=1, orphan_grace_ms=0)
    rep = fsck(table, deep=True)
    assert rep.ok, rep.errors
