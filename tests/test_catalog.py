"""Multi-table catalog + atomic cross-table transactions (2-phase commit).

Protocol under test (table/catalog.py): phase 1 stages every write on a
per-txn branch of each table, the commit point is ONE catalog CAS flipping
all pinned snapshots, phase 2 idempotently fast-forwards each table's main
pointer and is crash-recoverable via the catalog's pending-txn record.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import Catalog, CommitConflict


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("pages", generate_pages(spark, 200, seed=41, partitions=2))
    cat.create_table("audit", generate_pages(spark, 50, seed=42, partitions=1))
    return cat


def _delta(spark, n, seed):
    return generate_pages(spark, n, seed=seed, partitions=1)


def test_catalog_read_is_pinned(spark, catalog):
    assert catalog.table_names() == ["audit", "pages"]
    assert catalog.read("pages").count() == 200
    # a DIRECT write moves the table but not the catalog view ...
    catalog.table("pages").append(_delta(spark, 30, 43))
    assert catalog.table("pages").scan().count() == 230
    assert catalog.read("pages").count() == 200
    # ... until an explicit refresh
    catalog.refresh("pages")
    assert catalog.read("pages").count() == 230


def test_txn_commits_all_tables_atomically(spark, catalog):
    with catalog.transaction() as txn:
        txn.append("pages", _delta(spark, 30, 44))
        txn.append("audit", _delta(spark, 10, 45))
        # mid-txn: nothing visible to catalog readers or on main
        assert catalog.read("pages").count() == 200
        assert catalog.read("audit").count() == 50
        assert catalog.table("pages").scan().count() == 200
        # read-your-own-writes inside the txn
        assert txn.read("pages").count() == 230
    # committed: both pins flipped together, mains fast-forwarded,
    # branches dropped, no pending residue
    assert catalog.read("pages").count() == 230
    assert catalog.read("audit").count() == 60
    assert catalog.table("pages").scan().count() == 230
    assert catalog.table("audit").scan().count() == 60
    assert catalog.table("pages").branches() == {}
    assert catalog.pending_transactions() == {}


def test_txn_abort_leaves_nothing_visible(spark, catalog):
    with pytest.raises(RuntimeError, match="boom"):
        with catalog.transaction() as txn:
            txn.append("pages", _delta(spark, 30, 46))
            raise RuntimeError("boom")
    assert catalog.read("pages").count() == 200
    assert catalog.table("pages").scan().count() == 200
    assert catalog.table("pages").branches() == {}
    assert catalog.pending_transactions() == {}


def test_txn_conflict_same_table_first_committer_wins(spark, catalog):
    t1 = catalog.transaction()
    t2 = catalog.transaction()
    t1.append("pages", _delta(spark, 30, 47))
    t2.append("pages", _delta(spark, 99, 48))
    t1.commit()
    with pytest.raises(CommitConflict, match="pages"):
        t2.commit()
    # only t1's rows are visible anywhere; t2 left no branch behind
    assert catalog.read("pages").count() == 230
    assert catalog.table("pages").scan().count() == 230
    assert catalog.table("pages").branches() == {}
    assert catalog.pending_transactions() == {}


def test_txn_disjoint_tables_both_commit(spark, catalog):
    t1 = catalog.transaction()
    t2 = catalog.transaction()
    t1.append("pages", _delta(spark, 30, 49))
    t2.append("audit", _delta(spark, 10, 50))
    t1.commit()
    t2.commit()  # revalidates (its table's pin unmoved) and lands
    assert catalog.read("pages").count() == 230
    assert catalog.read("audit").count() == 60


def test_txn_merge_into_on_branch(spark, catalog):
    base = catalog.read("pages")
    delta = base.limit(40).withColumn("lang", F.lit("xx"))
    with catalog.transaction() as txn:
        txn.merge_into("pages", delta, ["url"])
        txn.append("audit", delta.select(*catalog.table("audit").schema().names))
    merged = catalog.read("pages")
    assert merged.count() == 200  # pure update, no row-count change
    assert merged.filter(F.col("lang") == "xx").count() == 40
    assert catalog.read("audit").count() == 90


def test_recover_finishes_interrupted_publish(spark, catalog, monkeypatch):
    """Crash between the catalog commit point and phase 2: data is already
    visible through the catalog; recover() completes the pointer moves."""
    monkeypatch.setattr(Catalog, "_publish_txn", lambda self, *a: None)
    with catalog.transaction() as txn:
        txn.append("pages", _delta(spark, 30, 51))
        txn.append("audit", _delta(spark, 10, 52))
    monkeypatch.undo()
    # committed through the catalog ...
    assert catalog.read("pages").count() == 230
    assert catalog.read("audit").count() == 60
    # ... but the crash left mains behind and the txn pending
    assert catalog.table("pages").scan().count() == 200
    assert len(catalog.pending_transactions()) == 1
    done = catalog.recover()
    assert len(done) == 1
    assert catalog.table("pages").scan().count() == 230
    assert catalog.table("audit").scan().count() == 60
    assert catalog.table("pages").branches() == {}
    assert catalog.pending_transactions() == {}
    # recover() is idempotent
    assert catalog.recover() == []


def test_direct_write_divergence_publishes_by_cherry_pick(spark, catalog):
    """A non-catalog append lands on main AFTER the txn forked: phase 2
    cannot fast-forward, so the append-only branch is cherry-picked onto
    the new main and the pin moves to the merged current (never left on a
    dropped-branch snapshot that expiry could reclaim)."""
    txn = catalog.transaction()
    txn.append("pages", _delta(spark, 30, 53))
    catalog.table("pages").append(_delta(spark, 5, 54))  # direct write
    txn.commit()
    assert catalog.table("pages").scan().count() == 235  # both landed
    assert catalog.read("pages").count() == 235
    assert catalog.pinned_snapshot("pages") == (
        catalog.table("pages").current_snapshot().snapshot_id
    )
    assert catalog.table("pages").branches() == {}
    assert catalog.pending_transactions() == {}


def test_empty_txn_commit_is_noop(spark, catalog):
    v = catalog.current_version()
    with catalog.transaction():
        pass
    assert catalog.current_version() == v


def test_register_duplicate_name_raises(spark, catalog):
    with pytest.raises(CommitConflict, match="already registered"):
        catalog.register_table("pages", catalog.table("audit"))


def test_register_views_sql_is_catalog_consistent(spark, catalog):
    """spark.sql over registered views joins the PINNED snapshots: a
    direct write after registration is invisible until re-registration."""
    catalog.register_views(metadata=True)
    n = spark.sql(
        "SELECT (SELECT count(*) FROM pages) + (SELECT count(*) FROM audit) AS n"
    ).first()["n"]
    assert n == 250
    assert spark.sql("SELECT count(*) AS c FROM pages_files").first()["c"] >= 1
    catalog.table("pages").append(_delta(spark, 30, 55))
    assert spark.sql("SELECT count(*) AS c FROM pages").first()["c"] == 200
    catalog.refresh("pages")
    catalog.register_views(["pages"])
    assert spark.sql("SELECT count(*) AS c FROM pages").first()["c"] == 230


def test_catalog_expire_protects_lagging_pin(spark, catalog):
    """Direct writes move the table past the pin; Catalog.expire must keep
    the pinned snapshot's files readable even with keep_last=1."""
    tbl = catalog.table("pages")
    pin = catalog.pinned_snapshot("pages")
    tbl.append(_delta(spark, 30, 56))
    tbl.append(_delta(spark, 20, 57))
    res = catalog.expire("pages", keep_last=1)
    assert res.expired_snapshots  # something actually expired
    assert pin not in res.expired_snapshots
    assert catalog.read("pages").count() == 200  # pin still fully readable
    assert tbl.scan().count() == 250


def test_drop_table_unregisters_and_purge_deletes(spark, tmp_path):
    import os

    from ecommerce_lakehouse_spark.sql import IcehouseSQL, IcehouseSQLError

    cat = Catalog(spark, str(tmp_path / "cat"))
    a = cat.create_table("keep_data", generate_pages(spark, 30, seed=5, partitions=1))
    b = cat.create_table("purge_me", generate_pages(spark, 30, seed=6, partitions=1))
    isql = IcehouseSQL(spark, catalog=cat)

    # default drop: unregister only — the directory survives
    isql.sql("DROP TABLE keep_data")
    assert "keep_data" not in cat.table_names()
    assert os.path.isdir(a.path)
    # PURGE: the directory goes too
    res = isql.sql("DROP TABLE purge_me PURGE")
    assert res.statement == "drop-table"
    assert "purge_me" not in cat.table_names()
    assert not os.path.exists(b.path)
    # unknown name refuses; quoted paths refuse through SQL
    with pytest.raises(CommitConflict, match="unknown table"):
        cat.drop_table("purge_me")
    with pytest.raises(IcehouseSQLError, match="not droppable"):
        isql.sql(f"DROP TABLE '{a.path}'")


def test_drop_table_refused_while_pending_txn_references_it(
    spark, catalog, monkeypatch
):
    monkeypatch.setattr(Catalog, "_publish_txn", lambda self, *a: None)
    with catalog.transaction() as txn:
        txn.append("pages", _delta(spark, 30, 53))
    monkeypatch.undo()
    assert len(catalog.pending_transactions()) == 1
    with pytest.raises(CommitConflict, match="pending"):
        catalog.drop_table("pages")
    # recovery publishes phase 2, then the drop goes through
    catalog.recover()
    catalog.drop_table("pages")
    assert "pages" not in catalog.table_names()
