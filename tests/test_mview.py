"""Incremental materialized views (table/mview.py + SQL surface).

Contract under test: an MV is a keyed aggregate of one catalog table,
refreshed from the CDC feed — only groups the commits touched are
recomputed (counted-broadcast key scope), vanished groups are deleted,
and the result always equals the full recomputation at the source's pin.
Fallbacks (expired history, NULL group keys, explicit FULL) take one
atomic overwrite instead.
"""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.table import Catalog, CommitConflict, Predicate
from ecommerce_lakehouse_spark.table.deletes import delete_where
from ecommerce_lakehouse_spark.table.mview import _parse_definition

MV_SQL = (
    "SELECT lang, count(*) AS n_pages, sum(length(text)) AS text_bytes "
    "FROM pages GROUP BY lang"
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_table("pages", generate_pages(spark, 300, seed=61, partitions=3))
    return c


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _mv_vs_recompute(cat, name="mv", where=None):
    """MV table contents must equal the aggregate recomputed directly at
    the source pin."""
    src = cat.read("pages")
    if where:
        src = src.filter(where)
    src.createOrReplaceTempView("__exp_src")
    exp = cat.spark.sql(
        "SELECT lang, count(*) AS n_pages, sum(length(text)) AS text_bytes "
        "FROM __exp_src GROUP BY lang"
    )
    assert _rows(cat.read(name)) == _rows(exp)


def test_create_materializes_initial_aggregate(cat):
    res = cat.create_materialized_view("mv", MV_SQL)
    assert res["mode"] == "create"
    assert cat.mview_names() == ["mv"]
    _mv_vs_recompute(cat)


def test_incremental_refresh_tracks_merge(spark, cat):
    from ecommerce_lakehouse_spark.operators.merge import dedup_latest

    cat.create_materialized_view("mv", MV_SQL)
    # recrawl delta touching a SUBSET of langs: only those groups recompute
    delta = dedup_latest(
        generate_pages(spark, 80, seed=61, partitions=1, revision=1)
        .filter("lang IN ('de', 'fr')"),
        ["url"], "warc_ts",
    )
    delta = delta.localCheckpoint()
    touched = {r["lang"] for r in delta.select("lang").distinct().collect()}
    total_langs = cat.read("pages").select("lang").distinct().count()
    assert 0 < len(touched) < total_langs
    with cat.transaction() as txn:
        txn.merge_into("pages", delta, ["url"])
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "incremental"
    # touched_keys is a SUPERSET of the truly-changed keys (rows a CoW
    # rewrite carried over count as touched): every changed lang must be
    # in the affected set, and the set stays bounded by the lang universe
    assert len(touched) <= res["affected"] <= total_langs
    assert res["deleted"] == 0
    _mv_vs_recompute(cat)
    # and the refresh is convergent: running again is a no-op
    res2 = cat.refresh_materialized_view("mv")
    assert res2["mode"] == "noop"
    _mv_vs_recompute(cat)


def test_vanished_group_is_deleted(spark, cat):
    cat.create_materialized_view("mv", MV_SQL)
    # drop EVERY row of the least-frequent lang: its group must vanish
    victim = (
        cat.read("mv").orderBy("n_pages", "lang").first()["lang"]
    )
    delete_where(cat.table("pages"), [Predicate("lang", "=", victim)])
    cat.refresh("pages")  # direct write → opt-in pin advance
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "incremental"
    assert res["deleted"] == 1
    assert victim not in [
        r["lang"] for r in cat.read("mv").select("lang").collect()
    ]
    _mv_vs_recompute(cat)


def test_content_neutral_commits_advance_without_recompute(cat):
    from ecommerce_lakehouse_spark.maintenance import compact

    cat.create_materialized_view("mv", MV_SQL)
    before = _rows(cat.read("mv"))
    compact(cat.table("pages"), target_file_bytes=64 * 1024 * 1024)
    cat.refresh("pages")
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "noop"
    assert res["refreshed_snapshot"] == cat.pinned_snapshot("pages")
    assert _rows(cat.read("mv")) == before


def test_expired_history_falls_back_to_full(spark, cat):
    cat.create_materialized_view("mv", MV_SQL)
    tbl = cat.table("pages")
    tbl.append(generate_pages(spark, 40, seed=71, partitions=1))
    tbl.append(generate_pages(spark, 40, seed=72, partitions=1))
    cat.refresh("pages")
    # expire everything but the head BYPASSING the catalog (r6: Catalog.
    # expire now protects the MV's refresh range, so the degradation
    # scenario is genuinely out-of-band table-level expiry): the CDC
    # range from the MV's last refresh is no longer reconstructable
    from ecommerce_lakehouse_spark.maintenance import expire_snapshots

    expire_snapshots(tbl, keep_last=1)
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "full"
    _mv_vs_recompute(cat)


def test_null_group_key_falls_back_to_full(spark, cat):
    cat.create_materialized_view("mv", MV_SQL)
    extra = generate_pages(spark, 10, seed=81, partitions=1).selectExpr(
        "url", "warc_ts", "html", "text", "CAST(NULL AS string) AS lang"
    )
    cat.table("pages").append(extra)
    cat.refresh("pages")
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "full"
    langs = [r["lang"] for r in cat.read("mv").select("lang").collect()]
    assert None in langs  # GROUP BY keeps the NULL group
    _mv_vs_recompute(cat)


def test_where_clause_membership_changes(spark, cat):
    from ecommerce_lakehouse_spark.operators.merge import dedup_latest

    where = "length(text) >= 120"
    cat.create_materialized_view(
        "mv",
        "SELECT lang, count(*) AS n_pages, sum(length(text)) AS text_bytes "
        f"FROM pages WHERE {where} GROUP BY lang",
    )
    _mv_vs_recompute(cat, where=where)
    # recrawls mutate text length → rows cross the WHERE boundary both ways
    delta = dedup_latest(
        generate_pages(spark, 150, seed=61, partitions=2, revision=1),
        ["url"], "warc_ts",
    )
    with cat.transaction() as txn:
        txn.merge_into("pages", delta, ["url"])
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "incremental"
    _mv_vs_recompute(cat, where=where)


def test_source_rollback_falls_back_to_full(spark, cat):
    """A source rollback moves the pin BEHIND the MV's refreshed
    snapshot — the delta is unreconstructable (negative range), so the
    refresh must downgrade to the atomic full path and converge on the
    rolled-back contents."""
    tbl = cat.table("pages")
    s0 = tbl.current_snapshot().snapshot_id
    tbl.append(generate_pages(spark, 40, seed=93, partitions=1))
    cat.refresh("pages")
    cat.create_materialized_view("mv", MV_SQL)
    tbl.rollback_to(s0)
    cat.refresh("pages")
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "full"
    _mv_vs_recompute(cat)


def test_full_flag_forces_overwrite(spark, cat):
    cat.create_materialized_view("mv", MV_SQL)
    cat.table("pages").append(generate_pages(spark, 30, seed=91, partitions=1))
    cat.refresh("pages")
    res = cat.refresh_materialized_view("mv", full=True)
    assert res["mode"] == "full"
    _mv_vs_recompute(cat)


def test_namespace_and_drop_guards(spark, cat, tmp_path):
    cat.create_materialized_view("mv", MV_SQL)
    # one namespace: tables, views and MVs can't collide
    with pytest.raises(CommitConflict):
        cat.create_view("mv", "SELECT 1 AS x")
    with pytest.raises((CommitConflict, ValueError)):
        cat.create_materialized_view("pages", MV_SQL)
    # the backing table is not directly droppable
    with pytest.raises(CommitConflict):
        cat.drop_table("mv")
    import os

    path = cat.load_metadata()["tables"]["mv"]["path"]
    cat.drop_materialized_view("mv", purge=True)
    assert cat.mview_names() == []
    assert "mv" not in cat.table_names()
    assert not os.path.exists(path)


def test_definition_grammar():
    with pytest.raises(ValueError, match="must be"):
        _parse_definition("SELECT lang, count(*) AS n FROM pages")  # no GROUP BY
    with pytest.raises(ValueError, match="alias"):
        _parse_definition("SELECT lang, count(*) FROM pages GROUP BY lang")
    with pytest.raises(ValueError, match="bare names"):
        _parse_definition(
            "SELECT upper(lang) AS l, count(*) AS n FROM pages GROUP BY lang"
        )
    with pytest.raises(ValueError, match="aggregate"):
        _parse_definition("SELECT lang FROM pages GROUP BY lang")
    d = _parse_definition(
        "SELECT lang, count(*) AS n, sum(length(text)) AS b "
        "FROM pages WHERE length(text) > 10 GROUP BY lang"
    )
    assert d["keys"] == ["lang"]
    assert d["source"] == "pages"
    assert d["where"] == "length(text) > 10"
    assert "count(*) AS n" in d["aggs"]


def test_touched_keys_scan_is_key_pruned(spark, cat):
    """The affected-key discovery must read ONLY the group-key columns —
    at 100 TB the html/text payload of touched files must not be scanned
    just to find which groups to recompute."""
    import re

    from ecommerce_lakehouse_spark.operators.merge import dedup_latest

    tbl = cat.table("pages")
    s0 = tbl.current_snapshot().snapshot_id
    delta = dedup_latest(
        generate_pages(spark, 60, seed=61, partitions=1, revision=1),
        ["url"], "warc_ts",
    )
    from ecommerce_lakehouse_spark.operators.merge import merge_into

    merge_into(tbl, delta, "url")
    df = tbl.touched_keys(s0, cols=["lang"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "no FileScan in touched_keys plan"
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols == {"lang"}, f"touched_keys read extra columns: {cols}"


def test_refresh_prunes_files_on_partitioned_source(spark, tmp_path):
    """On a source partitioned by the group key, a small affected-key set
    rides the IN-predicate path: the recompute scan plans only the
    affected groups' FILES (manifest pruning), not just their rows — the
    100-TB shape where one changed group touches one partition."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "pages",
        generate_pages(spark, 300, seed=61, partitions=3),
        properties={
            "partition.spec": '[{"transform": "identity", "col": "lang"}]'
        },
    )
    cat.create_materialized_view("mv", MV_SQL)
    victim = cat.read("mv").orderBy("n_pages", "lang").first()["lang"]
    delete_where(cat.table("pages"), [Predicate("lang", "=", victim)])
    cat.refresh("pages")
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "incremental"
    assert res["scan_path"] == "pruned-in"
    assert res["deleted"] == 1
    # the equivalent scan plan reads strictly fewer files than the table
    tbl = cat.table("pages")
    total = len(tbl.live_files())
    planned = len(tbl.planned_files([Predicate("lang", "in", (victim,))]))
    assert planned < total
    _mv_vs_recompute(cat)


def test_refresh_inside_foreachbatch(spark, cat, tmp_path):
    """The ingest-stream composition: a foreachBatch callback appends the
    micro-batch to the source table, advances the pin, and refreshes the
    MV — pinning that refresh is safe where Observation.get deadlocks
    (merge-inside-foreachBatch, see streaming/cdc_apply.py)."""
    cat.create_materialized_view("mv", MV_SQL)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    batch = generate_pages(spark, 50, seed=99, partitions=1)
    batch.coalesce(1).write.parquet(str(inbox / "b1"))
    stream = spark.readStream.schema(batch.schema).parquet(str(inbox / "*"))
    modes = []

    def _apply(bdf, _epoch):
        cat.table("pages").append(bdf)
        cat.refresh("pages")
        modes.append(cat.refresh_materialized_view("mv")["mode"])

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert modes == ["incremental"]
    _mv_vs_recompute(cat)


def test_sql_surface(spark, cat):
    from ecommerce_lakehouse_spark.sql import IcehouseSQL

    sql = IcehouseSQL(spark, catalog=cat)
    sql.sql(f"CREATE MATERIALIZED VIEW lang_stats AS {MV_SQL}")
    assert cat.mview_names() == ["lang_stats"]
    # SELECT resolves the MV's backing table at its pin
    n_langs = sql.sql("SELECT count(*) AS n FROM lang_stats").first()["n"]
    assert n_langs == cat.read("lang_stats").count()
    shown = sql.sql("SHOW MATERIALIZED VIEWS").collect()
    assert [r["name"] for r in shown] == ["lang_stats"]
    assert shown[0]["source"] == "pages"
    # a catalog write + REFRESH, visible through a fresh SELECT
    delta = generate_pages(spark, 40, seed=95, partitions=1)
    with cat.transaction() as txn:
        txn.append("pages", delta)
    res = sql.sql("REFRESH MATERIALIZED VIEW lang_stats")
    assert res["mode"] == "incremental"
    _mv_vs_recompute(cat, name="lang_stats")
    total = sql.sql(
        "SELECT sum(n_pages) AS t FROM lang_stats"
    ).first()["t"]
    assert total == cat.read("pages").count()
    sql.sql("DROP MATERIALIZED VIEW lang_stats")
    assert cat.mview_names() == []


def test_drop_table_refuses_mv_source(cat):
    """ADVICE r5: dropping a table that sources a materialized view would
    leave a dangling MV whose refresh dies with 'unknown table'."""
    cat.create_materialized_view("mv", MV_SQL)
    with pytest.raises(CommitConflict, match="materialized view"):
        cat.drop_table("pages")
    cat.drop_materialized_view("mv")
    cat.drop_table("pages")  # with the MV gone, the drop proceeds


def test_expire_protects_mv_refresh_baseline(spark, cat):
    """ADVICE r5: catalog expire must protect the snapshots MVs refresh
    FROM, or out-of-band expiry silently degrades every subsequent
    refresh to the full path."""
    cat.create_materialized_view("mv", MV_SQL)
    for i in range(3):
        cat.table("pages").append(
            generate_pages(spark, 30, seed=70 + i, partitions=1)
        )
        cat.refresh("pages")
    baseline = cat.mview_definition("mv")["refreshed"]
    cat.expire("pages", keep_last=1, orphan_grace_ms=0)
    live = {s.snapshot_id for s in cat.table("pages").snapshots()}
    assert baseline in live, "MV refresh baseline must survive expiry"
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "incremental", "refresh must not degrade to full"
    _mv_vs_recompute(cat)


def test_concurrent_refresh_conflicts_first_committer_wins(
    spark, cat, monkeypatch
):
    """ADVICE r5: two refreshes planned from the same baseline must not
    interleave — the second committer gets a CommitConflict and re-runs
    from the advanced baseline."""
    import ecommerce_lakehouse_spark.table.mview as mv_mod
    from ecommerce_lakehouse_spark.operators.merge import dedup_latest

    cat.create_materialized_view("mv", MV_SQL)
    delta = dedup_latest(
        generate_pages(spark, 40, seed=62, partitions=1, revision=2),
        ["url"], "warc_ts",
    ).localCheckpoint()
    with cat.transaction() as txn:
        txn.merge_into("pages", delta, ["url"])

    real = mv_mod._compute
    state = {"fired": False}

    def racing(*a, **kw):
        out = real(*a, **kw)
        if not state["fired"]:
            state["fired"] = True
            monkeypatch.setattr(mv_mod, "_compute", real)
            # a concurrent refresh lands first, advancing 'refreshed'
            cat.refresh_materialized_view("mv", full=True)
        return out

    monkeypatch.setattr(mv_mod, "_compute", racing)
    with pytest.raises(CommitConflict, match="concurrently"):
        cat.refresh_materialized_view("mv", full=True)
    # the loser re-runs cleanly from the new baseline
    res = cat.refresh_materialized_view("mv")
    assert res["mode"] == "noop"
    _mv_vs_recompute(cat)
