"""SQL DML front end (IcehouseSQL): the reference's spark.sql-driven
notebook statements (MERGE INTO / DELETE / UPDATE / ALTER / OPTIMIZE /
VACUUM / DESCRIBE HISTORY) mapped onto the engine's primitives — each
statement must behave exactly like the Python API call it compiles to,
and anything outside the grammar must raise, never misread.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.operators.merge import dedup_latest
from ecommerce_lakehouse_spark.sql import IcehouseSQL, IcehouseSQLError, parse_predicates
from ecommerce_lakehouse_spark.table import IcehouseTable


@pytest.fixture()
def sql_table(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 200, seed=41, partitions=2),
    )
    return tbl, IcehouseSQL(spark)


def _delta_view(spark, name="delta_v", base=200, new=15, recrawl=40, seed=41):
    delta = dedup_latest(
        generate_recrawl_delta(spark, base, new, recrawl, seed=seed, partitions=2),
        ["url"], "warc_ts",
    )
    delta.createOrReplaceTempView(name)
    return delta


def test_sql_merge_star_matches_python_merge(spark, sql_table, tmp_path):
    tbl, isql = sql_table
    delta = _delta_view(spark)
    # twin table merged through the Python API
    twin = IcehouseTable.create(
        spark, str(tmp_path / "twin"),
        generate_pages(spark, 200, seed=41, partitions=2),
    )
    from ecommerce_lakehouse_spark.operators.merge import merge_into

    merge_into(twin, delta, "url")
    res = isql.sql(
        f"MERGE INTO '{tbl.path}' AS t USING delta_v AS s ON t.url = s.url "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.statement == "merge"
    want = sorted(tuple(r) for r in twin.scan().select("url", "text").collect())
    got = sorted(tuple(r) for r in tbl.scan().select("url", "text").collect())
    assert got == want


def test_sql_merge_partial_update_and_delete_matched(spark, sql_table):
    tbl, isql = sql_table
    _delta_view(spark)
    before_lang = dict(
        (r.url, r.lang) for r in tbl.scan().select("url", "lang").collect()
    )
    isql.sql(
        f"MERGE INTO '{tbl.path}' t USING delta_v s ON t.url = s.url "
        f"WHEN MATCHED THEN UPDATE SET text = s.text, warc_ts = s.warc_ts"
    )
    # partial update: lang untouched, no inserts happened
    after = tbl.scan().select("url", "lang").collect()
    assert all(before_lang.get(r.url) == r.lang for r in after
               if r.url in before_lang)
    assert tbl.scan().count() == 200

    n_matched = tbl.scan().join(
        spark.table("delta_v").select("url"), "url", "left_semi"
    ).count()
    isql.sql(
        f"MERGE INTO '{tbl.path}' t USING delta_v s ON t.url = s.url "
        f"WHEN MATCHED THEN DELETE"
    )
    assert tbl.scan().count() == 200 - n_matched


def test_sql_merge_insert_only(spark, sql_table):
    tbl, isql = sql_table
    _delta_view(spark)
    res = isql.sql(
        f"MERGE INTO '{tbl.path}' t USING delta_v s ON t.url = s.url "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.statement == "merge-insert-only"
    assert tbl.scan().count() == 215  # 200 + 15 new urls, updates skipped


def test_sql_delete_where_predicates(spark, sql_table):
    tbl, isql = sql_table
    urls = [r.url for r in tbl.scan().select("url").orderBy("url").limit(3).collect()]
    in_list = ", ".join(f"'{u}'" for u in urls)
    isql.sql(f"DELETE FROM '{tbl.path}' WHERE url IN ({in_list})")
    assert tbl.scan().count() == 197
    assert tbl.scan().filter(F.col("url").isin(urls)).count() == 0


def test_sql_update_via_primary_key(spark, sql_table):
    tbl, isql = sql_table
    isql.sql(f"ALTER TABLE '{tbl.path}' SET TBLPROPERTIES ('primary.key' = 'url')")
    victim = tbl.scan().select("url").orderBy("url").first().url
    isql.sql(
        f"UPDATE '{tbl.path}' SET lang = 'xx', text = upper(text) "
        f"WHERE url = '{victim}'"
    )
    row = tbl.scan().filter(F.col("url") == victim).first()
    assert row.lang == "xx" and row.text == row.text.upper()
    assert tbl.scan().filter(F.col("lang") == "xx").count() == 1
    assert tbl.scan().count() == 200  # one atomic rewrite, no dupes


def test_sql_alter_optimize_vacuum_history(spark, sql_table):
    tbl, isql = sql_table
    isql.sql(f"ALTER TABLE '{tbl.path}' SET TBLPROPERTIES ('owner' = 'ml')")
    assert tbl.properties()["owner"] == "ml"
    isql.sql(f"ALTER TABLE '{tbl.path}' UNSET TBLPROPERTIES ('owner')")
    assert "owner" not in tbl.properties()

    tbl.append(generate_pages(spark, 30, seed=42, partitions=3))
    res = isql.sql(f"OPTIMIZE '{tbl.path}'")
    assert res.statement == "optimize-compact"

    res = isql.sql(f"OPTIMIZE '{tbl.path}' ZORDER BY (url, warc_ts)")
    assert res.statement == "optimize-zorder" and res.detail is not None

    n_before = len(list(tbl.snapshots()))
    isql.sql(f"VACUUM '{tbl.path}'")
    assert len(list(tbl.snapshots())) < n_before

    hist = isql.sql(f"DESCRIBE HISTORY '{tbl.path}'")
    assert hist.count() >= 1 and "operation" in hist.columns


def test_sql_select_passthrough_and_catalog_names(spark, tmp_path):
    from ecommerce_lakehouse_spark.sources.datasource import register_table_views
    from ecommerce_lakehouse_spark.table.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("pages", generate_pages(spark, 50, seed=43, partitions=1))
    isql = IcehouseSQL(spark, catalog=cat)
    register_table_views(spark, cat.table("pages").path, "pages")
    assert isql.sql("SELECT count(*) AS n FROM pages").first().n == 50
    # bare names resolve through the catalog
    isql.sql("ALTER TABLE pages SET TBLPROPERTIES ('k' = 'v')")
    assert cat.table("pages").properties()["k"] == "v"


def test_sql_rejects_out_of_grammar(spark, sql_table):
    tbl, isql = sql_table
    with pytest.raises(IcehouseSQLError, match="unsupported statement"):
        isql.sql(f"GRANT SELECT ON '{tbl.path}' TO analyst")
    with pytest.raises(IcehouseSQLError, match="not droppable"):
        isql.sql(f"DROP TABLE '{tbl.path}'")
    with pytest.raises(IcehouseSQLError, match="WHERE"):
        isql.sql(f"DELETE FROM '{tbl.path}' WHERE url LIKE 'x%'")
    with pytest.raises(IcehouseSQLError, match="share a name"):
        isql.sql(
            f"MERGE INTO '{tbl.path}' t USING delta_v s ON t.url = s.link "
            f"WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(IcehouseSQLError, match="!="):
        parse_predicates("lang != 'en'")
    with pytest.raises(IcehouseSQLError, match="primary.key"):
        isql.sql(f"UPDATE '{tbl.path}' SET lang = 'xx' WHERE lang = 'en'")


def test_truncate_table_is_metadata_only_and_history_survives(spark, sql_table):
    tbl, isql = sql_table
    before = tbl.current_snapshot()
    n_before = tbl.scan().count()
    assert n_before == 200
    res = isql.sql(f"TRUNCATE TABLE '{tbl.path}'")
    assert res.statement == "truncate"
    snap = res.detail
    # metadata-only: nothing read or written, all live files dropped
    assert snap.summary["truncate"] is True
    assert snap.summary["metadata_deleted_rows"] == n_before
    assert snap.summary["deleted_rows"] == n_before
    assert tbl.scan().count() == 0
    assert tbl.row_count() == 0
    # history survives: time travel to the pre-truncate snapshot
    assert tbl.scan(snapshot_id=before.snapshot_id).count() == n_before
    # idempotent: truncating an empty table is a no-op (no new snapshot)
    assert isql.sql(f"TRUNCATE TABLE '{tbl.path}'").detail is None
    # table stays writable after truncate
    tbl.append(generate_pages(spark, 10, seed=7, partitions=1))
    assert tbl.scan().count() == 10


def test_truncate_emits_cdc_deletes_for_every_row(spark, sql_table):
    tbl, isql = sql_table
    frm = tbl.current_snapshot().snapshot_id
    isql.sql(f"TRUNCATE TABLE '{tbl.path}'")
    feed = tbl.changes(from_snapshot_id=frm, cdc=True, key_cols=["url"])
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_type == {"delete": 200}


def test_replace_table_as_select_is_atomic_overwrite(spark, sql_table, tmp_path):
    tbl, isql = sql_table
    tbl.create_tag("pre-replace")
    old_version = tbl.current_snapshot().snapshot_id
    tbl.scan().createOrReplaceTempView("pages_v")
    res = isql.sql(
        f"REPLACE TABLE '{tbl.path}' AS "
        f"SELECT url, warc_ts FROM pages_v WHERE lang = 'en'"
    )
    assert res.statement == "replace-table-as"
    # new schema comes from the query; history and tags survive
    assert set(tbl.schema().fieldNames()) == {"url", "warc_ts"}
    assert tbl.scan(snapshot_id="pre-replace").count() == 200
    assert tbl.scan(snapshot_id=old_version).count() == 200
    # CREATE TABLE refuses to clobber; CREATE OR REPLACE overwrites
    with pytest.raises(IcehouseSQLError, match="exists"):
        isql.sql(f"CREATE TABLE '{tbl.path}' AS SELECT * FROM pages_v")
    isql.sql(
        f"CREATE OR REPLACE TABLE '{tbl.path}' AS "
        f"SELECT url FROM pages_v LIMIT 5"
    )
    assert tbl.scan().count() == 5
    # REPLACE TABLE on a missing table refuses (RTAS requires existence)
    with pytest.raises(IcehouseSQLError, match="no such table"):
        isql.sql(
            f"REPLACE TABLE '{tmp_path / 'missing'}' AS SELECT * FROM pages_v"
        )


def test_show_tblproperties(spark, sql_table):
    tbl, isql = sql_table
    tbl.set_properties({"sort.order": "warc_ts", "bloom.cols": "url"})
    rows = {r["key"]: r["value"] for r in isql.sql(
        f"SHOW TBLPROPERTIES '{tbl.path}'").collect()}
    assert rows["sort.order"] == "warc_ts"
    assert rows["bloom.cols"] == "url"
    one = isql.sql(f"SHOW TBLPROPERTIES '{tbl.path}' ('sort.order')").collect()
    assert [(r["key"], r["value"]) for r in one] == [("sort.order", "warc_ts")]
    with pytest.raises(IcehouseSQLError, match="TBLPROPERTIES"):
        isql.sql(f"SHOW FILES '{tbl.path}' ('sort.order')")


def test_describe_table_and_show_tables(spark, sql_table, tmp_path):
    from ecommerce_lakehouse_spark.table.catalog import Catalog

    tbl, isql = sql_table
    cols = {r["col_name"]: (r["data_type"], r["nullable"])
            for r in isql.sql(f"DESCRIBE '{tbl.path}'").collect()}
    assert cols["url"][0] == "string"
    assert cols["warc_ts"][0] == "timestamp_ntz"
    assert cols["html"][0] == "binary"
    assert isql.sql(f"DESCRIBE TABLE '{tbl.path}'").count() == len(
        tbl.schema().fields
    )
    # SHOW TABLES needs a catalog
    with pytest.raises(IcehouseSQLError, match="Catalog"):
        isql.sql("SHOW TABLES")
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register_table("pages", tbl)
    rows = IcehouseSQL(spark, catalog=cat).sql("SHOW TABLES").collect()
    assert [(r["name"], r["path"]) for r in rows] == [("pages", tbl.path)]
