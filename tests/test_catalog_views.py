"""Catalog-persisted SQL views (the Iceberg-view analog).

Surface under test (table/catalog.py + sql.py): a view is its SQL TEXT,
versioned through the catalog CAS; reads resolve the dependency closure
(tables at their catalog pins, prerequisite views in topological order) at
READ time, so view results are transactionally consistent with Catalog.read.
Nothing materializes at CREATE — a view over a 100-TB table is a metadata
row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.sql import IcehouseSQL, IcehouseSQLError
from ecommerce_lakehouse_spark.table import Catalog, CommitConflict


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("pages", generate_pages(spark, 200, seed=61, partitions=2))
    return cat


def test_create_and_read_view(spark, catalog):
    catalog.create_view(
        "lang_counts",
        "SELECT lang, count(*) AS n FROM pages GROUP BY lang",
    )
    assert catalog.view_names() == ["lang_counts"]
    got = {r["lang"]: r["n"] for r in catalog.read_view("lang_counts").collect()}
    want = {
        r["lang"]: r["n"]
        for r in catalog.read("pages").groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert got == want


def test_view_reads_pinned_snapshot(spark, catalog):
    catalog.create_view("all_pages", "SELECT * FROM pages")
    # a direct (non-catalog) write moves the table but not the pin ...
    catalog.table("pages").append(generate_pages(spark, 30, seed=62, partitions=1))
    assert catalog.read_view("all_pages").count() == 200
    # ... and the view follows the pin after a refresh
    catalog.refresh("pages")
    assert catalog.read_view("all_pages").count() == 230


def test_view_over_view_resolves_in_dependency_order(spark, catalog):
    catalog.create_view(
        "en_pages", "SELECT * FROM pages WHERE lang = 'en'"
    )
    catalog.create_view(
        "en_count", "SELECT count(*) AS n FROM en_pages"
    )
    want = catalog.read("pages").filter(F.col("lang") == "en").count()
    assert catalog.read_view("en_count").collect()[0]["n"] == want


def test_view_name_collisions_and_replace(spark, catalog):
    with pytest.raises(CommitConflict, match="is a table"):
        catalog.create_view("pages", "SELECT 1 AS x")
    catalog.create_view("v", "SELECT 1 AS x")
    with pytest.raises(CommitConflict, match="exists"):
        catalog.create_view("v", "SELECT 2 AS x")
    catalog.create_view("v", "SELECT 2 AS x", replace=True)
    assert catalog.read_view("v").collect()[0]["x"] == 2


def test_view_must_be_select(spark, catalog):
    with pytest.raises(ValueError, match="SELECT/WITH"):
        catalog.create_view("v", "DROP TABLE pages")


def test_view_cycle_refused_at_create(spark, catalog):
    catalog.create_view("a", "SELECT 1 AS x")
    catalog.create_view("b", "SELECT x FROM a")
    # replacing a so it references b would close the cycle a->b->a
    with pytest.raises((ValueError, CommitConflict), match="cycle"):
        catalog.create_view("a", "SELECT x FROM b", replace=True)


def test_drop_view_guards(spark, catalog):
    catalog.create_view("base", "SELECT url FROM pages")
    catalog.create_view("top", "SELECT count(*) AS n FROM base")
    with pytest.raises(CommitConflict, match="referenced by view"):
        catalog.drop_view("base")
    with pytest.raises(CommitConflict, match="referenced by view"):
        catalog.drop_table("pages")
    catalog.drop_view("top")
    catalog.drop_view("base")
    assert catalog.view_names() == []
    with pytest.raises(CommitConflict, match="unknown view"):
        catalog.drop_view("base")


def test_register_views_includes_sql_views(spark, catalog):
    catalog.create_view(
        "lang_counts",
        "SELECT lang, count(*) AS n FROM pages GROUP BY lang",
    )
    names = catalog.register_views()
    assert "lang_counts" in names
    assert spark.sql("SELECT sum(n) AS total FROM lang_counts").collect()[0][
        "total"
    ] == 200


def test_sql_create_show_select_drop_view(spark, catalog):
    sql = IcehouseSQL(spark, catalog=catalog)
    sql.sql(
        "CREATE VIEW en_pages AS SELECT url, lang FROM pages WHERE lang = 'en'"
    )
    shown = {r["name"] for r in sql.sql("SHOW VIEWS").collect()}
    assert shown == {"en_pages"}
    # SELECT over the view auto-registers its closure — no prior
    # register_views() call
    want = catalog.read("pages").filter(F.col("lang") == "en").count()
    got = sql.sql("SELECT count(*) AS n FROM en_pages").collect()[0]["n"]
    assert got == want
    sql.sql(
        "CREATE OR REPLACE VIEW en_pages AS SELECT url FROM pages"
    )
    assert sql.sql("SELECT * FROM en_pages").columns == ["url"]
    sql.sql("DROP VIEW en_pages")
    assert sql.sql("SHOW VIEWS").count() == 0
    with pytest.raises(IcehouseSQLError):
        sql.sql("DROP VIEW en_pages PURGE")


def test_sql_create_view_needs_catalog(spark):
    sql = IcehouseSQL(spark)
    with pytest.raises(IcehouseSQLError, match="Catalog"):
        sql.sql("CREATE VIEW v AS SELECT 1 AS x")


def test_concurrent_create_view_serializes_on_catalog_cas(spark, catalog):
    """N racing CREATE VIEWs of distinct names all land (lost CAS races
    revalidate and retry); a second CREATE of the SAME name aborts."""
    from concurrent.futures import ThreadPoolExecutor

    def mk(i: int):
        catalog.create_view(f"v{i}", f"SELECT {i} AS x")
        return i

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert sorted(pool.map(mk, range(4))) == [0, 1, 2, 3]
    assert catalog.view_names() == ["v0", "v1", "v2", "v3"]
    errs = 0
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(catalog.create_view, "dup", "SELECT 1 AS x")
                for _ in range(2)]
        for f in futs:
            try:
                f.result()
            except CommitConflict:
                errs += 1
    assert errs == 1  # exactly one winner
    assert "dup" in catalog.view_names()


def test_table_select_after_view_select_tracks_pin_advance(spark, catalog):
    """ADVICE r5 (sql.py auto-registration): read_view registers the view
    closure's tables as temp views; a later direct SELECT over such a
    table must re-pin it after the catalog pin advances, not reuse the
    stale registration."""
    catalog.create_view(
        "lang_counts", "SELECT lang, count(*) AS n FROM pages GROUP BY lang"
    )
    sql = IcehouseSQL(spark, catalog=catalog)
    sql.sql("SELECT * FROM lang_counts").collect()  # registers 'pages' @ P1
    before = sql.sql("SELECT count(*) AS n FROM pages").collect()[0]["n"]

    catalog.table("pages").append(
        generate_pages(spark, 50, seed=77, partitions=1)
    )
    catalog.refresh("pages")  # pin advance
    got = sql.sql("SELECT count(*) AS n FROM pages").collect()[0]["n"]
    assert got == before + 50, (
        "direct table SELECT after a view SELECT must track the new pin"
    )
