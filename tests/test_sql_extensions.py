"""SQL surface extensions: time travel in SELECT, CALL maintenance
procedures, and branch/tag + column DDL — each statement must behave
exactly like the Python primitive it compiles to (the same contract
test_sql.py pins for DML), and out-of-grammar input must raise.

Iceberg parity anchors: Spark's ``FOR VERSION/TIMESTAMP AS OF`` clause,
``CALL catalog.system.<proc>`` procedures, and ``ALTER TABLE ... CREATE
BRANCH/TAG`` DDL from the Iceberg Spark extensions — re-expressed over
this engine's snapshot/ref/schema-evolution primitives.
"""

from __future__ import annotations

import datetime
import os
import time

import pytest

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.sql import IcehouseSQL, IcehouseSQLError
from ecommerce_lakehouse_spark.table import IcehouseTable


@pytest.fixture()
def sqlx(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 120, seed=71, partitions=2),
    )
    return tbl, IcehouseSQL(spark)


def _grow(spark, tbl, n=40, seed=72):
    from pyspark.sql import functions as F

    extra = generate_pages(spark, n, seed=seed, partitions=1).withColumn(
        "url", F.concat(F.lit("x://"), "url")
    )
    return tbl.append(extra)


# ------------------------------------------------------------- time travel


def test_select_version_as_of_snapshot_id(spark, sqlx):
    tbl, isql = sqlx
    s1 = tbl.current_snapshot()
    _grow(spark, tbl)
    assert tbl.scan().count() == 160
    old = isql.sql(
        f"SELECT count(*) AS n FROM '{tbl.path}' FOR VERSION AS OF "
        f"{s1.snapshot_id}"
    ).collect()[0].n
    assert old == 120


def test_select_version_as_of_tag_and_branch(spark, sqlx):
    tbl, isql = sqlx
    isql.sql(f"ALTER TABLE '{tbl.path}' CREATE TAG t0")
    isql.sql(f"ALTER TABLE '{tbl.path}' CREATE BRANCH dev")
    _grow(spark, tbl)  # main moves; tag and branch stay at 120 rows
    for ref in ("t0", "dev"):
        n = isql.sql(
            f"SELECT count(*) AS n FROM '{tbl.path}' FOR VERSION AS OF '{ref}'"
        ).collect()[0].n
        assert n == 120, ref


def test_select_timestamp_as_of_is_main_chain_reader_view(spark, sqlx):
    tbl, isql = sqlx
    time.sleep(0.05)
    mid = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    # a STAGED (WAP) append after `mid` must stay invisible to time travel
    # even though its snapshot timestamp is also after `mid` — as-of walks
    # the main chain only
    tbl.append(generate_pages(spark, 10, seed=99, partitions=1), publish=False)
    _grow(spark, tbl)
    n = isql.sql(
        f"SELECT count(*) AS n FROM '{tbl.path}' FOR TIMESTAMP AS OF "
        f"TIMESTAMP '{mid.isoformat(sep=' ')}'"
    ).collect()[0].n
    assert n == 120


def test_time_travel_rewrite_inside_join(spark, sqlx):
    """The FROM-item rewrite must handle >1 travel clause in one statement
    (self-join of two epochs — the classic changed-rows diff query)."""
    tbl, isql = sqlx
    s1 = tbl.current_snapshot()
    _grow(spark, tbl)
    s2 = tbl.current_snapshot()
    rows = isql.sql(
        f"SELECT count(*) AS n FROM "
        f"'{tbl.path}' FOR VERSION AS OF {s2.snapshot_id} b "
        f"LEFT ANTI JOIN '{tbl.path}' FOR VERSION AS OF {s1.snapshot_id} a "
        f"ON a.url = b.url"
    ).collect()[0].n
    assert rows == 40  # exactly the appended keys


def test_time_travel_pins_snapshot_against_later_commits(spark, sqlx):
    """Lazy-DataFrame hazard: the travel view must pin the file list at
    parse time, so commits between parse and action don't shift it."""
    tbl, isql = sqlx
    s1 = tbl.current_snapshot()
    df = isql.sql(
        f"SELECT count(*) AS n FROM '{tbl.path}' FOR VERSION AS OF "
        f"{s1.snapshot_id}"
    )
    _grow(spark, tbl)  # commit lands BEFORE the action below
    assert df.collect()[0].n == 120


def test_time_travel_bad_literals_raise(spark, sqlx):
    tbl, isql = sqlx
    with pytest.raises(IcehouseSQLError):
        isql.sql(
            f"SELECT * FROM '{tbl.path}' FOR TIMESTAMP AS OF 123"
        )
    with pytest.raises(ValueError):  # unknown tag name
        isql.sql(f"SELECT * FROM '{tbl.path}' FOR VERSION AS OF 'nope'")


# -------------------------------------------------------------------- CALL


def test_call_rollback_to_snapshot_and_timestamp(spark, sqlx):
    tbl, isql = sqlx
    s1 = tbl.current_snapshot()
    time.sleep(0.05)
    mid = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    _grow(spark, tbl)
    isql.sql(f"CALL rollback_to_snapshot('{tbl.path}', {s1.snapshot_id})")
    assert tbl.scan().count() == 120
    _grow(spark, tbl, seed=73)
    isql.sql(
        f"CALL rollback_to_timestamp('{tbl.path}', "
        f"TIMESTAMP '{mid.isoformat(sep=' ')}')"
    )
    assert tbl.scan().count() == 120


def test_call_fast_forward_publishes_branch(spark, sqlx):
    tbl, isql = sqlx
    isql.sql(f"ALTER TABLE '{tbl.path}' CREATE BRANCH audit")
    tbl.append(
        generate_pages(spark, 30, seed=81, partitions=1), branch="audit"
    )
    assert tbl.scan().count() == 120  # main unchanged while branch grows
    isql.sql(f"CALL fast_forward('{tbl.path}', 'audit')")
    assert tbl.scan().count() == 150


def test_call_cherry_pick_snapshot(spark, sqlx):
    tbl, isql = sqlx
    staged = tbl.append(
        generate_pages(spark, 20, seed=82, partitions=1), publish=False
    )
    _grow(spark, tbl)  # current moved: fast-forward impossible, pick works
    isql.sql(f"CALL cherry_pick_snapshot('{tbl.path}', {staged.snapshot_id})")
    assert tbl.scan().count() == 180


def test_call_expire_snapshots_named_args(spark, sqlx):
    tbl, isql = sqlx
    _grow(spark, tbl)
    _grow(spark, tbl, seed=74)
    res = isql.sql(
        f"CALL expire_snapshots('{tbl.path}', retain_last => 1)"
    )
    assert res.statement == "call-expire_snapshots"
    assert len(res.detail.expired_snapshots) == 2
    assert tbl.scan().count() == 200  # current state untouched


def test_call_remove_orphan_files_sweeps_only_unreferenced(spark, sqlx):
    tbl, isql = sqlx
    live_before = {f.path for f in tbl.live_files()}
    orphan = os.path.join(tbl.data_dir, "orphan-junk.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    old = time.time() - 86_400
    os.utime(orphan, (old, old))
    res = isql.sql(f"CALL remove_orphan_files('{tbl.path}')")
    assert res.detail.deleted_files == 1
    assert not os.path.exists(orphan)
    assert {f.path for f in tbl.live_files()} == live_before
    assert tbl.scan().count() == 120


def test_remove_orphans_protects_staged_and_recent(spark, sqlx, tmp_path):
    """Files of a STAGED (unpublished) snapshot are snapshot-referenced —
    never orphans; a fresh unreferenced file survives the grace clamp."""
    from ecommerce_lakehouse_spark.maintenance import remove_orphan_files

    tbl, isql = sqlx
    staged = tbl.append(
        generate_pages(spark, 15, seed=83, partitions=1), publish=False
    )
    fresh = os.path.join(tbl.data_dir, "fresh-junk.parquet")
    with open(fresh, "wb") as f:
        f.write(b"junk")
    # even an explicit far-future cutoff must not beat the grace clamp
    res = remove_orphan_files(
        tbl, older_than_ms=int(time.time() * 1000) + 10_000
    )
    assert res.deleted_files == 0
    assert os.path.exists(fresh)
    tbl.cherry_pick(staged.snapshot_id)
    assert tbl.scan().count() == 135


def test_call_rewrite_manifests(spark, sqlx):
    tbl, isql = sqlx
    _grow(spark, tbl)
    before = tbl.scan().count()
    res = isql.sql(f"CALL rewrite_manifests('{tbl.path}', target_entries => 10000)")
    assert res.statement == "call-rewrite_manifests"
    assert tbl.scan().count() == before


def test_call_out_of_grammar_raises(spark, sqlx):
    tbl, isql = sqlx
    with pytest.raises(IcehouseSQLError, match="unknown procedure"):
        isql.sql(f"CALL drop_everything('{tbl.path}')")
    with pytest.raises(IcehouseSQLError):
        isql.sql("CALL expire_snapshots()")
    with pytest.raises(IcehouseSQLError, match="positional arg"):
        isql.sql(
            f"CALL expire_snapshots('{tbl.path}', retain_last => 1, 5)"
        )
    with pytest.raises(IcehouseSQLError):  # bad kwarg name → TypeError path
        isql.sql(f"CALL expire_snapshots('{tbl.path}', bogus => 1)")


# --------------------------------------------------------------------- DDL


def test_alter_create_tag_as_of_version_then_drop(spark, sqlx):
    tbl, isql = sqlx
    s1 = tbl.current_snapshot()
    _grow(spark, tbl)
    isql.sql(
        f"ALTER TABLE '{tbl.path}' CREATE TAG v1 AS OF VERSION "
        f"{s1.snapshot_id}"
    )
    assert tbl.refs()["v1"] == s1.snapshot_id
    isql.sql(f"ALTER TABLE '{tbl.path}' DROP TAG v1")
    assert "v1" not in tbl.refs()


def test_alter_column_ddl_roundtrip(spark, sqlx):
    tbl, isql = sqlx
    isql.sql(
        f"ALTER TABLE '{tbl.path}' ADD COLUMN quality double DEFAULT 0.5"
    )
    assert tbl.scan().select("quality").first()[0] == 0.5
    isql.sql(f"ALTER TABLE '{tbl.path}' RENAME COLUMN quality TO q_score")
    cols = tbl.scan().columns
    assert "q_score" in cols and "quality" not in cols
    isql.sql(f"ALTER TABLE '{tbl.path}' DROP COLUMN q_score")
    assert "q_score" not in tbl.scan().columns


def test_alter_add_column_timestamp_default_literal(spark, sqlx):
    tbl, isql = sqlx
    isql.sql(
        f"ALTER TABLE '{tbl.path}' ADD COLUMN seen timestamp "
        f"DEFAULT TIMESTAMP '2024-01-02 03:04:05'"
    )
    got = tbl.scan().select("seen").first()[0]
    assert got == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_alter_widen_column_type(spark, sqlx):
    tbl, isql = sqlx
    isql.sql(f"ALTER TABLE '{tbl.path}' ADD COLUMN hits int")
    isql.sql(f"ALTER TABLE '{tbl.path}' ALTER COLUMN hits TYPE bigint")
    assert dict(tbl.scan().dtypes)["hits"] == "bigint"
    with pytest.raises(ValueError, match="unsafe"):
        isql.sql(f"ALTER TABLE '{tbl.path}' ALTER COLUMN hits TYPE int")


def test_insert_into_select_appends_atomically(spark, sqlx):
    from pyspark.sql import functions as F

    tbl, isql = sqlx
    generate_pages(spark, 30, seed=84, partitions=1).withColumn(
        "url", F.concat(F.lit("i://"), "url")
    ).createOrReplaceTempView("ins_src")
    n_snaps = len(tbl.snapshots())
    res = isql.sql(f"INSERT INTO '{tbl.path}' SELECT * FROM ins_src")
    assert res.statement == "insert"
    assert tbl.scan().count() == 150
    assert len(tbl.snapshots()) == n_snaps + 1  # ONE append commit
    with pytest.raises(IcehouseSQLError, match="VALUES"):
        isql.sql(f"INSERT INTO '{tbl.path}' VALUES (1, 2)")


def test_insert_from_time_travel_restores_rows(spark, sqlx, tmp_path):
    """INSERT's SELECT goes through the time-travel rewrite: copy an old
    snapshot's rows into another table (the selective-restore flow)."""
    tbl, isql = sqlx
    s1 = tbl.current_snapshot()
    _grow(spark, tbl)
    dst = str(tmp_path / "restored")
    isql.sql(
        f"CREATE TABLE '{dst}' AS SELECT * FROM '{tbl.path}' "
        f"FOR VERSION AS OF {s1.snapshot_id}"
    )
    assert IcehouseTable(spark, dst).scan().count() == 120


def test_ctas_path_and_bad_grammar(spark, sqlx, tmp_path):
    tbl, isql = sqlx
    dst = str(tmp_path / "ctas")
    res = isql.sql(
        f"CREATE TABLE '{dst}' AS SELECT 'a' AS k, 1 AS v"
    )
    assert res.statement == "create-table-as"
    assert IcehouseTable(spark, dst).scan().count() == 1
    with pytest.raises(IcehouseSQLError):
        isql.sql("CREATE TABLE '/x' (k string)")  # column DDL unsupported


def test_alter_out_of_grammar_still_raises(spark, sqlx):
    tbl, isql = sqlx
    with pytest.raises(IcehouseSQLError):
        isql.sql(f"ALTER TABLE '{tbl.path}' SET LOCATION '/elsewhere'")


# --------------------------------------------- VACUUM DRY RUN / DESCRIBE


def test_vacuum_dry_run_previews_then_real_run_matches(spark, sqlx):
    """DRY RUN must mutate nothing and its numbers must be exactly what
    the real VACUUM then reclaims (no ref-aging policy set, so the
    conservative preview is exact here)."""
    tbl, isql = sqlx
    _grow(spark, tbl)
    from ecommerce_lakehouse_spark.maintenance import compact

    compact(tbl, target_file_bytes=64 * 1024 * 1024)
    n_snaps = len(tbl.snapshots())
    data_dir = os.path.join(tbl.path, "data")
    files_before = sorted(os.listdir(data_dir))
    version_before = tbl.current_version()

    preview = isql.sql(f"VACUUM '{tbl.path}' DRY RUN").detail
    assert preview.expired_snapshots and preview.deleted_data_files > 0
    # nothing moved: same files, same metadata version, same snapshots
    assert sorted(os.listdir(data_dir)) == files_before
    assert tbl.current_version() == version_before
    assert len(tbl.snapshots()) == n_snaps

    real = isql.sql(f"VACUUM '{tbl.path}'").detail
    assert real.expired_snapshots == preview.expired_snapshots
    assert real.deleted_data_files == preview.deleted_data_files
    assert real.freed_bytes == preview.freed_bytes
    assert sorted(os.listdir(data_dir)) != files_before


def test_describe_detail_one_row_summary(spark, sqlx):
    tbl, isql = sqlx
    tbl.create_tag("t0")
    tbl.create_branch("audit")
    _grow(spark, tbl)
    d = isql.sql(f"DESCRIBE DETAIL '{tbl.path}'").collect()
    assert len(d) == 1
    r = d[0]
    live = tbl.live_files()
    assert r.location == tbl.path
    assert r.current_snapshot_id == tbl.current_snapshot().snapshot_id
    assert r.num_files == len(live)
    assert r.size_bytes == sum(f.size_bytes for f in live)
    assert r.num_rows == 160
    assert (r.num_branches, r.num_tags) == (1, 1)
    assert r.num_snapshots == len(tbl.snapshots())
    with pytest.raises(IcehouseSQLError, match="DESCRIBE supports"):
        isql.sql(f"DESCRIBE SCHEMA '{tbl.path}'")


# --------------------------------------------- ANALYZE / WRITE ORDERED BY


def test_analyze_sketched_column_is_metadata_only(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 200, seed=74, partitions=2),
        properties={"sketch.cols": "url"},
    )
    isql = IcehouseSQL(spark)
    rows = {r.column: r for r in
            isql.sql(f"ANALYZE TABLE '{tbl.path}' COMPUTE STATISTICS").collect()}
    assert set(rows) == {"url"}
    assert rows["url"].method == "sketch"
    # linear-counting estimate: within 10% of the true 200 distinct urls
    assert abs(rows["url"].ndv - 200) <= 20


def test_analyze_for_columns_falls_back_to_scan(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 150, seed=75, partitions=2),
    )
    isql = IcehouseSQL(spark)
    want = tbl.scan().select("lang").distinct().count()
    rows = {r.column: r for r in isql.sql(
        f"ANALYZE TABLE '{tbl.path}' COMPUTE STATISTICS FOR COLUMNS lang"
    ).collect()}
    assert rows["lang"].method == "scan" and rows["lang"].ndv == want
    with pytest.raises(IcehouseSQLError, match="no sketched columns"):
        isql.sql(f"ANALYZE TABLE '{tbl.path}' COMPUTE STATISTICS")
    with pytest.raises(IcehouseSQLError, match="unknown column"):
        isql.sql(
            f"ANALYZE TABLE '{tbl.path}' COMPUTE STATISTICS FOR COLUMNS nope"
        )


def test_write_ordered_by_ddl_sets_sort_order(spark, tmp_path):
    from ecommerce_lakehouse_spark.table import Predicate

    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 200, seed=76, partitions=2).repartition(4, "url"),
    )
    isql = IcehouseSQL(spark)
    isql.sql(f"ALTER TABLE '{tbl.path}' WRITE ORDERED BY (warc_ts)")
    assert tbl.properties()["sort.order"] == "warc_ts"
    extra = generate_pages(spark, 200, seed=77, partitions=2).repartition(4, "url")
    from pyspark.sql import functions as F

    extra = extra.withColumn("url", F.concat(F.lit("y://"), "url"))
    tbl.append(extra)
    lo, hi = extra.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    pred = [Predicate("warc_ts", "<", lo + (hi - lo) * 0.25)]
    # the post-DDL append is range-sorted: the slice prunes its files
    assert len(tbl.planned_files(pred)) < len(tbl.live_files())
    isql.sql(f"ALTER TABLE '{tbl.path}' WRITE UNORDERED")
    assert "sort.order" not in tbl.properties()
