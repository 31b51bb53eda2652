"""Maintenance-suite queries, hash-checked against DuckDB oracles.

Each entry builds a deterministic Icehouse pages table in a scratch dir
from a pre-materialized parquet fixture (datagen/fixtures.py — written by
the same pure (seed, index) kernel on both engines' path), runs real
maintenance (MERGE / SCD2 / compact+Z-order / expire / delete vectors),
and returns the resulting scan. The matching oracle SQL reads the SAME
fixture parquet via ``read_parquet`` and states the EXPECTED post-
maintenance result relationally — SCD1 merge as a latest-wins full-outer
join, SCD2 as the closed/open version chain, compaction/expiry as
identity over the union (the north-rule "identical row sets" invariant),
and the delete stack as set subtraction with the re-inserted key added
back. A maintenance op that loses, duplicates or resurrects a row now
fails the value hash, not just a row count.

Reference semantics anchored at ``src/silver/ingest_silver_tables.py:
96-107`` (SCD1) and ``:244-282`` (SCD2 close+insert).
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen.fixtures import ensure_fixtures, fixture_path

FIXED_NOW = datetime.datetime(2024, 7, 1, 0, 0, 0)


def _fresh_dir() -> str:
    return tempfile.mkdtemp(prefix="icehouse-q-")


def _pages_out(df: DataFrame) -> DataFrame:
    """Deterministic, hash-friendly projection of a pages scan."""
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    return df.select(
        "url",
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
        F.length("text").alias("text_len"),
        "lang",
    )


def _read_fixture(spark: SparkSession, name: str, partitions: int) -> DataFrame:
    """Load a fixture with a controlled partition count so maintenance has
    multiple files to work on (content is partitioning-independent)."""
    ensure_fixtures()
    return spark.read.parquet(fixture_path(name)).repartition(partitions)


_PAGES_PROJ = "url, epoch_us(warc_ts) AS warc_ts_us, length(text) AS text_len, lang"


def m_merge_scd1_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE over the pages table: 2000 base, 400 recrawls, 200 new."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(spark, f"{d}/t", _read_fixture(spark, "merge_base", 4))
        delta = dedup_latest(_read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts")
        merge_into(tbl, delta, "url")
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_MERGE_SCD1 = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta
  ) WHERE rn = 1
)
SELECT coalesce(d.url, b.url) AS url,
       epoch_us(coalesce(d.warc_ts, b.warc_ts)) AS warc_ts_us,
       length(coalesce(d.text, b.text)) AS text_len,
       coalesce(d.lang, b.lang) AS lang
FROM base b FULL OUTER JOIN d ON b.url = d.url
"""


def m_compact_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction + Z-order, then a predicate-pushdown scan: returns the
    post-maintenance watermark slice (must equal the pre-maintenance one —
    the north-rule identical-row-sets invariant, now oracle-hash-checked)."""
    from .maintenance import compact, zorder_by
    from .table import IcehouseTable, Predicate

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(spark, f"{d}/t", _read_fixture(spark, "cz_base", 5))
        tbl.append(_read_fixture(spark, "cz_rev2", 3))
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        zorder_by(tbl, curve="hilbert", target_file_bytes=512 * 1024)
        cutoff = datetime.datetime(2023, 12, 1)
        return _pages_out(tbl.scan([Predicate("warc_ts", ">", cutoff)])).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_COMPACT_ZORDER = f"""
SELECT {_PAGES_PROJ}
FROM (
  SELECT * FROM read_parquet('{fixture_path("cz_base")}')
  UNION ALL
  SELECT * FROM read_parquet('{fixture_path("cz_rev2")}')
)
WHERE warc_ts > TIMESTAMP '2023-12-01 00:00:00'
"""


def m_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-transform lifecycle end-to-end: create UNPARTITIONED,
    evolve the spec to day(warc_ts) (metadata-only commit), append a
    second batch (tagged under the new spec), compact (bins never mix
    partition tuples or generations), then scan a day-bounded url slice.
    The mixed-generation layout must return exactly the relational slice
    — partitioning is layout, never semantics (Iceberg's
    spec-evolution contract; reference's date-partitioned bronze writes
    ``src/utils/02_bronze_ingest.py`` are the static special case)."""
    from .maintenance import compact
    from .table import IcehouseTable, Predicate

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(spark, f"{d}/t", _read_fixture(spark, "cz_base", 5))
        tbl.set_partition_spec(["day(warc_ts)"])
        tbl.append(_read_fixture(spark, "cz_rev2", 3))
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        cutoff = datetime.datetime(2023, 12, 1)
        return _pages_out(
            tbl.scan([
                Predicate("warc_ts", ">", cutoff),
                Predicate("url", "<", "https://site025"),
            ])
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_PARTITIONED_SCAN = f"""
SELECT {_PAGES_PROJ}
FROM (
  SELECT * FROM read_parquet('{fixture_path("cz_base")}')
  UNION ALL
  SELECT * FROM read_parquet('{fixture_path("cz_rev2")}')
)
WHERE warc_ts > TIMESTAMP '2023-12-01 00:00:00' AND url < 'https://site025'
"""


def m_sort_order_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "sort.order" write property end-to-end: both the create and a
    later append range-sort on warc_ts (disjoint per-file bounds), so a
    ts-slice scan prunes files on plain appends — no Z-order rewrite.
    The pruned scan must still return exactly the relational slice, and
    the query REFUSES to answer if pruning didn't actually cut files
    (layout regressions surface as a hard error, not a silent pass).
    Compaction runs in between: binpack re-range-sorts a sort.order
    table, so the cut must SURVIVE the rewrite too."""
    from .maintenance import compact
    from .table import IcehouseTable, Predicate

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "cz_base", 5),
            properties={"sort.order": "warc_ts"},
        )
        tbl.append(_read_fixture(spark, "cz_rev2", 3))
        compact(tbl, target_file_bytes=512 * 1024)
        cutoff = datetime.datetime(2023, 12, 1)
        pred = [Predicate("warc_ts", "<", cutoff)]
        if not len(tbl.planned_files(pred)) < len(tbl.live_files()):
            raise AssertionError("sort.order append produced no file cut")
        return _pages_out(tbl.scan(pred)).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_SORT_ORDER = f"""
SELECT {_PAGES_PROJ}
FROM (
  SELECT * FROM read_parquet('{fixture_path("cz_base")}')
  UNION ALL
  SELECT * FROM read_parquet('{fixture_path("cz_rev2")}')
)
WHERE warc_ts < TIMESTAMP '2023-12-01 00:00:00'
"""


def m_scd2_history_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 recrawl history: two batches → closed/open version chains."""
    from .operators.scd import scd2_merge
    from .table import IcehouseTable

    d = _fresh_dir()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        base = _read_fixture(spark, "scd2_base", 2).select(
            "url", "text", "lang", F.col("warc_ts").alias("crawl_ts")
        )
        recrawl = _read_fixture(spark, "scd2_recrawl", 2).select(
            "url", "text", "lang", F.col("warc_ts").alias("crawl_ts")
        )
        scd2_merge(spark, f"{d}/dim", base, ["url"], ["text", "lang"], "crawl_ts",
                   now=FIXED_NOW)
        scd2_merge(spark, f"{d}/dim", recrawl, ["url"], ["text", "lang"], "crawl_ts",
                   now=FIXED_NOW)
        tbl = IcehouseTable(spark, f"{d}/dim")
        return tbl.scan().select(
            "url",
            F.length("text").alias("text_len"),
            F.unix_micros(F.col("effective_from").cast("timestamp")).alias("from_us"),
            F.unix_micros(F.col("effective_to").cast("timestamp")).alias("to_us"),
            "is_current",
            "version_sk",
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# version_sk = md5(concat_ws('||', epoch_us(change_ts), url)) — operators/scd.py
_SK = "md5(concat(CAST(epoch_us({ts}) AS VARCHAR), '||', {url}))"
_TS_MAX_US = "epoch_us(TIMESTAMP '9999-12-31 23:59:59')"

SQL_M_SCD2_HISTORY = f"""
WITH b AS (SELECT url, text, warc_ts AS ts FROM read_parquet('{fixture_path("scd2_base")}')),
r AS (SELECT url, text, warc_ts AS ts FROM read_parquet('{fixture_path("scd2_recrawl")}'))
SELECT b.url AS url, length(b.text) AS text_len,
       epoch_us(b.ts) AS from_us, epoch_us(r.ts) AS to_us,
       FALSE AS is_current, {_SK.format(ts="b.ts", url="b.url")} AS version_sk
FROM b JOIN r ON b.url = r.url
UNION ALL
SELECT r.url, length(r.text), epoch_us(r.ts), {_TS_MAX_US},
       TRUE, {_SK.format(ts="r.ts", url="r.url")}
FROM r
UNION ALL
SELECT b.url, length(b.text), epoch_us(b.ts), {_TS_MAX_US},
       TRUE, {_SK.format(ts="b.ts", url="b.url")}
FROM b
WHERE b.url NOT IN (SELECT url FROM r)
"""


def m_metadata_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only DELETE (Iceberg partition drop): day-partitioned
    table, delete everything before a mid-day cutoff — whole days drop
    from the manifest with zero DV bytes, the boundary day keeps its
    evening rows through a deletion vector. Scan must equal the
    relational anti-slice; the job asserts the fast path actually fired
    (a silent fallback to pure DVs would still pass the hash)."""
    from .table import IcehouseTable, Predicate, delete_where

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "cz_base", 5),
            properties={
                "partition.spec": '[{"transform": "day", "col": "warc_ts"}]'
            },
        )
        cutoff = datetime.datetime(2023, 12, 1, 12, 0, 0)
        snap = delete_where(tbl, [Predicate("warc_ts", "<", cutoff)])
        assert snap is not None and snap.summary["metadata_deleted_files"] > 0
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_METADATA_DELETE = f"""
SELECT {_PAGES_PROJ}
FROM read_parquet('{fixture_path("cz_base")}')
WHERE warc_ts >= TIMESTAMP '2023-12-01 12:00:00'
"""


def m_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expiry keeps the current snapshot byte-identical while sweeping
    unreferenced files; returns the post-expiry scan."""
    from .maintenance import compact, expire_snapshots, rewrite_manifests
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(spark, f"{d}/t", _read_fixture(spark, "exp_a", 3))
        tbl.append(_read_fixture(spark, "exp_b", 2))
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        rewrite_manifests(tbl, target_entries=100)
        expire_snapshots(tbl, keep_last=1, orphan_grace_ms=0)
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_SNAPSHOT_EXPIRE = f"""
SELECT {_PAGES_PROJ}
FROM (
  SELECT * FROM read_parquet('{fixture_path("exp_a")}')
  UNION ALL
  SELECT * FROM read_parquet('{fixture_path("exp_b")}')
)
"""


def m_delete_vectors_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full merge-on-read delete stack, deterministically: positional
    DELETE WHERE (deletion vectors, no file rewrite), compaction
    MATERIALIZES those, then an EQUALITY delete (no position scan) followed
    by a re-insert of one key proving added_by sequence semantics. Returns
    the final scan — victims are fixed url slices."""
    import pyspark.sql.functions as _F

    from .maintenance import compact
    from .table import IcehouseTable, Predicate, delete_by_key, delete_where

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(spark, f"{d}/t", _read_fixture(spark, "cz_base", 3))
        # driver-side victim pick is bounded: the fixture has 1,500 distinct
        # urls and the slices below only reach index ~1,067 — the limit is a
        # hard cap so this pattern can never become an unbounded collect
        urls = sorted(
            r.url
            for r in tbl.scan().select("url").distinct()
            .orderBy("url").limit(2048).collect()
        )
        victims = tuple(urls[::97][:12])
        snap = delete_where(tbl, [Predicate("url", "in", victims)])
        assert snap is not None and snap.summary["deleted_rows"] >= 12
        assert tbl.current_snapshot().delete_manifest is not None
        compact(tbl, target_file_bytes=1 << 30)
        assert tbl.current_snapshot().delete_manifest is None

        eq_victims = [u for u in urls[3::101][:8] if u not in victims]
        revived = eq_victims[0]
        revived_rows = tbl.scan().filter(_F.col("url") == revived).collect()
        delete_by_key(tbl, "url", eq_victims)
        # sequence semantics: a later append of a deleted key is visible
        tbl.append(spark.createDataFrame(revived_rows, tbl.scan().schema))
        out = tbl.scan()
        assert out.filter(_F.col("url") == revived).count() == 1
        return _pages_out(out).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_DELETE_VECTORS = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("cz_base")}')),
u AS (
  SELECT url, row_number() OVER (ORDER BY url) - 1 AS i
  FROM (SELECT DISTINCT url FROM base)
),
victims AS (SELECT url FROM u WHERE i % 97 = 0 ORDER BY i LIMIT 12),
eq8 AS (SELECT url, i FROM u WHERE i >= 3 AND (i - 3) % 101 = 0 ORDER BY i LIMIT 8),
eqv AS (SELECT url, i FROM eq8 WHERE url NOT IN (SELECT url FROM victims)),
revived AS (SELECT url FROM eqv ORDER BY i LIMIT 1)
SELECT {_PAGES_PROJ}
FROM base
WHERE url NOT IN (SELECT url FROM victims)
  AND (url NOT IN (SELECT url FROM eqv) OR url IN (SELECT url FROM revived))
"""


def m_incremental_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan: create (exp_a) → append (exp_b) → compact
    (content-neutral, skipped) → ``changes(1)`` must emit exactly the
    appended batch — the O(new data) consumption path for a 10^12-doc
    table."""
    from .maintenance import compact
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(spark, f"{d}/t", _read_fixture(spark, "exp_a", 3))
        tbl.append(_read_fixture(spark, "exp_b", 2))
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        return _pages_out(tbl.changes(1)).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_INCREMENTAL_CHANGES = f"""
SELECT {_PAGES_PROJ}
FROM read_parquet('{fixture_path("exp_b")}')
"""


def m_changes_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE DATA FEED across a MERGE and a DELETE
    (``IcehouseTable.changes(cdc=True)``): SCD1 merge over the pages table
    (400 recrawl updates + 200 new urls), then a positional DELETE of a
    deterministic url slice — the feed must emit exactly the
    update_before/update_after pairs, the inserts, and the deletes, each
    stamped with its commit snapshot. The DuckDB twin states the same
    deltas relationally (update pairs = delta⋈base where any column
    differs, inserts = delta∖base, deletes = the merged rows of the victim
    slice). This is the incremental-consumption surface a downstream
    training-data pipeline reads instead of rescanning 100 TB per run."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable, Predicate, delete_where

    d = _fresh_dir()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        merge_into(tbl, delta, "url")  # snapshot 2
        # bounded driver-side victim pick (same pattern as m_delete_vectors:
        # the table holds 2,200 urls, far under the hard cap)
        urls = sorted(
            r.url
            for r in tbl.scan().select("url").distinct()
            .orderBy("url").limit(4096).collect()
        )
        victims = tuple(urls[::181][:10])
        delete_where(tbl, [Predicate("url", "in", victims)])  # snapshot 3
        cdc = tbl.changes(1, cdc=True, key_cols=["url"])
        return cdc.select(
            "url",
            F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
            F.length("text").alias("text_len"),
            "lang",
            "_change_type",
            "_commit_snapshot_id",
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_CHANGES_CDC = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta0 AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, html, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta0
  ) WHERE rn = 1
),
merged AS (
  SELECT coalesce(d.url, b.url) AS url,
         coalesce(d.warc_ts, b.warc_ts) AS warc_ts,
         coalesce(d.text, b.text) AS text,
         coalesce(d.lang, b.lang) AS lang
  FROM base b FULL OUTER JOIN d ON b.url = d.url
),
u AS (
  SELECT url, row_number() OVER (ORDER BY url) - 1 AS i
  FROM (SELECT DISTINCT url FROM merged)
),
victims AS (SELECT url FROM u WHERE i % 181 = 0 ORDER BY i LIMIT 10),
upd AS (
  SELECT d.url AS url,
         b.warc_ts AS b_ts, b.text AS b_text, b.lang AS b_lang,
         d.warc_ts AS d_ts, d.text AS d_text, d.lang AS d_lang
  FROM d JOIN base b ON d.url = b.url
  WHERE (d.warc_ts, d.html, d.text, d.lang)
        IS DISTINCT FROM (b.warc_ts, b.html, b.text, b.lang)
)
SELECT url, epoch_us(b_ts) AS warc_ts_us, length(b_text) AS text_len,
       b_lang AS lang, 'update_before' AS _change_type,
       CAST(2 AS BIGINT) AS _commit_snapshot_id
FROM upd
UNION ALL
SELECT url, epoch_us(d_ts), length(d_text), d_lang, 'update_after',
       CAST(2 AS BIGINT)
FROM upd
UNION ALL
SELECT url, epoch_us(warc_ts), length(text), lang, 'insert',
       CAST(2 AS BIGINT)
FROM d WHERE url NOT IN (SELECT url FROM base)
UNION ALL
SELECT url, epoch_us(warc_ts), length(text), lang, 'delete',
       CAST(3 AS BIGINT)
FROM merged WHERE url IN (SELECT url FROM victims)
"""


def m_dsv2_cdc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSv2 face of the change feed: the SAME merge+delete history as
    :func:`m_changes_cdc`, read back through
    ``spark.read.format("icehouse").option("cdc", "true")`` with
    ``cdc_buckets=3`` — so the executor-side hash-bucketed Arrow diff
    kernel (sources/datasource.py _read_cdc_partition), not the DataFrame
    engine, produces the rows. Shares m_changes_cdc's relational oracle:
    both surfaces must state the identical delta set."""
    from .operators.merge import dedup_latest, merge_into
    from .sources.datasource import register
    from .table import IcehouseTable, Predicate, delete_where

    d = _fresh_dir()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        merge_into(tbl, delta, "url")  # snapshot 2
        urls = sorted(
            r.url
            for r in tbl.scan().select("url").distinct()
            .orderBy("url").limit(4096).collect()
        )
        victims = tuple(urls[::181][:10])
        delete_where(tbl, [Predicate("url", "in", victims)])  # snapshot 3
        register(spark)
        cdc = (
            spark.read.format("icehouse")
            .option("cdc", "true")
            .option("key_cols", "url")
            .option("incremental_from", "1")
            .option("cdc_buckets", "3")
            .load(tbl.path)
        )
        return cdc.select(
            "url",
            F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
            F.length("text").alias("text_len"),
            "lang",
            "_change_type",
            "_commit_snapshot_id",
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_branch_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish via a BRANCH: the SCD1 merge runs on branch
    'audit' (main untouched — asserted), then fast_forward publishes by
    pointer move. The final scan must be hash-identical to the same merge
    run directly on main (oracle: the latest-wins full-outer join) —
    proving branch isolation + publish lose and duplicate nothing."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        n_before = tbl.row_count()
        tbl.create_branch("audit")
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        merge_into(tbl, delta, "url", branch="audit")
        assert tbl.row_count() == n_before  # main untouched mid-audit
        tbl.fast_forward("audit")
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 merge over a SKETCHED, round-robin-layout table (sketch.cols:
    every file spans the whole key range, so the 2048-bit key sketch is
    the only discovery cut). The result must be hash-identical to the
    plain merge — a wrongly-dropped file would lose updates and fail the
    oracle."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        base = _read_fixture(spark, "merge_base", 1).repartition(6)
        tbl = IcehouseTable.create(
            spark, f"{d}/t", base, properties={"sketch.cols": "url"}
        )
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        merge_into(tbl, delta, "url")
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end (sql.py IcehouseSQL) drives the SCD1 merge the
    reference expresses as spark.sql MERGE INTO (e.g.
    reference/src/gold/table_notebooks/daily_sales_summary.py's pattern):
    MERGE INTO ... USING <view> ON t.url = s.url WHEN MATCHED THEN UPDATE
    SET * WHEN NOT MATCHED THEN INSERT *. The final scan must be
    hash-identical to the Python-API merge (the latest-wins full-outer
    oracle) — proving statement parsing compiles to the exact same
    operation."""
    from .operators.merge import dedup_latest
    from .sql import IcehouseSQL
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        ).createOrReplaceTempView("m_sql_merge_delta")
        IcehouseSQL(spark).sql(
            f"MERGE INTO '{tbl.path}' AS t USING m_sql_merge_delta AS s "
            f"ON t.url = s.url "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC feed REPLAYED is the table: apply changes(0, cdc=True) of a
    create+merge history commit-by-commit (delete update_before rows, add
    update_after/insert rows) and return the replayed state — which must
    hash-match the post-merge table the oracle states relationally. This
    is the downstream-consumer contract of the change feed."""
    from pyspark.sql import functions as FF

    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        merge_into(tbl, delta, "url")
        feed = tbl.changes(0, cdc=True, key_cols=["url"]).localCheckpoint()
        cols = [f.name for f in tbl.schema().fields]
        sids = sorted(
            r._commit_snapshot_id
            for r in feed.select("_commit_snapshot_id").distinct().collect()
        )
        state = spark.createDataFrame([], tbl.schema())
        for sid in sids:
            batch = feed.filter(FF.col("_commit_snapshot_id") == sid)
            dels = batch.filter(
                FF.col("_change_type").isin("delete", "update_before")
            ).select(*cols)
            ins = batch.filter(
                FF.col("_change_type").isin("insert", "update_after")
            ).select(*cols)
            state = state.exceptAll(dels).unionByName(ins)
        return _pages_out(state).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_catalog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic cross-table transaction (table/catalog.py): ONE catalog
    commit gives pages the SCD1 merge and audit the new-url rows. Mid-txn
    the catalog must still serve the pre-txn state of BOTH tables
    (asserted); after commit, the union of both catalog reads must
    hash-match the oracle's relational statement of (latest-wins merged
    pages) ∪ (audit ∪ new urls) — a torn commit (one table updated, the
    other not) fails the value hash. Reference anchor: master_gold_run.py
    publishes its gold tables with NO cross-table atomicity."""
    from .operators.merge import dedup_latest
    from .table import Catalog

    d = _fresh_dir()
    try:
        cat = Catalog(spark, f"{d}/cat")
        base = _read_fixture(spark, "merge_base", 4)
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        cat.create_table("pages", base)
        cat.create_table("audit", delta)
        n_pages, n_audit = cat.read("pages").count(), cat.read("audit").count()
        with cat.transaction() as txn:
            txn.merge_into("pages", delta, ["url"])
            txn.append("audit", delta.join(base, "url", "left_anti"))
            # the commit point has not passed: catalog readers still see
            # the pre-transaction state of BOTH tables
            assert cat.read("pages").count() == n_pages
            assert cat.read("audit").count() == n_audit
        out = _pages_out(cat.read("pages")).withColumn(
            "src", F.lit("pages")
        ).unionByName(
            _pages_out(cat.read("audit")).withColumn("src", F.lit("audit"))
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_CATALOG_TXN = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta
  ) WHERE rn = 1
),
merged AS (
  SELECT coalesce(d.url, b.url) AS url,
         coalesce(d.warc_ts, b.warc_ts) AS warc_ts,
         coalesce(d.text, b.text) AS text,
         coalesce(d.lang, b.lang) AS lang
  FROM base b FULL OUTER JOIN d ON b.url = d.url
),
audit_final AS (
  SELECT url, warc_ts, text, lang FROM d
  UNION ALL
  SELECT url, warc_ts, text, lang FROM d
  WHERE url NOT IN (SELECT url FROM base)
)
SELECT {_PAGES_PROJ}, 'pages' AS src FROM merged
UNION ALL
SELECT {_PAGES_PROJ}, 'audit' AS src FROM audit_final
"""


def m_catalog_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-persisted SQL view over a merged table (table/catalog.py
    create_view + sql.py CREATE VIEW): the pages table takes the SCD1
    merge, the catalog pin advances, and a VIEW defined as the per-lang
    rollup is read back through the SQL front end — which must resolve
    the view's dependency closure against the PINNED snapshot. The oracle
    states the same rollup over the relational merge result, so a stale
    pin, a view resolving main instead of the pin, or a broken closure
    registration all fail the value hash, not just a count. Reference
    anchor: gold-layer derivations as declarative views instead of
    per-run rewrites (reference/src/gold/master_gold_run.py)."""
    from .operators.merge import dedup_latest
    from .sql import IcehouseSQL
    from .table import Catalog

    d = _fresh_dir()
    try:
        cat = Catalog(spark, f"{d}/cat")
        cat.create_table("pages", _read_fixture(spark, "merge_base", 4))
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        with cat.transaction() as txn:
            txn.merge_into("pages", delta, ["url"])
        sql = IcehouseSQL(spark, catalog=cat)
        sql.sql(
            "CREATE VIEW lang_rollup AS "
            "SELECT lang, count(*) AS n_pages, "
            "sum(length(text)) AS text_bytes "
            "FROM pages GROUP BY lang"
        )
        out = sql.sql("SELECT * FROM lang_rollup")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_CATALOG_VIEW = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta
  ) WHERE rn = 1
),
merged AS (
  SELECT coalesce(d.url, b.url) AS url,
         coalesce(d.text, b.text) AS text,
         coalesce(d.lang, b.lang) AS lang
  FROM base b FULL OUTER JOIN d ON b.url = d.url
)
SELECT lang, count(*) AS n_pages,
       CAST(sum(length(text)) AS BIGINT) AS text_bytes
FROM merged GROUP BY lang
"""


def m_rename_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename-then-merge (schema evolution v2): the url column is renamed
    to page_url AFTER the base files are written (metadata-only — no
    rewrite, asserted), then the SCD1 merge runs keyed on the NEW name
    while every base file still carries the old physical name. The scan
    must be hash-identical to the plain merge: a broken name mapping
    either NULLs the key column (hash mismatch) or double-inserts every
    delta row (row-count mismatch)."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        files_before = {f.path for f in tbl.live_files()}
        tbl.rename_column("url", "page_url")
        assert {f.path for f in tbl.live_files()} == files_before  # no rewrite
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        ).withColumnRenamed("url", "page_url")
        merge_into(tbl, delta, "page_url")
        out = tbl.scan().withColumnRenamed("page_url", "url")
        return _pages_out(out).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_defaults_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-default boundary semantics (Iceberg-v3 ``add_column(
    default=…)``), oracle-pinned: crawl_tier is added with default
    'cc-main' AFTER the base files land (metadata-only — asserted), then
    an SCD1 merge applies a delta that carries EXPLICIT values including
    explicit NULLs. Old-era rows must read the default, merged rows must
    read their stored value (NULL stays NULL, never the default) — a
    broken boundary rule either blankets the default over stored NULLs
    or NULLs the old era, and the value hash catches both."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        files_before = {f.path for f in tbl.live_files()}
        tbl.add_column("crawl_tier", "string", default="cc-main")
        assert {f.path for f in tbl.live_files()} == files_before  # no rewrite
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        ).withColumn(
            "crawl_tier",
            F.when(F.length("url") % 2 == 0, F.lit("news")),  # else explicit NULL
        )
        merge_into(tbl, delta, "url")
        out = tbl.scan()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return out.select(
            "url",
            F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
            F.length("text").alias("text_len"),
            "lang",
            "crawl_tier",
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_DEFAULTS_MERGE = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, text, lang,
         CASE WHEN length(url) % 2 = 0 THEN 'news' END AS crawl_tier
  FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta
  ) WHERE rn = 1
)
SELECT coalesce(d.url, b.url) AS url,
       epoch_us(coalesce(d.warc_ts, b.warc_ts)) AS warc_ts_us,
       length(coalesce(d.text, b.text)) AS text_len,
       coalesce(d.lang, b.lang) AS lang,
       CASE WHEN d.url IS NOT NULL THEN d.crawl_tier ELSE 'cc-main' END
         AS crawl_tier
FROM base b FULL OUTER JOIN d ON b.url = d.url
"""


def m_widen_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type promotion (Iceberg widen rules), oracle-pinned: fetch_status
    lands as INT in the base files, widen_column promotes it to LONG
    (metadata-only — asserted), then the SCD1 merge applies a delta whose
    writer STILL produces the narrow int (align_write_types up-casts at
    write). The scan must read both physical generations — int32 base
    files and int64 merged files — under one widened schema with values
    intact; the oracle states the merged table with the column as
    BIGINT."""
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        status = F.length("url").cast("int").alias("fetch_status")
        tbl = IcehouseTable.create(
            spark, f"{d}/t",
            _read_fixture(spark, "merge_base", 4).select("*", status),
        )
        files_before = {f.path for f in tbl.live_files()}
        tbl.widen_column("fetch_status", "long")
        assert {f.path for f in tbl.live_files()} == files_before  # no rewrite
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4).select("*", status),
            ["url"], "warc_ts",
        )
        merge_into(tbl, delta, "url")
        out = tbl.scan()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return out.select(
            "url",
            F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
            F.length("text").alias("text_len"),
            "lang",
            "fetch_status",
        ).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_WIDEN_MERGE = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta
  ) WHERE rn = 1
)
SELECT coalesce(d.url, b.url) AS url,
       epoch_us(coalesce(d.warc_ts, b.warc_ts)) AS warc_ts_us,
       length(coalesce(d.text, b.text)) AS text_len,
       coalesce(d.lang, b.lang) AS lang,
       CAST(length(coalesce(d.url, b.url)) AS BIGINT) AS fetch_status
FROM base b FULL OUTER JOIN d ON b.url = d.url
"""


def m_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the SQL front end: tag the pre-merge snapshot,
    SQL-MERGE the delta in, then read BACK through
    ``FOR VERSION AS OF '<tag>'`` (sql.py's FROM-item rewrite → a
    snapshot-scoped scan). The result must hash-match the BASE fixture
    alone — rows the merge changed must come back in their pre-merge
    state, proving the rewrite pins the tagged snapshot's file list, not
    current. Iceberg-parity for Spark's ``FOR VERSION AS OF`` clause."""
    from .operators.merge import dedup_latest
    from .sql import IcehouseSQL
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        isql = IcehouseSQL(spark)
        isql.sql(f"ALTER TABLE '{tbl.path}' CREATE TAG pre_merge")
        dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        ).createOrReplaceTempView("m_sql_tt_delta")
        isql.sql(
            f"MERGE INTO '{tbl.path}' AS t USING m_sql_tt_delta AS s "
            f"ON t.url = s.url WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        out = isql.sql(
            f"SELECT url, unix_micros(CAST(warc_ts AS timestamp)) AS warc_ts_us, "
            f"length(text) AS text_len, lang "
            f"FROM '{tbl.path}' FOR VERSION AS OF 'pre_merge'"
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_sql_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident-response flow through SQL: merge a bad delta, then
    ``CALL rollback_to_snapshot`` back to the pre-merge snapshot — the
    scan must be hash-identical to the base fixture (the merge's rows are
    gone from readers but stay in history). Twin of the Python
    ``rollback_to`` tests, driven statement-first like Iceberg's
    ``CALL catalog.system.rollback_to_snapshot``."""
    from .operators.merge import dedup_latest, merge_into
    from .sql import IcehouseSQL
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        pre = tbl.current_snapshot().snapshot_id
        merge_into(
            tbl,
            dedup_latest(
                _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
            ),
            "url",
        )
        IcehouseSQL(spark).sql(
            f"CALL rollback_to_snapshot('{tbl.path}', {pre})"
        )
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def m_cdc_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A downstream replica maintained ONLY from the CDC feed
    (streaming/cdc_apply.py mirror_table: collapse the feed to its net
    effect, merge-apply) must scan hash-identical to the source after a
    create+merge history — the replication contract on top of
    ``changes(cdc=True)``. Same oracle as the direct merge: the mirror
    IS the post-merge state, arrived at incrementally."""
    from .operators.merge import dedup_latest, merge_into
    from .streaming.cdc_apply import mirror_table
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/src", _read_fixture(spark, "merge_base", 4)
        )
        merge_into(
            tbl,
            dedup_latest(
                _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
            ),
            "url",
        )
        mirror_table(spark, f"{d}/src", f"{d}/dst", key_cols="url")
        replica = IcehouseTable(spark, f"{d}/dst")
        return _pages_out(replica.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# the pre-merge table IS the base fixture — time travel / rollback must
# reproduce it byte-for-byte even though the merge rewrote those files
SQL_M_BASE_ONLY = f"""
SELECT {_PAGES_PROJ}
FROM read_parquet('{fixture_path("merge_base")}')
"""


def m_truncate_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RTAS + TRUNCATE + time-travel restore, all through the SQL front
    end. REPLACE TABLE installs the base fixture's English slice (a new,
    narrower schema) as one atomic overwrite; TRUNCATE drops every live
    file in one metadata-only commit (zero bytes moved); INSERT INTO ...
    SELECT ... FOR VERSION AS OF restores the pre-truncate snapshot from
    history; a plain append then lands the deduped recrawl delta. The
    oracle states the expected final multiset relationally: the English
    base slice UNION ALL the latest-wins delta — a truncate that leaves a
    row behind, an RTAS that mis-filters, or a restore that reads the
    wrong snapshot each breaks the value hash."""
    from .operators.merge import dedup_latest
    from .sql import IcehouseSQL
    from .table import IcehouseTable

    d = _fresh_dir()
    try:
        tbl = IcehouseTable.create(
            spark, f"{d}/t", _read_fixture(spark, "merge_base", 4)
        )
        isql = IcehouseSQL(spark)
        tbl.scan().createOrReplaceTempView("m_truncate_src_v")
        isql.sql(
            f"REPLACE TABLE '{tbl.path}' AS "
            f"SELECT url, warc_ts, text, lang FROM m_truncate_src_v "
            f"WHERE lang = 'en'"
        )
        pre = tbl.current_snapshot().snapshot_id
        isql.sql(f"TRUNCATE TABLE '{tbl.path}'")
        if tbl.row_count() != 0:  # metadata-only count; guards the oracle
            raise AssertionError("TRUNCATE left live rows")
        isql.sql(
            f"INSERT INTO '{tbl.path}' "
            f"SELECT * FROM '{tbl.path}' FOR VERSION AS OF {pre}"
        )
        tbl.append(
            dedup_latest(
                _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
            ).select("url", "warc_ts", "text", "lang")
        )
        return _pages_out(tbl.scan()).localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_TRUNCATE_RESTORE = f"""
WITH en AS (
  SELECT url, warc_ts, text, lang
  FROM read_parquet('{fixture_path("merge_base")}')
  WHERE lang = 'en'
),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM read_parquet('{fixture_path("merge_delta")}')
  ) WHERE rn = 1
),
u AS (SELECT * FROM en UNION ALL SELECT * FROM d)
SELECT {_PAGES_PROJ} FROM u
"""


def m_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row lineage end-to-end: stable ``_row_id`` through MERGE, compaction,
    Z-order clustering and a DV delete. The base is written URL-sorted in
    ONE file, so commit-time virtual ids equal the url rank — an id the
    oracle can state relationally (``row_number() OVER (ORDER BY url)-1``).
    The MERGE keeps the TARGET's id on every matched row and draws fresh
    ids (>= 2000, projected to NULL for determinism) for inserts; the
    rewrites MATERIALIZE carried ids; the delete removes rows without
    renumbering survivors. Any id drift — a rewrite renumbering rows, a
    merge taking the source's identity, a delete compacting ids — breaks
    the value hash, not just the row count."""
    from .maintenance import compact, zorder_by
    from .operators.merge import dedup_latest, merge_into
    from .table import IcehouseTable, Predicate, delete_where
    from .table.format import ROW_ID

    d = _fresh_dir()
    try:
        base = _read_fixture(spark, "merge_base", 1).orderBy("url").coalesce(1)
        tbl = IcehouseTable.create(
            spark, f"{d}/t", base, properties={"row-lineage": "true"}
        )
        delta = dedup_latest(_read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts")
        merge_into(tbl, delta, "url")
        compact(tbl, target_file_bytes=8 * 1024 * 1024)
        zorder_by(tbl, curve="morton", target_file_bytes=512 * 1024)
        delete_where(tbl, [
            Predicate("url", ">=", "https://site010"),
            Predicate("url", "<", "https://site020"),
        ])
        out = tbl.scan(row_lineage=True).select(
            "url",
            # base-era ids (< 2000) are deterministic; insert ids depend on
            # commit order only, so project them to NULL for the hash
            F.when(F.col(ROW_ID) < 2000, F.col(ROW_ID)).alias("base_rid"),
            F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
            F.length("text").alias("text_len"),
            "lang",
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_ROW_LINEAGE = f"""
WITH base AS (
  SELECT *, row_number() OVER (ORDER BY url) - 1 AS rid
  FROM read_parquet('{fixture_path("merge_base")}')
),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM read_parquet('{fixture_path("merge_delta")}')
  ) WHERE rn = 1
),
m AS (
  SELECT coalesce(d.url, b.url) AS url,
         b.rid AS base_rid,
         coalesce(d.warc_ts, b.warc_ts) AS warc_ts,
         coalesce(d.text, b.text) AS text,
         coalesce(d.lang, b.lang) AS lang
  FROM base b FULL OUTER JOIN d ON b.url = d.url
)
SELECT url, base_rid, epoch_us(warc_ts) AS warc_ts_us,
       length(text) AS text_len, lang
FROM m
WHERE url < 'https://site010' OR url >= 'https://site020'
"""


def m_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view (table/mview.py): a per-lang rollup MV
    over the pages table follows an SCD1 MERGE and a whole-lang DELETE
    through two INCREMENTAL refreshes — each recomputes only the groups
    the CDC range touched (counted-broadcast key scope) and deletes
    vanished groups. The query RAISES if either refresh silently took the
    full-recompute path, so the oracle pins the incremental maintenance
    itself: a missed affected key, a stale group row, or a surviving
    vanished group all break the value hash. Reference anchor: the gold
    layer's per-run recomputation of daily_sales_summary
    (reference/src/gold/table_notebooks/daily_sales_summary.py) — here
    the same derived table is maintained at O(delta) cost."""
    from .operators.merge import dedup_latest
    from .table import Catalog, Predicate
    from .table.deletes import delete_where

    d = _fresh_dir()
    try:
        cat = Catalog(spark, f"{d}/cat")
        cat.create_table("pages", _read_fixture(spark, "merge_base", 4))
        cat.create_materialized_view(
            "lang_stats",
            "SELECT lang, count(*) AS n_pages, "
            "sum(length(text)) AS text_bytes, max(warc_ts) AS latest_ts "
            "FROM pages GROUP BY lang",
        )
        delta = dedup_latest(
            _read_fixture(spark, "merge_delta", 4), ["url"], "warc_ts"
        )
        with cat.transaction() as txn:
            txn.merge_into("pages", delta, ["url"])
        r1 = cat.refresh_materialized_view("lang_stats")
        delete_where(cat.table("pages"), [Predicate("lang", "=", "ru")])
        cat.refresh("pages")
        r2 = cat.refresh_materialized_view("lang_stats")
        for r in (r1, r2):
            if r["mode"] != "incremental":
                raise RuntimeError(
                    f"materialized-view refresh took the {r['mode']} path — "
                    f"this oracle certifies the INCREMENTAL one"
                )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        out = cat.read("lang_stats").select(
            "lang",
            "n_pages",
            "text_bytes",
            F.unix_micros(F.col("latest_ts").cast("timestamp")).alias(
                "latest_ts_us"
            ),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_M_MV_INCREMENTAL = f"""
WITH base AS (SELECT * FROM read_parquet('{fixture_path("merge_base")}')),
delta AS (SELECT * FROM read_parquet('{fixture_path("merge_delta")}')),
d AS (
  SELECT url, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
    FROM delta
  ) WHERE rn = 1
),
merged AS (
  SELECT coalesce(d.url, b.url) AS url,
         coalesce(d.warc_ts, b.warc_ts) AS warc_ts,
         coalesce(d.text, b.text) AS text,
         coalesce(d.lang, b.lang) AS lang
  FROM base b FULL OUTER JOIN d ON b.url = d.url
)
SELECT lang, count(*) AS n_pages,
       CAST(sum(length(text)) AS BIGINT) AS text_bytes,
       epoch_us(max(warc_ts)) AS latest_ts_us
FROM merged WHERE lang <> 'ru' GROUP BY lang
"""


MAINTENANCE_REGISTRY: dict = {
    "m_row_lineage": (m_row_lineage, SQL_M_ROW_LINEAGE),
    "m_mv_incremental": (m_mv_incremental, SQL_M_MV_INCREMENTAL),
    "m_merge_scd1_pages": (m_merge_scd1_pages, SQL_M_MERGE_SCD1),
    "m_compact_zorder_pruned_scan": (m_compact_zorder_pruned_scan, SQL_M_COMPACT_ZORDER),
    "m_partitioned_scan": (m_partitioned_scan, SQL_M_PARTITIONED_SCAN),
    "m_sort_order_scan": (m_sort_order_scan, SQL_M_SORT_ORDER),
    "m_metadata_delete": (m_metadata_delete, SQL_M_METADATA_DELETE),
    "m_scd2_history_pages": (m_scd2_history_pages, SQL_M_SCD2_HISTORY),
    "m_snapshot_expire": (m_snapshot_expire, SQL_M_SNAPSHOT_EXPIRE),
    "m_delete_vectors_pages": (m_delete_vectors_pages, SQL_M_DELETE_VECTORS),
    "m_incremental_changes": (m_incremental_changes, SQL_M_INCREMENTAL_CHANGES),
    "m_changes_cdc": (m_changes_cdc, SQL_M_CHANGES_CDC),
    # same history read through the DSv2 cdc reader (bucketed Arrow diff)
    "m_dsv2_cdc_scan": (m_dsv2_cdc_scan, SQL_M_CHANGES_CDC),
    # the three round-5 surfaces below must each land the table in exactly
    # the post-SCD1-merge state — one relational oracle pins all of them
    "m_branch_wap_publish": (m_branch_wap_publish, SQL_M_MERGE_SCD1),
    "m_sketch_merge": (m_sketch_merge, SQL_M_MERGE_SCD1),
    "m_cdc_replay": (m_cdc_replay, SQL_M_MERGE_SCD1),
    "m_cdc_mirror": (m_cdc_mirror, SQL_M_MERGE_SCD1),
    "m_sql_merge": (m_sql_merge, SQL_M_MERGE_SCD1),
    "m_sql_time_travel": (m_sql_time_travel, SQL_M_BASE_ONLY),
    "m_sql_rollback": (m_sql_rollback, SQL_M_BASE_ONLY),
    "m_truncate_restore": (m_truncate_restore, SQL_M_TRUNCATE_RESTORE),
    "m_catalog_txn": (m_catalog_txn, SQL_M_CATALOG_TXN),
    "m_catalog_view": (m_catalog_view, SQL_M_CATALOG_VIEW),
    "m_rename_merge_scan": (m_rename_merge_scan, SQL_M_MERGE_SCD1),
    "m_defaults_merge_scan": (m_defaults_merge_scan, SQL_M_DEFAULTS_MERGE),
    "m_widen_merge_scan": (m_widen_merge_scan, SQL_M_WIDEN_MERGE),
}
