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
