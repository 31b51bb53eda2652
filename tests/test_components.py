"""Connected-components dedup clustering: pairs → clusters → survivors.

The pair generators (LSH/Jaccard) are tested in test_similarity.py; here we
test the clustering step itself on planted graphs — chain-shaped components
(worst case for label propagation: one hop per round), multiple components,
singletons, the convergence guard, and survivor policy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.functions.dedup import (
    connected_components,
    dedup_survivors,
)


def _pairs(spark, edges):
    if not edges:
        return spark.createDataFrame([], "id_a long, id_b long")
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def test_chain_and_second_component(spark):
    """A 5-node chain needs label 1 to walk 4 hops — exercises the
    multi-round fixpoint, not just the one-round clique case LSH emits."""
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_edge_order_and_direction_irrelevant(spark):
    """Edges arrive in arbitrary order/orientation from a distinct() join —
    the component labeling must not depend on either."""
    a = connected_components(_pairs(spark, [(5, 4), (2, 1), (4, 3), (3, 2)]))
    b = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_empty_pairs(spark):
    out = connected_components(_pairs(spark, []))
    assert out.count() == 0
    assert set(out.columns) == {"node", "cluster_id"}


def test_convergence_guard_raises(spark):
    """Partial clustering must be loud: a chain that cannot converge within
    the iteration budget raises instead of returning under-merged labels."""
    chain = [(i, i + 1) for i in range(1, 8)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iterations=2)


def test_survivors_keep_best_copy(spark):
    """One survivor per cluster, highest quality wins, ties to min id,
    singletons pass through as their own cluster of 1."""
    docs = spark.createDataFrame(
        [
            (1, 100),  # cluster {1,2,3}: doc 2 is the longest copy
            (2, 300),
            (3, 200),
            (7, 50),   # cluster {7,8}: tie on quality → min id 7
            (8, 50),
            (9, 10),   # singleton
        ],
        ["doc_id", "n_chars"],
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8)])
    got = {
        r.doc_id: (r.cluster_id, r.n_docs)
        for r in dedup_survivors(docs, pairs, "doc_id", "n_chars").collect()
    }
    assert got == {2: (1, 3), 7: (7, 2), 9: (9, 1)}


def test_survivors_min_id_policy_and_corpus_size(spark):
    """quality_col=None = min-id policy; survivor count == cluster count."""
    docs = spark.createDataFrame(
        [(i, 1) for i in range(20)], ["doc_id", "n_chars"]
    )
    # two cliques {0..4} and {10..13}, rest singletons
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    surv = dedup_survivors(docs, _pairs(spark, edges), "doc_id")
    rows = surv.collect()
    assert len(rows) == 20 - 4 - 3  # 13 clusters
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].n_docs == 5 and by_id[0].cluster_id == 0
    assert by_id[10].n_docs == 4 and by_id[10].cluster_id == 10
    assert sum(r.n_docs for r in rows) == 20  # partition of the corpus
