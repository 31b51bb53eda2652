"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Dot products run
  JVM-side via higher-order ``zip_with`` + ``aggregate`` (no Python). The
  query set is broadcast; candidates stream through one stage.
- LSH-bucketed ANN (random signed projections): the 10^12-scale path — each
  vector gets a b-bit signature from deterministic ±1 hyperplanes; probing
  joins on the signature bucket, so cost is per-bucket, not all-pairs.
  Hyperplane signs derive from md5(plane, dim), so signatures are
  reproducible across runs and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × scan candidates →
    windowed row_number. Returns (query_id, neighbor_id, rank)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ------------------------------------------------------------- LSH (RSP)

def _plane_sign(plane: int, dim: int) -> float:
    """Deterministic ±1 from md5(plane|dim) — reproducible hyperplanes."""
    import hashlib

    h = hashlib.md5(f"{plane}|{dim}".encode()).digest()
    return 1.0 if h[0] % 2 == 0 else -1.0


def signed_projection_signature(
    vec: Column, n_dims: int, n_planes: int = 16
) -> Column:
    """b-bit signature: bit p = sign(Σ_d s(p,d)·v_d) with fixed ±1 planes."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        signs = [ _plane_sign(p, d) for d in range(n_dims) ]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return sig


def signature_bands(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_dims: int,
    n_planes: int,
    band_bits: int,
    out_id: str,
    out_vec: str,
) -> DataFrame:
    """Explode each vector into (band, bucket) rows from its b-bit signature.
    Shared by LSH ANN and LSH near-dup — the band equi-join is what replaces
    all-pairs products at scale."""
    sig = signed_projection_signature(F.col(vec_col), n_dims, n_planes)
    d = df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec), sig.alias("sig")
    )
    n_bands = max(1, n_planes // band_bits)
    mask = (1 << band_bits) - 1
    bands = [
        d.select(
            out_id,
            out_vec,
            F.lit(b).alias("band"),
            F.shiftright(F.col("sig"), b * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("bucket"),
        )
        for b in range(n_bands)
    ]
    out = bands[0]
    for x in bands[1:]:
        out = out.unionByName(x)
    return out


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_dims: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 12,
    band_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 signature band with the query,
    then exact cosine re-rank within candidates only.

    At scale the band join replaces the all-pairs product with per-bucket
    work; recall is tuned by n_planes/band_bits (more bands → higher recall).
    """
    from pyspark.sql.window import Window

    qb = signature_bands(
        queries, id_col, vec_col, n_dims, n_planes, band_bits, "query_id", "qv"
    )
    cb = signature_bands(
        vectors, id_col, vec_col, n_dims, n_planes, band_bits, "neighbor_id", "cv"
    )
    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine_expr(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ------------------------------------------------------- SQL mirrors (LSH)

SQL_COSINE = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def sql_cosine(a: str, b: str) -> str:
    return SQL_COSINE.format(a=a, b=b)


def sql_signature(vec_expr: str, n_dims: int, n_planes: int) -> str:
    """DuckDB expression computing the SAME b-bit signature as
    signed_projection_signature: the ±1 hyperplanes are md5-derived
    constants, so they embed as literal arrays; list_dot_product and
    Spark's zip_with+aggregate both fold left-to-right in double precision,
    so the sign tests agree bit-for-bit."""
    terms = []
    for p in range(n_planes):
        signs = [_plane_sign(p, d) for d in range(n_dims)]
        arr = "[" + ", ".join(f"{s:.1f}" for s in signs) + "]"
        proj = f"list_dot_product({vec_expr}, {arr})"
        terms.append(
            f"CASE WHEN {proj} > 0 THEN CAST({1 << p} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def sql_band_values(n_planes: int, band_bits: int) -> str:
    """VALUES list enumerating band indices: (VALUES (0),(1),...) b(band)."""
    n_bands = max(1, n_planes // band_bits)
    return "(VALUES " + ", ".join(f"({b})" for b in range(n_bands)) + ") b(band)"


# ------------------------------------------------------------------- IVF

def ivf_assign(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer with DETERMINISTIC centroids: every
    (count/n_cells)-th vector by id is a centroid (a seeded sample; k-means
    refinement is an optional extra pass, not needed for correctness).

    Returns (centroids(cell_id, cv), assignments(id, cell_id)) — the inverted
    file. Assignment = argmax cosine against broadcast centroids: one scan of
    the corpus, no shuffle of the big side; at 10^12 docs this is the same
    shape as the production FAISS-style build (centroids always fit in a
    broadcast).
    """
    from pyspark.sql.window import Window

    n = vectors.count()
    stride = max(1, n // n_cells)
    centroids = (
        vectors.filter((F.col(id_col) % stride == 0) & (F.col(id_col) / stride < n_cells))
        .select(
            (F.col(id_col) / stride).cast("int").alias("cell_id"),
            F.col(vec_col).alias("cv"),
        )
    )
    scored = vectors.select(F.col(id_col), F.col(vec_col)).join(
        F.broadcast(centroids)
    ).withColumn("sim", cosine_expr(F.col(vec_col), F.col("cv")))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell_id"))
    assignments = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "cell_id")
    )
    return centroids, assignments


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search: route each query to its n_probe nearest cells, exact
    cosine re-rank only within those cells' posting lists.

    Scale path: the corpus is scanned once at build; each query touches
    ~n_probe/n_cells of the data. Returns (query_id, neighbor_id, rank).
    """
    from pyspark.sql.window import Window

    centroids, assignments = ivf_assign(vectors, n_cells, vec_col, id_col)
    inverted = vectors.join(assignments, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell_id"
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = q.join(F.broadcast(centroids.withColumnRenamed("cv", "cent"))).withColumn(
        "sim", cosine_expr(F.col("qv"), F.col("cent"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell_id"))
    probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )

    cand = probes.join(inverted, "cell_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine", cosine_expr(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
