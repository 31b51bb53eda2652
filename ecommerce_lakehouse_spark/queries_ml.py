"""Training-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing — over the driver's documents/embeddings tables, each
with a DuckDB oracle GENERATED from the same constants as the Spark side.

These are first-class engine operators (BASELINE: "the operations a
large-scale training-data pipeline would need"), not demo queries: the Spark
implementations live in functions/{text,dedup,similarity,multimodal}.py and
are reused here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import dedup as D
from .functions import multimodal as M
from .functions import similarity as S
from .functions import text as T


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------------------ text analysis

def q_text_quality(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    m = T.quality_metrics(F.col("text"))
    return docs.select("doc_id", *[v.alias(k) for k, v in m.items()])


_sqm = T.sql_quality_metrics("text")
SQL_TEXT_QUALITY = "SELECT doc_id, " + ", ".join(
    f"{v} AS {k}" for k, v in _sqm.items()
) + " FROM documents"


def q_text_langid(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_pred", T.langid(F.col("text")))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("cnt"), F.sum("n_chars").alias("sum_chars"))
    )


SQL_TEXT_LANGID = f"""
SELECT {T.sql_langid('text')} AS lang_pred, COUNT(*) AS cnt,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fingerprint"),
        T.token_count(F.col("text")).alias("n_tokens"),
    )


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id, {T.sql_fingerprint('text')} AS fingerprint,
       CAST({T.sql_token_count('text')} AS INTEGER) AS n_tokens
FROM documents
"""


# ------------------------------------------------------------------- dedup

def q_exact_dedup(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs, "text", "doc_id")


SQL_EXACT_DEDUP = f"""
SELECT md5({D.sql_normalize_text('text')}) AS content_hash,
       COUNT(*) AS n_docs, MIN(doc_id) AS representative_id
FROM documents GROUP BY 1
"""


def q_minhash_signatures(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", *D.minhash_signature(F.col("text")))


SQL_MINHASH_SIGNATURES = (
    "SELECT doc_id, "
    + ", ".join(D.sql_minhash_signature("text"))
    + " FROM documents"
)


def q_minhash_lsh_pairs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(docs, "text", "doc_id")


def _sql_minhash_lsh_pairs() -> str:
    sig_cols = D.sql_minhash_signature("text")
    n_bands = D.N_PERMS // D.BAND_SIZE
    band_selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(
            f"mh{b * D.BAND_SIZE + j}" for j in range(D.BAND_SIZE)
        )
        band_selects.append(
            f"SELECT doc_id AS __id, {b} AS band, md5({cols}) AS bucket FROM sig"
        )
    return f"""
WITH sig AS (SELECT doc_id, {', '.join(sig_cols)} FROM documents),
exploded AS ({' UNION ALL '.join(band_selects)})
SELECT DISTINCT a.__id AS id_a, b.__id AS id_b
FROM exploded a JOIN exploded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.__id < b.__id
"""


SQL_MINHASH_LSH_PAIRS = _sql_minhash_lsh_pairs()

JACCARD_THRESHOLD = 0.35


def q_ngram_jaccard_pairs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, "text", "doc_id", JACCARD_THRESHOLD)


SQL_NGRAM_JACCARD_PAIRS = D.sql_jaccard_pairs(
    "documents", "text", "doc_id", JACCARD_THRESHOLD
)


def q_simhash(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", D.simhash(F.col("text")).alias("simhash16"))


SQL_SIMHASH = f"SELECT doc_id, {D.sql_simhash('text')} AS simhash16 FROM documents"


COSINE_DUP_THRESHOLD = 0.99


def q_cosine_near_dup(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    return D.cosine_near_dup_pairs(emb, "embedding", "vec_id", COSINE_DUP_THRESHOLD).select(
        "id_a", "id_b"
    )


SQL_COSINE_NEAR_DUP = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      >= {COSINE_DUP_THRESHOLD}
"""


# ------------------------------------------------------- similarity search

ANN_K = 5
ANN_N_QUERIES = 10


def q_ann_bruteforce_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES)
    return S.brute_force_topk(emb, queries, k=ANN_K)


SQL_ANN_BRUTEFORCE_TOPK = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < {ANN_N_QUERIES}),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_dot_product(q.qv, v.e)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.e, v.e)))
           AS cosine
  FROM q JOIN v ON v.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= {ANN_K}
"""


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-cell ANN (deterministic sampled centroids) — rows-only check."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES)
    return S.ivf_ann_topk(emb, queries, k=ANN_K, n_cells=16, n_probe=4)


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN — the scale path; no SQL oracle (signature planes are
    engine-side constants), driver records the rows-only check."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES)
    return S.lsh_ann_topk(emb, queries, n_dims=64, k=ANN_K)


# ------------------------------------------------------------- multimodal

def q_multimodal_metadata(spark, sf_dir):
    """Binary-column metadata without Python: payload = utf8 bytes of text
    (the sandbox's stand-in for an image/audio payload)."""
    docs = t(spark, sf_dir, "documents").withColumn(
        "payload", F.col("text").cast("binary")
    )
    with_md = M.binary_metadata(docs, "payload")
    return with_md.groupBy("media_type").agg(
        F.count("*").alias("n_docs"),
        F.sum("media_size_bytes").alias("total_bytes"),
        F.max("media_size_bytes").alias("max_bytes"),
    )


SQL_MULTIMODAL_METADATA = """
SELECT 'application/octet-stream' AS media_type,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
"""


def q_multimodal_features(spark, sf_dir):
    """mapInPandas feature extraction (deterministic fake decoder) —
    rows-only check (the decoder is an engine-side kernel, not SQL)."""
    docs = t(spark, sf_dir, "documents").withColumn(
        "payload", F.col("text").cast("binary")
    )
    feats = M.extract_features(docs, "payload", ["doc_id"], n_features=16)
    return feats.select(
        "doc_id",
        "media_size_bytes",
        F.size("features").alias("n_features"),
    )


# ---------------------------------------------------------- zorder kernel

def q_morton_codes(spark, sf_dir):
    """The Z-order pandas-UDF kernel, oracle-checked against unrolled
    bit-interleave SQL (16 bits per axis)."""
    from .functions.zorder_kernel import morton_udf

    orders = t(spark, sf_dir, "orders")
    x = F.col("o_orderkey").bitwiseAND(F.lit(0xFFFF))
    y = F.col("o_custkey").bitwiseAND(F.lit(0xFFFF))
    return orders.select(
        "o_orderkey", morton_udf(x, y).alias("morton_code")
    )


def _sql_morton() -> str:
    # every term fully parenthesized: SQL '<<' binds looser than '+'
    xs = " + ".join(
        f"((((o_orderkey & 65535) >> {i}) & 1) << {2 * i})" for i in range(16)
    )
    ys = " + ".join(
        f"((((o_custkey & 65535) >> {i}) & 1) << {2 * i + 1})" for i in range(16)
    )
    return f"SELECT o_orderkey, CAST(({xs}) + ({ys}) AS BIGINT) AS morton_code FROM orders"


SQL_MORTON_CODES = _sql_morton()


def q_approx_distinct(spark, sf_dir):
    """HLL++ sketch aggregation — the documented swap for exact
    countDistinct at 10^12 scale (SURVEY §2.4 A3). Register-merge is
    commutative/associative, so results are deterministic under any
    partitioning → rows-only driver check (no DuckDB oracle: different
    sketch implementation)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count("*").alias("cnt"),
        )
    )


ML_REGISTRY: dict = {
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "text_langid": (q_text_langid, SQL_TEXT_LANGID),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH_SIGNATURES),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH_PAIRS),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS),
    "simhash": (q_simhash, SQL_SIMHASH),
    "cosine_near_dup": (q_cosine_near_dup, SQL_COSINE_NEAR_DUP),
    "ann_bruteforce_topk": (q_ann_bruteforce_topk, SQL_ANN_BRUTEFORCE_TOPK),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "ann_ivf_topk": (q_ann_ivf_topk, None),
    "approx_distinct": (q_approx_distinct, None),
    "multimodal_metadata": (q_multimodal_metadata, SQL_MULTIMODAL_METADATA),
    "multimodal_features": (q_multimodal_features, None),
    "morton_codes": (q_morton_codes, SQL_MORTON_CODES),
}
