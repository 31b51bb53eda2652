"""Deterministic Common-Crawl-style web-pages generator.

Mirrors the reference's generator strategy (historical base + incremental
deltas with attribute mutations — ``data-generator/generate_customers.py:104-116,
190-208``) but re-targeted at the engine's primary input
(``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``)
per BASELINE.json input_hint, with the hot-prefix skew the reference's
uniform ``random.choice`` lacks (skew is what the salted MERGE must handle).

Every value is a pure function of (seed, row index), so generation is
deterministic under ANY partitioning — the datagen analog of the reference's
idempotent md5 keys. Rows are produced executor-side via ``mapInPandas``
(Arrow batches, numpy vectorized); nothing is collected on the driver, so the
same code generates 10^12 rows on a cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

PAGES_SCHEMA = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"

# Zipf-ish domain popularity: domain 0 owns ~30% of pages (hot prefix).
N_DOMAINS = 50
LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh", "ru", "pt"]
WORDS = (
    "crawl web page index rank query data table merge snapshot manifest "
    "compact cluster order hilbert morton spark shuffle partition skew salt "
    "lake house bronze silver gold stream batch session event click view"
).split()
BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed epoch anchor


def _mix(idx: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Deterministic 64-bit mix of row index (splitmix64-style)."""
    k = (seed * 0x9E3779B97F4A7C15 + salt) & 0xFFFFFFFFFFFFFFFF
    z = idx.astype(np.uint64) + np.uint64(k)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _domain_of(idx: np.ndarray, seed: int) -> np.ndarray:
    """Skewed domain assignment: p(domain k) ∝ 1/(k+2)."""
    h = _mix(idx, 1, seed).astype(np.float64) / 2**64
    ranks = np.arange(N_DOMAINS, dtype=np.float64)
    weights = 1.0 / (ranks + 1.0) ** 1.5
    cdf = np.cumsum(weights / weights.sum())
    return np.searchsorted(cdf, h).clip(0, N_DOMAINS - 1)


def _page_batch(idx: np.ndarray, seed: int, revision: int) -> pd.DataFrame:
    dom = _domain_of(idx, seed)
    h2 = _mix(idx, 2, seed)
    h3 = _mix(idx, 3 + revision, seed)
    urls = [f"https://site{d:03d}.example.com/p/{i}" for d, i in zip(dom, idx)]
    # crawl time: base + up to ~30 days of spread + revision bump of 35 days
    ts_us = BASE_TS_US + (h2 % np.uint64(30 * 86400)) * np.uint64(1_000_000) + np.uint64(
        revision * 35 * 86400 * 1_000_000
    )
    langs = [LANGS[int(x % len(LANGS))] for x in _mix(idx, 4, seed)]
    htmls, texts = [], []
    for i, hv in zip(idx, h3):
        n_words = 20 + int(hv % 180)
        rng = np.random.RandomState((int(hv) ^ int(i)) % (2**31))
        body = " ".join(WORDS[j] for j in rng.randint(0, len(WORDS), n_words))
        if revision:
            body = f"rev{revision} " + body
        title = f"Page {int(i)} of domain {urls[len(htmls)].split('.')[0]}"
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode("utf-8")
        htmls.append(html)
        texts.append(extract_text_bytes(html))
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts_us.astype(np.int64), unit="us"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def extract_text_bytes(html: bytes) -> str:
    """THE deterministic extraction: title + body text, single-spaced.

    Shared by the generator and the engine's ``extract_text_udf`` so the
    per-url byte-identical-text invariant (BASELINE input_hint) is testable.
    """
    s = html.decode("utf-8", errors="replace")
    out = []
    in_tag = False
    for ch in s:
        if ch == "<":
            in_tag = True
        elif ch == ">":
            in_tag = False
            out.append(" ")
        elif not in_tag:
            out.append(ch)
    return " ".join("".join(out).split())


def extract_text_udf():
    """Vectorized (Arrow) html→text extraction — the engine's only Python
    compute kernel besides the Z-order codes; never per-row ``F.udf``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_text_bytes(bytes(b)) if b is not None else None)

    return _extract


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int = 8, revision: int = 0
) -> DataFrame:
    """n synthetic pages, executor-side, deterministic in (seed, n)."""

    def gen(batches):
        for pdf in batches:
            yield _page_batch(pdf["id"].to_numpy(), seed, revision)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def generate_recrawl_delta(
    spark: SparkSession,
    base_n: int,
    n_new: int,
    n_recrawl: int,
    seed: int = 42,
    partitions: int = 8,
) -> DataFrame:
    """Incremental crawl batch: recrawls of existing urls (mutated html/text,
    newer warc_ts — the SCD2 history case) ∪ brand-new urls (inserts)."""
    recrawl = generate_pages(spark, n_recrawl, seed=seed, partitions=partitions, revision=1)
    new = (
        spark.range(base_n, base_n + n_new, 1, partitions)
        .mapInPandas(
            lambda batches: (
                _page_batch(pdf["id"].to_numpy(), seed, 0) for pdf in batches
            ),
            PAGES_SCHEMA,
        )
    )
    return recrawl.unionByName(new)


def with_extracted_text(df: DataFrame) -> DataFrame:
    """Recompute ``text`` from ``html`` with the vectorized kernel."""
    return df.withColumn("text", extract_text_udf()(F.col("html")))
