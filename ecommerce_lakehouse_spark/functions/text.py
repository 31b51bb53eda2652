"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, n-gram language ID, document fingerprinting.

Everything is built-in Spark expressions (JVM, whole-stage codegen) — higher-
order functions over split arrays, never Python row loops. Each operator has
a matching DuckDB SQL generator built from the SAME constants, so the driver
oracle and the Spark implementation cannot drift apart.

Scale notes: all ops are embarrassingly parallel per row (no shuffle); at
100 TB the scan dominates, so these stay in the same stage as the parquet
read (verified: WholeStageCodegen spans the whole pipeline, no exchanges).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared constants — drive BOTH the Spark expressions and the SQL oracles.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic argmax tie-break
SHINGLE_N = 3


# ------------------------------------------------------------------ tokens

def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (BPE-ish regex split)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")


def sql_tokens(expr: str) -> str:
    return f"list_filter(string_split_regex(trim({expr}), '\\s+'), x -> x <> '')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def sql_token_count(expr: str) -> str:
    return f"len({sql_tokens(expr)})"


# ----------------------------------------------------------------- quality

def quality_metrics(col: Column) -> dict[str, Column]:
    """Length/stopword/character-class heuristics (C4/Gopher-style filters)."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop_list = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop_list)))
    n_alpha = F.length(F.regexp_replace(col, r"[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    safe_tok = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(None))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(None))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": (n_chars - (n_tok - 1)).cast("double") / safe_tok,
        "stopword_ratio": n_stop.cast("double") / safe_tok,
        "alpha_ratio": n_alpha.cast("double") / safe_chars,
        "digit_ratio": n_digit.cast("double") / safe_chars,
    }


def sql_quality_metrics(expr: str) -> dict[str, str]:
    toks = sql_tokens(expr)
    stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return {
        "n_chars": f"CAST(length({expr}) AS BIGINT)",
        "n_tokens": f"CAST(len({toks}) AS BIGINT)",
        "avg_token_len": (
            f"CAST(length({expr}) - (len({toks}) - 1) AS DOUBLE)"
            f" / CASE WHEN len({toks}) > 0 THEN CAST(len({toks}) AS DOUBLE) END"
        ),
        "stopword_ratio": (
            f"CAST(len(list_filter({toks}, t -> t IN ({stop}))) AS DOUBLE)"
            f" / CASE WHEN len({toks}) > 0 THEN CAST(len({toks}) AS DOUBLE) END"
        ),
        "alpha_ratio": (
            f"CAST(length(regexp_replace({expr}, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
            f" / CASE WHEN length({expr}) > 0 THEN CAST(length({expr}) AS DOUBLE) END"
        ),
        "digit_ratio": (
            f"CAST(length(regexp_replace({expr}, '[^0-9]', '', 'g')) AS DOUBLE)"
            f" / CASE WHEN length({expr}) > 0 THEN CAST(length({expr}) AS DOUBLE) END"
        ),
    }


# ------------------------------------------------------------ language ID

def langid(col: Column) -> Column:
    """Stopword-profile language ID: argmax of per-language hit counts with a
    fixed tie-break order; 'und' (undetermined) when no profile hits."""
    toks = tokens(col)

    def _hits(ws):  # closure factory: a default arg would add a 2nd lambda
        return lambda t: t.isin(*ws)  # param that F.filter binds to the index

    scores = {
        lang: F.size(F.filter(toks, _hits(ws))) for lang, ws in STOPWORDS.items()
    }
    greatest = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    # built in reverse → the CASE checks languages in LANG_ORDER priority
    for lang in reversed(LANG_ORDER):
        expr = F.when(
            (scores[lang] > 0) & (scores[lang] == greatest), F.lit(lang)
        ).otherwise(expr)
    return expr


def sql_langid(expr: str) -> str:
    toks = sql_tokens(expr)
    score = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(chr(39) + w + chr(39) for w in ws)})))"
        for lang, ws in STOPWORDS.items()
    }
    # same semantics: first language (in LANG_ORDER) with the max positive score
    greatest = f"greatest({', '.join(score[lang] for lang in LANG_ORDER)})"
    whens = " ".join(
        f"WHEN {score[lang]} > 0 AND {score[lang]} = {greatest} THEN '{lang}'"
        for lang in LANG_ORDER
    )
    return f"CASE {whens} ELSE 'und' END"


# ------------------------------------------------------- fingerprinting

def shingles(col: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles (deduplicated) via higher-order functions."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def sql_shingles(expr: str, n: int = SHINGLE_N) -> str:
    toks = sql_tokens(expr)
    parts = " || ' ' || ".join(f"{toks}[i + {j + 1}]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(0, len({toks}) - {n} + 1), i -> {parts}) "
        f"ELSE [array_to_string({toks}, ' ')] END)"
    )


def fingerprint(col: Column, n: int = SHINGLE_N) -> Column:
    """Document fingerprint: lexicographic-min shingle hash (the winnowing /
    rolling-hash family, expressed with an order-independent min)."""
    return F.array_min(F.transform(shingles(col, n), F.md5))


def sql_fingerprint(expr: str, n: int = SHINGLE_N) -> str:
    return f"list_min(list_transform({sql_shingles(expr, n)}, s -> md5(s)))"
