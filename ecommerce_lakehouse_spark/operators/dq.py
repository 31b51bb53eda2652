"""Data-quality gate — enforcement of the reference's declared-but-unbuilt
``dq_rules`` (``src/utils/03_silver_metadata_setup.py:54,127``; BRD AC-004:
"pipeline fails when >1% nulls on order_id").

Rules evaluate in ONE aggregation pass over the batch (no per-rule scans) and
raise ``DQViolation`` on failure, which composes with the pipeline's
fail-stop semantics (C5): a failed gate aborts the transform and the
watermark is never advanced, so the bad batch is retried after repair.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DQViolation(Exception):
    def __init__(self, failures: list[dict]):
        self.failures = failures
        super().__init__(
            "; ".join(
                f"{f['rule']}({f['column']}): {f['observed']} > {f['threshold']}"
                if f["rule"] != "min_rows"
                else f"min_rows: {f['observed']} < {f['threshold']}"
                for f in failures
            )
        )


@dataclass(frozen=True)
class DQRule:
    """rule ∈ {max_null_ratio, max_duplicate_ratio, min_rows, not_negative}."""

    rule: str
    column: str | None = None
    threshold: float = 0.01


def check(df: DataFrame, rules: list[DQRule]) -> list[dict]:
    """Evaluate all rules in one agg job; return failure records (empty=pass)."""
    aggs = [F.count("*").alias("__n")]
    for i, r in enumerate(rules):
        if r.rule == "max_null_ratio":
            aggs.append(
                F.sum(F.when(F.col(r.column).isNull(), 1).otherwise(0)).alias(f"__a{i}")
            )
        elif r.rule == "max_duplicate_ratio":
            aggs.append(F.count_distinct(F.col(r.column)).alias(f"__a{i}"))
        elif r.rule == "not_negative":
            aggs.append(
                F.sum(F.when(F.col(r.column) < 0, 1).otherwise(0)).alias(f"__a{i}")
            )
        elif r.rule == "min_rows":
            aggs.append(F.count("*").alias(f"__a{i}"))
        else:
            raise ValueError(f"unknown dq rule {r.rule!r}")
    row = df.agg(*aggs).first()
    n = row["__n"] or 0
    failures = []
    for i, r in enumerate(rules):
        v = row[f"__a{i}"] or 0
        if r.rule == "max_null_ratio":
            observed = (v / n) if n else 0.0
            ok = observed <= r.threshold
        elif r.rule == "max_duplicate_ratio":
            observed = (1 - v / n) if n else 0.0
            ok = observed <= r.threshold
        elif r.rule == "not_negative":
            observed = (v / n) if n else 0.0
            ok = observed <= r.threshold
        else:  # min_rows
            observed = n
            ok = n >= r.threshold
        if not ok:
            failures.append(
                {
                    "rule": r.rule,
                    "column": r.column,
                    "observed": round(float(observed), 6),
                    "threshold": r.threshold,
                }
            )
    return failures


def enforce(df: DataFrame, rules: list[DQRule]) -> DataFrame:
    """Raise DQViolation if any rule fails; pass the DataFrame through."""
    failures = check(df, rules)
    if failures:
        raise DQViolation(failures)
    return df
