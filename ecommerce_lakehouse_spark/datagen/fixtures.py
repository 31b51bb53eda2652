"""Spark-free materialization of the maintenance-oracle fixtures.

The five ``m_*`` maintenance queries (queries_maintenance.py) exercise the
from-scratch table core — MERGE, SCD2, compaction+Z-order, snapshot expiry
and the merge-on-read delete stack — over deterministic synthetic pages.
To hash-check them against DuckDB (instead of the weaker rows-only class)
both engines must read byte-identical INPUTS: this module writes those
inputs once, as plain parquet under a fixed path, using the SAME pure
``_page_batch(idx, seed, revision)`` kernel the Spark generator runs
executor-side — pandas/pyarrow only, so ``oracle_sql()`` can materialize
them without a SparkSession and the DuckDB side can ``read_parquet`` them
regardless of which engine the driver runs first.

Every value is a pure function of (seed, row index); partitioning never
affects content, so the parquet files here equal what
``generate_pages(spark, ...)`` yields row-for-row.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .pages import _page_batch

FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "icehouse_oracle_fixtures_v1")

# name -> list of (lo_idx, hi_idx, seed, revision) ranges, concatenated.
# These mirror the generate_pages/generate_recrawl_delta calls the
# maintenance queries historically ran (queries_maintenance.py).
SPECS: dict[str, list[tuple[int, int, int, int]]] = {
    "merge_base": [(0, 2000, 5, 0)],
    # recrawl delta: 400 recrawls (revision 1) + 200 brand-new urls
    "merge_delta": [(0, 400, 5, 1), (2000, 2200, 5, 0)],
    "cz_base": [(0, 1500, 9, 0)],
    "cz_rev2": [(0, 500, 9, 2)],
    "scd2_base": [(0, 800, 11, 0)],
    "scd2_recrawl": [(0, 300, 11, 1)],
    "exp_a": [(0, 600, 13, 0)],
    "exp_b": [(0, 200, 14, 0)],
}

_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),  # no tz -> Spark TIMESTAMP_NTZ
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")


def ensure_fixtures() -> str:
    """Idempotently materialize all fixtures; returns the fixture dir.

    Written to a temp dir first and atomically renamed, so a concurrent
    caller either sees the complete set or builds its own and loses the
    rename race harmlessly (content is identical by construction).
    """
    if os.path.isdir(FIXTURE_DIR) and os.path.exists(
        os.path.join(FIXTURE_DIR, "_COMPLETE")
    ):
        return FIXTURE_DIR
    tmp = f"{FIXTURE_DIR}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    for name, ranges in SPECS.items():
        pdf = pd.concat(
            [
                _page_batch(np.arange(lo, hi, dtype=np.int64), seed, rev)
                for (lo, hi, seed, rev) in ranges
            ],
            ignore_index=True,
        )
        table = pa.Table.from_pandas(pdf, preserve_index=False).cast(_ARROW_SCHEMA)
        pq.write_table(table, os.path.join(tmp, f"{name}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, FIXTURE_DIR)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race: same content
    return FIXTURE_DIR
