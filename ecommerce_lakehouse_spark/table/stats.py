"""Per-data-file column statistics (min/max/null_count) from parquet footers.

Stats power manifest-based file pruning (predicates.py) and the bin-packing
compaction planner. Collection reads only footers, never data pages.

Scale note: at 10^12 docs a table has millions of files, so footer reads are
distributed — the file list becomes a DataFrame and each executor reads its
batch of footers through ``mapInPandas`` (Arrow-batched, one row per FILE,
never per data row). Small batches short-circuit to a driver-side loop to
avoid job-launch overhead.

Values are stored JSON-encodable: timestamps → epoch microseconds (int),
dates → ISO strings, bytes → skipped, strings → 64-char truncated bounds
(upper bounds rounded up so truncation can't cause false pruning).
"""

from __future__ import annotations

import datetime
import os
from decimal import Decimal

import pyarrow.parquet as pq

MAX_BOUND_LEN = 64
DISTRIBUTED_THRESHOLD = 64  # files; below this, read footers on the driver


def _truncate_lower(s: str) -> str:
    return s[:MAX_BOUND_LEN]


def _truncate_upper(s: str) -> str:
    """Truncate an upper bound and round it UP so it stays an upper bound."""
    if len(s) <= MAX_BOUND_LEN:
        return s
    t = s[:MAX_BOUND_LEN]
    for i in range(len(t) - 1, -1, -1):
        cp = ord(t[i])
        if cp < 0x10FFFF:
            return t[:i] + chr(cp + 1)
    return s  # pathological: keep full string


def _norm(v, upper: bool):
    if v is None:
        return None
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return _truncate_upper(v) if upper else _truncate_lower(v)
    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return int((v - epoch).total_seconds() * 1_000_000)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (int, float, bool)):
        return v
    return None


def file_stats(path: str, stats_cols: list[str] | None = None) -> tuple[int, int, dict]:
    """Read one parquet footer → (row_count, size_bytes, {col: {min,max,null_count}})."""
    f = pq.ParquetFile(path)
    md = f.metadata
    agg: dict[str, dict] = {}
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    wanted = set(stats_cols) if stats_cols is not None else None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            name = names[i]
            if wanted is not None and name not in wanted:
                continue
            col = g.column(i)
            st = col.statistics
            entry = agg.setdefault(name, {"min": None, "max": None, "null_count": 0})
            if st is None:
                entry["null_count"] = None
                continue
            if st.null_count is not None and entry["null_count"] is not None:
                entry["null_count"] += st.null_count
            else:
                entry["null_count"] = None
            if st.has_min_max:
                try:
                    lo = _norm(st.min, upper=False)
                    hi = _norm(st.max, upper=True)
                except Exception:
                    # pyarrow can't decode min/max for every physical type
                    # (e.g. INT32-backed decimals raise
                    # ArrowNotImplementedError) — degrade to "no stats",
                    # which pruning treats as always-a-candidate
                    continue
                if lo is not None and (entry["min"] is None or lo < entry["min"]):
                    entry["min"] = lo
                if hi is not None and (entry["max"] is None or hi > entry["max"]):
                    entry["max"] = hi
    return md.num_rows, os.path.getsize(path), agg


def collect_stats(spark, paths: list[str], stats_cols: list[str] | None = None) -> list[dict]:
    """Stats for many files; distributed over executors when the list is big."""
    if len(paths) < DISTRIBUTED_THRESHOLD:
        # driver-side, but not serial: pyarrow releases the GIL during
        # footer I/O, so a small thread pool overlaps the per-file opens
        # (r6 — this loop sits inside every write path's critical section)
        from concurrent.futures import ThreadPoolExecutor

        def one(p: str) -> dict:
            rows, size, stats = file_stats(p, stats_cols)
            return {"path": p, "row_count": rows, "size_bytes": size, "stats": stats}

        if len(paths) <= 2:
            return [one(p) for p in paths]
        with ThreadPoolExecutor(max_workers=min(8, len(paths))) as pool:
            return list(pool.map(one, paths))

    import json

    import pandas as pd

    cols = stats_cols

    def read_footers(batches):
        for pdf in batches:
            recs = []
            for p in pdf["path"]:
                rows, size, stats = file_stats(p, cols)
                recs.append(
                    {
                        "path": p,
                        "row_count": rows,
                        "size_bytes": size,
                        "stats_json": json.dumps(stats),
                    }
                )
            yield pd.DataFrame(recs)

    fdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(2, len(paths) // 32)
    )
    res = fdf.mapInPandas(
        read_footers, "path string, row_count long, size_bytes long, stats_json string"
    ).collect()
    import json as _json

    return [
        {
            "path": r.path,
            "row_count": r.row_count,
            "size_bytes": r.size_bytes,
            "stats": _json.loads(r.stats_json),
        }
        for r in res
    ]
