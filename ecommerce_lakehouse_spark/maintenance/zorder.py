"""Z-order / Hilbert clustering rewrite (the reference's unbuilt
OPTIMIZE ... ZORDER BY — ``PROGRESS.md:163``, BRD FR-011 "liquid clustering").

Pipeline (BASELINE north_star, stage by stage):

1. JVM-side coordinates: ``xxhash64(url)`` masked to 31 bits (stays in
   whole-stage codegen) × ``warc_ts`` min-max-scaled to 31 bits using the
   TABLE'S OWN MANIFEST STATS for the bounds (no extra scan).
2. Vectorized pandas/Arrow UDF interleaves the two coordinate arrays into a
   62-bit Morton or Hilbert code (functions/zorder_kernel.py) — the only
   Python in the job, and it's numpy-vectorized.
3. ``repartitionByRange(n, code)`` range-shuffles rows into N output files of
   ≈ target size, ``sortWithinPartitions(code)`` orders inside each file so
   parquet row-group stats are tight too.
4. Copy-on-write commit replaces the clustered files; per-file min/max of
   BOTH axes land in the manifests, so subsequent scans prune on either
   dimension (url ranges AND time ranges).

At cluster scale the range shuffle is the dominant cost; AQE handles skewed
code ranges (a hot domain's pages share url-hash prefixes, but the 31-bit
hash spreads them; residual skew is handled by range-partition boundaries
computed from a sample, which is exactly what repartitionByRange does).

Scoping (round 2): a DAILY OPTIMIZE...ZORDER at 10^12 docs cannot rewrite the
whole table — Iceberg's ``rewriteDataFiles`` takes a file filter for exactly
this reason. ``scope="incremental"`` clusters only files added after the last
``cluster-*`` snapshot (tracked via each DataFile's ``added_by`` lineage);
``predicates=[...]`` restricts to files whose stats overlap a predicate
(e.g. one day's partition). Both leave previously-clustered files untouched,
so daily maintenance cost is O(new data), not O(table). Full-table and pruned
scan results are unchanged — clustering only relocates rows between files.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ..functions.zorder_kernel import (
    bits_for_dims,
    coordn,
    hilbert_k_udf,
    hilbert_udf,
    morton_col,
    morton_k_udf,
    url_hash31,
    url_prefix31,
)
from ..table.format import DataFile, IcehouseTable, Snapshot
from ..table.predicates import Predicate, prune_files

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _bounds_from_stats(files: list[DataFile], col: str) -> tuple:
    """min/max of a column across the given files, from manifest stats."""
    lo, hi = None, None
    for f in files:
        st = f.stats.get(col)
        if not st:
            continue
        if st.get("min") is not None:
            lo = st["min"] if lo is None else min(lo, st["min"])
        if st.get("max") is not None:
            hi = st["max"] if hi is None else max(hi, st["max"])
    if lo is None or hi is None:
        raise ValueError(f"no stats for {col}; cannot scale coordinates")
    return lo, hi


def _ts_bounds_from_stats(
    files: list[DataFile], ts_col: str
) -> tuple[int, int]:
    """min/max epoch-us of ts_col across the given files, from manifests."""
    return _bounds_from_stats(files, ts_col)


def last_cluster_snapshot_id(
    table: IcehouseTable, spec_id: int | None = None
) -> int | None:
    """Most recent ``cluster-*`` snapshot id, or None if never clustered.

    ``spec_id`` restricts to cluster snapshots committed UNDER that spec
    generation (summary ``cluster_spec_id``; pre-spec-tracking snapshots
    count as generation 0) — after :meth:`set_cluster_spec` evolves the
    spec, old-generation rewrites no longer count as "clustered"."""
    ids = [
        s.snapshot_id
        for s in table.snapshots()
        if s.operation.startswith("cluster-")
        and (
            spec_id is None
            or int(s.summary.get("cluster_spec_id", 0)) == spec_id
        )
    ]
    return max(ids, default=None)


def _scoped_files(
    table: IcehouseTable,
    scope: str,
    predicates: list[Predicate] | None,
    snapshot=None,
    spec_id: int | None = None,
) -> list[DataFile]:
    files = table.live_files(snapshot)
    if scope == "incremental":
        last = last_cluster_snapshot_id(table, spec_id=spec_id)
        if last is not None:
            # Files written by the clustering snapshot itself carry
            # added_by == last; only strictly-later lineage is unclustered.
            files = [f for f in files if (f.added_by or 0) > last]
    elif scope != "full":
        raise ValueError(f"unknown scope {scope!r}")
    if predicates:
        files = prune_files(files, IcehouseTable._stats_predicates(predicates))
    return files


def zorder_by(
    table: IcehouseTable,
    url_col: str | None = None,
    ts_col: str | None = None,
    curve: str | None = None,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    snapshot_scope: list | None = None,
    url_coord: str | None = None,
    scope: str = "full",
    predicates: list[Predicate] | None = None,
    extra_cols: list[str] | None = None,
    branch: str | None = None,
) -> Snapshot | None:
    """Rewrite the scoped file set clustered by curve(url-coord, warc_ts,
    *extra_cols).

    url_coord="hash" (default, BASELINE spec): xxhash64 coordinate —
    key-equality locality for MERGE. url_coord="prefix": lexicographic
    4-byte coordinate — url-RANGE predicates prune post-cluster too.

    ``extra_cols`` adds clustering dimensions beyond (url, ts) — e.g. lang —
    via the k-dim Morton/Hilbert kernels (63//k bits per axis): string
    dimensions use an xxhash64 coordinate, numeric/timestamp dimensions are
    min-max scaled from manifest stats. Per-file min/max of EVERY clustered
    axis lands in the manifests, so scans prune on any of them.

    scope="full" rewrites every live file (round-1 behavior);
    scope="incremental" rewrites only files added since the last cluster-*
    snapshot OF THE CURRENT SPEC GENERATION; ``predicates`` further
    restricts to stats-overlapping files. Returns None (no commit) when
    the scope selects nothing.

    Every explicit parameter left as None defaults from the table's
    clustering spec (``set_cluster_spec`` → ``cluster.*`` properties);
    after a spec evolution the first incremental run re-clusters
    everything under the new spec, then incremental is O(new data) again.
    """
    spec = table.cluster_spec()
    spec_id = spec["spec_id"]
    curve = curve if curve is not None else spec.get("curve", "morton")
    url_col = url_col if url_col is not None else spec.get("url_col", "url")
    ts_col = ts_col if ts_col is not None else spec.get("ts_col", "warc_ts")
    url_coord = (
        url_coord if url_coord is not None else spec.get("url_coord", "hash")
    )
    extra_cols = (
        extra_cols if extra_cols is not None else spec.get("extra_cols") or None
    )
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    if url_coord not in ("hash", "prefix"):
        raise ValueError(f"unknown url_coord {url_coord!r}")
    n_dims = 2 + len(extra_cols or [])
    bits = bits_for_dims(n_dims)
    if n_dims == 2:
        # 2-D Morton runs as a pure JVM expression (zorder_kernel.morton_col,
        # bit-identical to the pandas kernel): no Python boundary, and the
        # range-partitioner's sampling pass re-evaluates the code for free
        # instead of paying a second Arrow round-trip (r6, guide §4.1)
        kernel = morton_col if curve == "morton" else hilbert_udf
    else:
        kernel = morton_k_udf if curve == "morton" else hilbert_k_udf

    base_snap = (
        table._resolve_snapshot(branch) if branch is not None
        else table.current_snapshot()
    )
    if branch is not None and scope != "full":
        raise ValueError("branch clustering supports scope='full' only")
    files = _scoped_files(
        table, scope, predicates, snapshot=base_snap, spec_id=spec_id
    )
    if not files:
        return None
    total_bytes = sum(f.size_bytes for f in files)
    n_out = max(1, (total_bytes + target_file_bytes - 1) // target_file_bytes)

    # Coordinate scale bounds come from the SCOPED files only: codes are
    # transient (recomputed per rewrite, never persisted), so each rewrite
    # may use the tightest bounds available — more interleave bits carry
    # information, and file min/max stats stay exact either way.
    # DV-applied read pinned to the planning snapshot: clustering
    # materializes positional deletes (commit aborts on newer ones).
    # Row lineage: carried _row_id values ride into the rewritten files
    # as a physical column (same rule as compaction).
    df = table.read_files(
        files, snapshot=base_snap, with_row_id=table.row_lineage_enabled()
    )
    try:
        lo_us, hi_us = _ts_bounds_from_stats(files, ts_col)
    except ValueError:
        # stats-less scoped subset (e.g. files from legacy manifests, made
        # likelier by incremental/predicate scoping): fall back to one agg
        # over the data we're about to rewrite anyway (ADVICE r02)
        b = df.agg(
            F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("lo"),
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("hi"),
        ).first()
        if b["lo"] is None or b["hi"] is None:
            raise ValueError(
                f"cannot scale coordinates: {ts_col} is all-NULL in the "
                f"scoped files and manifests carry no stats for it"
            ) from None
        lo_us, hi_us = b["lo"], b["hi"]
    epoch = datetime.datetime(1970, 1, 1)
    lo = epoch + datetime.timedelta(microseconds=lo_us)
    hi = epoch + datetime.timedelta(microseconds=hi_us)
    if url_coord == "hash":
        x = (
            url_hash31(F.col(url_col))
            if n_dims == 2
            else coordn(F.xxhash64(F.col(url_col)), bits)
        )
    else:
        # lexicographic coordinate: skip the scoped-set common url prefix
        # (from manifest stats — 'https://…' carries zero information)
        lo_s, hi_s = None, None
        for f in files:
            st = f.stats.get(url_col) or {}
            if st.get("min") is not None:
                lo_s = st["min"] if lo_s is None else min(lo_s, st["min"])
            if st.get("max") is not None:
                hi_s = st["max"] if hi_s is None else max(hi_s, st["max"])
        lcp = 0
        if lo_s and hi_s:
            for a, b in zip(lo_s, hi_s):
                if a != b:
                    break
                lcp += 1

        def _first4_int(u: str) -> int:
            b = u.encode("utf-8")[lcp : lcp + 4].ljust(4, b"\x00")
            return int.from_bytes(b, "big") >> 1

        lo_i = _first4_int(lo_s) if lo_s else 0
        hi_i = _first4_int(hi_s) if hi_s else (1 << 31) - 1
        # min-max scale: ASCII urls occupy a narrow byte band, so without
        # scaling the top interleave bits carry no information
        x = coordn(
            url_prefix31(F.col(url_col), skip_common_prefix=lcp),
            bits, lo=F.lit(lo_i), hi=F.lit(hi_i),
        )
    y = coordn(
        F.unix_micros(F.col(ts_col).cast("timestamp")),
        bits,
        lo=F.unix_micros(F.lit(lo).cast("timestamp")),
        hi=F.unix_micros(F.lit(hi).cast("timestamp")),
    )
    extra_coords = []
    schema = table.schema()
    for c in extra_cols or []:
        dtype = schema[c].dataType.typeName()
        if dtype == "string":
            extra_coords.append(coordn(F.xxhash64(F.col(c)), bits))
            continue
        try:
            c_lo, c_hi = _bounds_from_stats(files, c)
        except ValueError:
            extra_coords.append(coordn(F.xxhash64(F.col(c)), bits))
            continue
        if dtype.startswith("timestamp"):
            c_lo_col = F.lit(epoch + datetime.timedelta(microseconds=c_lo)).cast("timestamp")
            c_hi_col = F.lit(epoch + datetime.timedelta(microseconds=c_hi)).cast("timestamp")
            extra_coords.append(coordn(
                F.unix_micros(F.col(c).cast("timestamp")), bits,
                lo=F.unix_micros(c_lo_col), hi=F.unix_micros(c_hi_col),
            ))
        elif dtype == "date":
            # manifest stats store dates as ISO strings (table/stats._norm);
            # the generic numeric branch would cast them to NULL doubles and
            # fillna(0) would silently collapse this clustering axis
            # (ADVICE r03). Scale on days-since-epoch instead.
            try:
                lo_d = datetime.date.fromisoformat(str(c_lo))
                hi_d = datetime.date.fromisoformat(str(c_hi))
            except ValueError:
                extra_coords.append(coordn(F.xxhash64(F.col(c)), bits))
                continue
            extra_coords.append(coordn(
                F.unix_date(F.col(c)), bits,
                lo=F.lit((lo_d - datetime.date(1970, 1, 1)).days),
                hi=F.lit((hi_d - datetime.date(1970, 1, 1)).days),
            ))
        elif isinstance(c_lo, (int, float)) and isinstance(c_hi, (int, float)) \
                and not isinstance(c_lo, bool) and not isinstance(c_hi, bool):
            extra_coords.append(
                coordn(F.col(c), bits, lo=F.lit(c_lo), hi=F.lit(c_hi))
            )
        else:
            # non-numeric stats bounds on a non-string column: fall back to
            # the hash coordinate rather than a constant axis
            extra_coords.append(coordn(F.xxhash64(F.col(c)), bits))
    coded = df.withColumn("__zcode", kernel(x, y, *extra_coords))
    # staging range-partitions + sorts on the transient code (and composes
    # with the bucket layout when the table has one: files come out
    # (bucket, zcode-range)-sliced, so bucket tags AND tight ts bounds
    # coexist — see IcehouseTable._stage_dataframe)
    return table.replace_files(
        [f.path for f in files],
        coded,
        operation=f"cluster-{curve}",
        target_partitions=n_out,
        cluster_by=["__zcode"],
        branch=branch,
        base_delete_registry=table.delete_registry_full(base_snap),
        extra_summary={
            "cluster_curve": curve,
            "cluster_spec_id": spec_id,
            "cluster_scope": scope,
            "cluster_files_in": len(files),
            "cluster_files_out": n_out,
            "cluster_bytes": total_bytes,
        },
    )
