"""Gap-based sessionization + affected-key incremental recomputation —
the reference's silver/gold incremental layer as reusable operators.

- ``sessionize``: LAG gap detection → running-sum numbering → deterministic
  md5 session ids → per-session aggregates
  (``src/silver/sessionize_clickstream.py:153-251``; T5: deliberately the
  batch LAG formulation, NOT ``F.session_window`` — re-runs are
  deterministic and open sessions stay mutable, which is what lets the
  sessions MERGE extend them [M4]).
- ``affected_keys``/``recompute_affected``: late-data pattern (T6/J5) —
  incremental slice → distinct keys → broadcast semi-join pulls every row of
  the affected grain → exact re-aggregate of just that grain
  (``daily_sales_summary.py:30-42``, ``hourly_traffic_metrics.py:70-93``).

Skew note: the distinct-key side is USUALLY small → broadcast, and the big
side never shuffles for the semi-join. But a late-data storm can touch 10⁸
keys, and broadcasting that OOMs the driver and every executor — so the
broadcast is COUNTED (hybrid_key_scope), falling back to a shuffle join past
the same key-count threshold merge_into uses. The session window shuffles
once on the entity key; AQE skew-split handles hot entities.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .merge import BROADCAST_KEY_LIMIT

DEFAULT_GAP_SECONDS = 1800  # 30-minute inactivity window (BRD FR-010)


def hybrid_key_scope(
    full: DataFrame,
    keys_df: DataFrame,
    keys: list[str] | str,
    key_limit: int = BROADCAST_KEY_LIMIT,
) -> DataFrame:
    """Scope ``full`` to the rows whose key appears in ``keys_df`` — counted
    broadcast: the key set is broadcast only when its count is under
    ``key_limit`` (merge_into's threshold); larger sets take the shuffle
    join.

    One count() action on the (already distinct) key set buys plan safety
    at any scale. (r6 audit: two alternatives were measured and REJECTED —
    collecting the key set to a broadcast LocalRelation re-pays the
    collect at plan-build time and loses at 58k keys, and dropping the
    count in favor of AQE's runtime SMJ→BHJ rewrite still shuffles the
    big side's map stage before the conversion kicks in. The counted
    broadcast is the only formulation that never shuffles ``full``.)
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    probe = F.broadcast(keys_df) if keys_df.count() <= key_limit else keys_df
    return full.join(probe, keys, "inner")


def _us(col: Column) -> Column:
    return F.unix_micros(col.cast("timestamp"))


def with_session_ids(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign deterministic session ids: md5(entity ‖ running session number)
    (``sessionize_clickstream.py:207-210`` — determinism ⇒ idempotent MERGE)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_seconds * 1_000_000
    prev = F.lag(ts_col).over(w)
    flagged = events.withColumn(
        "__is_start",
        F.when(prev.isNull() | ((_us(F.col(ts_col)) - _us(prev)) > gap_us), 1).otherwise(0),
    )
    return (
        flagged.withColumn("__session_num", F.sum("__is_start").over(wrun))
        .withColumn(
            "session_id",
            F.md5(F.concat_ws("_", F.col(entity_col), F.col("__session_num"))),
        )
        .drop("__is_start", "__session_num")
    )


def with_session_ids_chunked(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    chunk_seconds: int = 86_400,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Skew-proof session ids, BIT-IDENTICAL to :func:`with_session_ids`.

    The LAG formulation serializes each entity into one window partition —
    a bot with 10⁸ events becomes a straggler task AQE cannot split. This
    variant windows on (entity, time-chunk) so a hot entity's events spread
    across partitions, then resolves chunk boundaries on a per-(entity,
    chunk) SUMMARY table (tiny: one row per entity-day):

    1. within-chunk LAG marks starts; a chunk's FIRST event is provisional;
    2. per-chunk rollup (first/last ts, inner-start count) + a window over
       the summary decides whether each chunk's first event truly starts a
       session (gap from the previous ADJACENT chunk's last event) and
       prefix-sums start counts across chunks;
    3. join back: global session_num = chunk prefix + within-chunk running
       sum → identical md5 session ids.

    Requires chunk_seconds > gap_seconds: then a skipped (empty) chunk
    always implies a gap larger than the threshold, so only adjacent chunks
    can merge sessions.
    """
    if chunk_seconds <= gap_seconds:
        raise ValueError("chunk_seconds must exceed gap_seconds")
    gap_us = gap_seconds * 1_000_000
    chunk_us = chunk_seconds * 1_000_000

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    ev = events.withColumn("__chunk", F.floor(_us(F.col(ts_col)) / chunk_us))
    wc = Window.partitionBy(entity_col, "__chunk").orderBy(*order)
    wc_run = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(wc)
    ev = ev.withColumn("__rn", F.row_number().over(wc)).withColumn(
        "__inner_start",
        F.when(
            prev.isNotNull() & ((_us(F.col(ts_col)) - _us(prev)) > gap_us), 1
        ).otherwise(0),
    )

    # per-(entity, chunk) summary — one row per entity-chunk, never large
    bounds = ev.groupBy(entity_col, "__chunk").agg(
        F.min(ts_col).alias("__first_ts"),
        F.max(ts_col).alias("__last_ts"),
        F.sum("__inner_start").alias("__n_inner"),
    )
    wb = Window.partitionBy(entity_col).orderBy("__chunk")
    prev_last = F.lag("__last_ts").over(wb)
    prev_chunk = F.lag("__chunk").over(wb)
    bounds = bounds.withColumn(
        "__first_is_start",
        F.when(
            prev_last.isNull()
            | (F.col("__chunk") != prev_chunk + 1)
            | ((_us(F.col("__first_ts")) - _us(prev_last)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "__starts_before",
        F.coalesce(
            F.sum(F.col("__n_inner") + F.col("__first_is_start")).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(entity_col, "__chunk", "__first_is_start", "__starts_before")

    joined = ev.join(bounds, [entity_col, "__chunk"])
    is_start = F.when(F.col("__rn") == 1, F.col("__first_is_start")).otherwise(
        F.col("__inner_start")
    )
    return (
        joined.withColumn("__in_chunk_num", F.sum(is_start).over(wc_run))
        .withColumn(
            "session_id",
            F.md5(
                F.concat_ws(
                    "_",
                    F.col(entity_col),
                    F.col("__starts_before") + F.col("__in_chunk_num"),
                )
            ),
        )
        .drop("__chunk", "__rn", "__inner_start", "__first_is_start",
              "__starts_before", "__in_chunk_num")
    )


def sessionize(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    event_type_col: str | None = None,
    conversion_type: str | None = None,
    tiebreak_col: str | None = None,
    chunked: bool = False,
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """Full session rollup matching clickstream_sessions
    (``sessionize_clickstream.py:224-251``). ``chunked=True`` switches to
    the skew-proof (entity, time-chunk) window with identical results —
    use it when a single entity can dominate the event volume."""
    if chunked:
        s = with_session_ids_chunked(
            events, entity_col, ts_col, gap_seconds, chunk_seconds, tiebreak_col
        )
    else:
        s = with_session_ids(events, entity_col, ts_col, gap_seconds, tiebreak_col)
    aggs = [
        F.to_date(F.min(ts_col)).alias("session_date"),
        F.min(ts_col).alias("first_event_ts"),
        F.max(ts_col).alias("last_event_ts"),
        F.expr(
            f"(unix_micros(cast(max({ts_col}) as timestamp)) - "
            f"unix_micros(cast(min({ts_col}) as timestamp))) div 1000000"
        ).alias("session_duration_secs"),
        F.count("*").alias("event_count"),
    ]
    if event_type_col and conversion_type:
        conv = F.sum(
            F.when(F.col(event_type_col) == conversion_type, 1).otherwise(0)
        )
        aggs += [
            conv.alias("conversion_count"),
            (conv > 0).alias("converted"),
        ]
    return s.groupBy(entity_col, "session_id").agg(*aggs)


def affected_keys(incremental: DataFrame, key_cols: list[str] | str) -> DataFrame:
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return incremental.select(*keys).distinct()


def recompute_affected(
    full: DataFrame,
    incremental: DataFrame,
    key_cols: list[str] | str,
    aggregate: Callable[[DataFrame], DataFrame],
    key_limit: int = BROADCAST_KEY_LIMIT,
) -> DataFrame:
    """Re-aggregate ONLY the grain touched by the incremental slice: the
    distinct affected keys scope a join against the full table (counted
    broadcast — see hybrid_key_scope), then ``aggregate`` runs over exactly
    those groups."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    scoped = hybrid_key_scope(full, affected_keys(incremental, keys), keys, key_limit)
    return aggregate(scoped)


def maintain_sessions_table(
    spark,
    sessions_path: str,
    all_events: DataFrame,
    incremental_events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    event_type_col: str | None = None,
    conversion_type: str | None = None,
    tiebreak_col: str | None = None,
):
    """Incremental sessions-table maintenance — the reference's full
    sessionize-then-MERGE flow (``sessionize_clickstream.py:85-309``):

    new events → affected entities → re-sessionize ALL their events (exact
    cross-row metrics; T6 late-data correctness) → MERGE on session_id with
    partial update of the mutable metric columns (open sessions extended,
    M4) and insert of brand-new sessions. Deterministic md5 session ids make
    the whole maintenance idempotent.
    """
    from ..table.format import IcehouseTable
    from .merge import merge_into

    scoped = hybrid_key_scope(
        all_events, affected_keys(incremental_events, entity_col), entity_col
    )
    sess = sessionize(
        scoped, entity_col, ts_col, gap_seconds,
        event_type_col=event_type_col, conversion_type=conversion_type,
        tiebreak_col=tiebreak_col,
    )
    tbl = IcehouseTable(spark, sessions_path)
    if not tbl.exists():
        return IcehouseTable.create(spark, sessions_path, sess), None
    mutable = [
        c for c in sess.columns if c not in (entity_col, "session_id", "session_date")
    ]
    result = merge_into(tbl, sess, ["session_id"], update_cols=mutable)
    return tbl, result
