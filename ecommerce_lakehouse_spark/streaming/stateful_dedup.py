"""Custom stateful streaming operator: cross-micro-batch exact dedup via
``applyInPandasWithState`` (BASELINE: "applyInPandasWithState for custom
stateful operators").

The reference gets effectively-once by idempotent MERGE keyed on
deterministic ids; this is the streaming-native complement: per-key state in
Spark's state store remembers which event ids were already emitted, so
replayed/duplicated events (at-least-once sources, producer retries) are
dropped exactly once ACROSS micro-batches — something stateless
``dropDuplicates`` within a batch can't do, and ``dropDuplicates`` with
watermark can, but without custom logic hooks (here: duplicate counters
surfaced as metrics columns).

State bound: an UNbounded per-key id set would grow forever and the whole
set round-trips through the state store every batch. Two caps, both on by
default:

- ``dedup_window_ms`` sets an EVENT-TIME TTL via ``EventTimeTimeout`` +
  watermark: a key whose last event is older than the window (by watermark)
  has its whole state evicted, so a dup arriving later than the window is
  re-emitted — the dedup window IS the guarantee. Event-time (not
  processing-time) timeouts are deliberate: ``availableNow`` drain-and-stop
  runs terminate when input is exhausted, while wall-clock timers would keep
  the query alive waiting to fire; and the watermark persists in the
  checkpoint, so eviction works correctly across separate runs.
- ``max_ids_per_key`` FIFO-caps the set so one pathological key can't grow
  a multi-MB state row (oldest ids age out first).

State shape: one group per ``key_col``; state = (insertion-ordered seen-ids
string, dup_count, last_event_ms). Arrow-batched both ways — the handler
sees pandas DataFrames, never per-row Python over the stream.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id string, ts timestamp, value double, "
    "dups_dropped_so_far long"
)
STATE_SCHEMA = "seen string, dup_count long, last_event_ms long"

DEFAULT_DEDUP_WINDOW_MS = 24 * 3600 * 1000  # 24h event-time dedup window
DEFAULT_MAX_IDS_PER_KEY = 100_000


def _make_dedup_fn(dedup_window_ms: int | None, max_ids_per_key: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_event + window: evict (bounded store)
            state.remove()
            return iter([])
        if state.exists:
            seen_str, dup_count, last_event_ms = state.get
            # insertion order preserved → FIFO aging under the cap
            seen_list = seen_str.split("\x1f") if seen_str else []
        else:
            seen_list, dup_count, last_event_ms = [], 0, 0
        seen = set(seen_list)
        out = []
        for pdf in pdfs:
            if len(pdf):
                batch_max_ms = int(pdf["ts"].max().value // 1_000_000)
                last_event_ms = max(last_event_ms, batch_max_ms)
            fresh_mask = []
            for eid in pdf["event_id"].astype(str):
                if eid in seen:
                    dup_count += 1
                    fresh_mask.append(False)
                else:
                    seen.add(eid)
                    seen_list.append(eid)
                    fresh_mask.append(True)
            kept = pdf[pd.Series(fresh_mask, index=pdf.index)]
            if len(kept):
                kept = kept.assign(dups_dropped_so_far=dup_count)
                out.append(kept[["user_id", "event_id", "ts", "value",
                                 "dups_dropped_so_far"]])
        if max_ids_per_key is not None and len(seen_list) > max_ids_per_key:
            seen_list = seen_list[-max_ids_per_key:]
        state.update(("\x1f".join(seen_list), dup_count, last_event_ms))
        if dedup_window_ms is not None:
            # deadline must be beyond the current watermark or Spark rejects it
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_event_ms + dedup_window_ms, wm + 1))
        return iter(out)

    return _dedup_fn


def stateful_dedup_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    dedup_window_ms: int | None = DEFAULT_DEDUP_WINDOW_MS,
    max_ids_per_key: int | None = DEFAULT_MAX_IDS_PER_KEY,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """events (streaming) → first occurrence of each (key, event_id) only,
    with a running per-key duplicate counter. State is bounded by an
    event-time dedup window (watermark-driven eviction) and a FIFO id cap —
    ids older than the window / beyond the cap can be re-emitted (documented
    dedup-window semantics, not exactly-once-forever)."""
    if dedup_window_ms is not None:
        events = events.withWatermark(ts_col, watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy(key_col).applyInPandasWithState(
        _make_dedup_fn(dedup_window_ms, max_ids_per_key),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_stateful_dedup(
    spark, source_path: str, out_path: str, checkpoint_path: str
) -> int:
    """availableNow run: file-stream events → deduped Icehouse appends."""
    from ..table.format import IcehouseTable

    tbl = IcehouseTable(spark, out_path)
    if not tbl.exists():
        from pyspark.sql.types import _parse_datatype_string

        tbl = IcehouseTable.create(
            spark, out_path, spark.createDataFrame([], _parse_datatype_string(OUTPUT_SCHEMA))
        )
    n = {"rows": 0}

    events = spark.readStream.schema(
        "user_id long, event_id string, ts timestamp, value double"
    ).parquet(source_path)
    deduped = stateful_dedup_stream(events)

    stream_id = f"dedup:{checkpoint_path}"

    def sink(df, bid):
        # foreachBatch is at-least-once: txn marker makes replays no-ops
        c = df.count()
        if c and tbl.append(df, txn=(stream_id, bid)) is not None:
            n["rows"] += c

    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n["rows"]
