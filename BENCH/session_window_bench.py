#!/usr/bin/env python
"""Batch LAG sessionization vs native Structured-Streaming session_window
(VERDICT r03 #7): the same events, two engines' session formulations, one
JSON line of wall-clock + row counts.

The batch operator (operators/sessionize.py) is the reference-parity path
(open sessions mutable, late data repaired by affected-key recompute); the
streaming path (streaming/sessions_stream.py) is the freshness path. This
bench measures what switching costs at a given batch size:

    python BENCH/session_window_bench.py [sf_dir] [cores]

Both runs read the SAME events parquet; the streaming run uses an
availableNow file stream + foreachBatch append into an Icehouse sessions
table (checkpointed), the batch run computes the full rollup and writes it
to parquet so both pay one write. Session counts differ by design (the
streaming side only emits sessions CLOSED past the watermark), so the
JSON reports both counts alongside the timings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from ecommerce_lakehouse_spark.operators.sessionize import sessionize
    from ecommerce_lakehouse_spark.session import get_spark
    from ecommerce_lakehouse_spark.streaming.sessions_stream import (
        run_streaming_sessionization,
    )

    spark = get_spark("session-window-bench", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="swb-")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_events = events.count()  # warm the scan for both paths

        t0 = time.time()
        batch = sessionize(events, "user_id", "ts", 1800)
        batch.write.mode("overwrite").parquet(f"{work}/batch_sessions")
        batch_sec = time.time() - t0
        n_batch = spark.read.parquet(f"{work}/batch_sessions").count()

        # the file-stream source wants a DIRECTORY of files
        os.makedirs(f"{work}/events_dir")
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"),
            f"{work}/events_dir/events.parquet",
        )
        t0 = time.time()
        appended = run_streaming_sessionization(
            spark,
            f"{work}/events_dir",
            f"{work}/sessions_tbl",
            f"{work}/ckpt",
            gap="30 minutes",
            watermark_delay="10 minutes",
        )
        stream_sec = time.time() - t0

        print(json.dumps({
            "sf_dir": sf_dir,
            "cores": cores,
            "n_events": n_events,
            "batch_lag_sec": round(batch_sec, 3),
            "batch_sessions": n_batch,
            "stream_session_window_sec": round(stream_sec, 3),
            "stream_sessions_emitted": appended,
            "stream_over_batch": round(stream_sec / batch_sec, 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
