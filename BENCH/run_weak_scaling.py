#!/usr/bin/env python
"""Weak-scaling (Gustafson) evidence: N cores at W pages vs 4N cores at 4W.

Why this complements run_scaling.py's strong scaling: the round-2 engine cut
absolute pipeline times ~2x at local[2] (42.6 s vs round-1's 88.9 s on the
same 1M-page input), so at FIXED small size the remaining wall-clock is
fixed overhead (JVM, commits, stats collection) and measured strong-scaling
speedup shrinks as the engine improves — the Amdahl trap of optimizing the
parallel fraction. The 100 TB question is the weak-scaling one: does
throughput hold when cores AND data grow 4x together? Ideal = equal wall
time, 4x rows/s; efficiency = rows_per_sec(4N,4W) / (4 * rows_per_sec(N,W)).

Usage: python BENCH/run_weak_scaling.py [w_pages] [--prebuild-only]
Inputs are prebuilt into separate workdirs; run prebuild first, let the
host's CPU-credit quota recover, then run the timed pair (the small run
first — ordering bias goes AGAINST the claim since the big run then sees a
partially drained quota).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
N_SMALL, N_BIG = 2, 8
SCALE = N_BIG // N_SMALL  # 4x


def workdirs(w: int) -> tuple[str, str]:
    return (f"/tmp/weak-{w}", f"/tmp/weak-{w * SCALE}")


def prebuild(w: int) -> None:
    sys.path.insert(0, os.path.dirname(HERE))
    from ecommerce_lakehouse_spark.session import get_spark
    from BENCH.scaling import build_input

    for wd, pages in zip(workdirs(w), (w, w * SCALE)):
        if os.path.exists(f"{wd}/base"):
            continue
        s = get_spark("weak-build", cores=8, shuffle_partitions=64)
        s.sparkContext.setLogLevel("ERROR")
        build_input(s, wd, pages, 8)
        s.stop()
    print("PREBUILT", workdirs(w))


def run_once(cores: int, wd: str, pages: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_FORCE_SMJ": "1"}
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling.py"), str(cores), wd, str(pages)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    w = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1_000_000
    if "--prebuild-only" in sys.argv:
        prebuild(w)
        return
    wd_small, wd_big = workdirs(w)
    small = run_once(N_SMALL, wd_small, w)
    print(json.dumps(small), flush=True)
    big = run_once(N_BIG, wd_big, w * SCALE)
    print(json.dumps(big), flush=True)
    eff = big["pipeline_rows_per_sec"] / (SCALE * small["pipeline_rows_per_sec"])
    print(json.dumps({
        "mode": "weak_scaling",
        "w_pages": w,
        f"local[{N_SMALL}]@{w}": {
            "pipeline_sec": small["pipeline_sec"],
            "rows_per_sec": small["pipeline_rows_per_sec"],
            "gb_per_hour": small["pipeline_gb_per_hour"],
        },
        f"local[{N_BIG}]@{w * SCALE}": {
            "pipeline_sec": big["pipeline_sec"],
            "rows_per_sec": big["pipeline_rows_per_sec"],
            "gb_per_hour": big["pipeline_gb_per_hour"],
        },
        "ideal": "equal wall time, 4x rows/s",
        "weak_scaling_efficiency": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
