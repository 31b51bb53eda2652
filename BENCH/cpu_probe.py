#!/usr/bin/env python
"""Sustained-CPU-quota probe: aggregate throughput of N busy-loop processes.

The sandbox host advertises 32 vCPUs but enforces a sustained CPU quota
(burst credits decay under load), which decides the HONEST N-vs-4N pair for
the scaling-efficiency evidence. This prints aggregate loop-units/s for a
range of process counts; linear scaling up to Q and flat/regressing beyond
it means the sustained quota is ≈Q cores.

Usage: python BENCH/cpu_probe.py [seconds_per_step] [counts...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(stop_at: float, out):
    x = 1.0
    n = 0
    while time.time() < stop_at:
        for _ in range(10_000):
            x = x * 1.0000001 + 1e-9
        n += 1
    out.put(n)


def measure(procs: int, seconds: float) -> float:
    q = mp.Queue()
    stop_at = time.time() + seconds
    ps = [mp.Process(target=_burn, args=(stop_at, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    counts = [int(c) for c in sys.argv[2:]] or [1, 2, 4, 8, 16, 32]
    out = {}
    for c in counts:
        rate = measure(c, seconds)
        out[c] = round(rate, 1)
        print(json.dumps({"procs": c, "loop_units_per_sec": out[c]}), flush=True)
    base = out[counts[0]]
    print(json.dumps({
        "summary": {str(c): round(out[c] / base, 2) for c in counts},
        "note": "values are speedups vs the first count",
    }))


if __name__ == "__main__":
    main()
