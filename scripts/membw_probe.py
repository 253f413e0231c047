#!/usr/bin/env python3
"""Host memory-bandwidth / compute-scaling probe.

Quantifies the sandbox caveat documented in docs/SCALE.md §7 and
BENCH/BASELINE.md: this VM's cores share one memory subsystem, so
bandwidth-bound work stops scaling well before 32 processes while
cache-resident compute scales ~linearly. Evidence that the 8→32
plateau in the KG job is a host roofline, not an engine bottleneck.

Prints one JSON line per (workload, procs) with aggregate rates:
* stream  — elementwise passes over 24 MB float32 arrays (pure bandwidth)
* small_mm — 400×400 matmuls (cache-resident compute; BLAS pinned to 1
  thread, one process per core — the Spark worker model)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

os.environ["OPENBLAS_NUM_THREADS"] = "1"
os.environ["OMP_NUM_THREADS"] = "1"

BURN_SEC = 4.0


def stream(_):
    import numpy as np

    a = np.random.rand(6_000_000).astype(np.float32)  # 24 MB
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < BURN_SEC:
        b = a * 2.0
        _ = b + a
        n += 1
    # bytes touched per iteration: read 24+48 MB, write 48 MB
    return n * 120e6


def small_mm(_):
    import numpy as np

    a = np.random.rand(400, 400).astype(np.float32)  # 640 KB: L2-resident
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < BURN_SEC:
        _ = a @ a
        n += 1
    return n * 2 * 400**3  # flops


def main() -> int:
    for fn, unit in ((stream, "GB/s"), (small_mm, "GFLOP/s")):
        base = None
        for procs in (1, 2, 8, 32):
            with mp.Pool(procs) as p:
                p.map(abs, range(procs))  # absorb worker startup
                total = sum(p.map(fn, range(procs)))
            rate = total / BURN_SEC / 1e9
            base = base or rate
            print(
                json.dumps(
                    {
                        "workload": fn.__name__,
                        "procs": procs,
                        "rate": round(rate, 1),
                        "unit": unit,
                        "scaling_vs_1proc": round(rate / base, 2),
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
