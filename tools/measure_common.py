"""Shared TPU timing discipline for the tools/tpu_measure_* scripts.

The chip is reached over a single-client tunnel where ``block_until_ready``
does not reliably reflect device completion (PERFORMANCE.md): time with a
scalar-reducing output and an ``np.asarray`` readback, best-of-``trials``
averages of ``iters`` calls.  Tuning this recipe HERE keeps every
measurement batch comparable (bench.py carries its own copy deliberately —
the driver runs it standalone).
"""

import time

import numpy as np


def measure(fn, *args, iters=15, trials=3):
    np.asarray(fn(*args))  # sync through compile + first run
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)  # scalar readback drains the pipeline
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best
