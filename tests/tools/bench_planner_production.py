#!/usr/bin/env python3
"""Measure the PRODUCTION stage-07 device planner (vector/planner_device.py)
against the host C++ selection loop on the default backend.

Unlike tests/tools/bench_greedy_device.py (the round-2 exploration jit),
this drives the exact code path stage 07 uses: bucket padding, dynamic trip
count, and the internal np.asarray fetch — so timings are host-fetch-synced
by construction. Publishes the BASELINE.md "stage-07 greedy planning" row.

Usage: python tests/tools/bench_planner_production.py [--sizes 20000,40000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8000,20000,40000")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import plotweave  # noqa: F401 — persistent compile cache
    import jax

    from plotweave.vector.planner_device import greedy_order_device
    from plotweave.vector.sort import _greedy_order_native

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for n in (int(s) for s in args.sizes.split(",")):
        starts = rng.integers(0, 4000, (n, 2)).astype(np.float32)
        ends = rng.integers(0, 4000, (n, 2)).astype(np.float32)
        closed = rng.random(n) < 0.3
        seed = 0

        t0 = time.perf_counter()
        host = _greedy_order_native(starts, ends, closed, True, seed)
        t_host = time.perf_counter() - t0

        dev = greedy_order_device(starts, ends, closed, True, seed)  # warm
        if dev is None:
            print(f"n={n:6d}  device path unavailable (bucket overflow or backend error)")
            continue
        t_dev = min(
            _timed(greedy_order_device, starts, ends, closed, seed)
            for _ in range(args.reps)
        )

        match = host is not None and dev[0] == host[0] and dev[1] == host[1]
        print(
            f"n={n:6d}  host C++ {t_host * 1e3:9.1f} ms   device {t_dev * 1e3:9.1f} ms"
            f"   win {t_host / t_dev:5.1f}x   order+flips match: {match}"
        )


def _timed(fn, starts, ends, closed, seed) -> float:
    t0 = time.perf_counter()
    r = fn(starts, ends, closed, True, seed)
    assert r is not None
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
