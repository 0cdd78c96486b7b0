#!/usr/bin/env python3
"""Pre-warm the persistent compile cache for the device greedy planner.

One jitted program exists per (size bucket, closed_aware); a cold remote
compile can take tens of minutes per bucket on this backend, so run this
once after install (or after any change to vector/planner_device.py — any
source change to the jitted program invalidates its cache entry).

Usage: python tests/tools/warm_planner_cache.py [--buckets 8192,16384]
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
    ap.add_argument("--buckets", default="", help="comma list; default = all")
    ap.add_argument("--both", action="store_true",
                    help="also warm closed_aware=False (stage 07 only uses True)")
    args = ap.parse_args()

    import plotweave  # noqa: F401 — enables the persistent compile cache
    import jax

    from plotweave.vector.planner_device import DEFAULT_WARM_BUCKETS, greedy_order_device

    # default list excludes the 4096 bucket: unreachable under the default
    # planner_device_min_n=4500 gate — pass --buckets 4096,... explicitly if
    # you run with a lowered gate
    buckets = (
        tuple(int(b) for b in args.buckets.split(","))
        if args.buckets
        else DEFAULT_WARM_BUCKETS
    )
    print(f"backend: {jax.default_backend()}; warming {buckets}")
    rng = np.random.default_rng(0)
    for b in buckets:
        n = b - 7  # off-bucket n: exercises padding + the dynamic trip count
        starts = rng.integers(0, 4000, (n, 2)).astype(np.float32)
        ends = rng.integers(0, 4000, (n, 2)).astype(np.float32)
        closed = rng.random(n) < 0.3
        for closed_aware in ((True, False) if args.both else (True,)):
            t0 = time.perf_counter()
            r = greedy_order_device(starts, ends, closed, closed_aware, 0)
            dt = time.perf_counter() - t0
            ok = r is not None
            print(f"bucket {b} closed_aware={closed_aware}: {'ok' if ok else 'FAILED'} in {dt:.1f}s")


if __name__ == "__main__":
    main()
