#!/usr/bin/env python3
"""Measure the stage-12 device tour refiner (vector/refine_device.py) on the
default backend, against the host 2-opt scan where the host is feasible.

Also serves as the bucket pre-warm tool: one compile per size bucket, cached
persistently — run after any change to refine_device.py.

Timings are host-fetch-synced by construction (refine_order_device fetches
perm/flip with np.asarray).

Usage: python tests/tools/bench_refine_device.py [--sizes 1000,4000,8000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

HOST_MAX_N = 2048  # the O(n²)-Python host pass is too slow beyond this


def synth_ops(n: int, seed: int):
    rng = np.random.default_rng(seed)
    ops = []
    for _ in range(n):
        if rng.random() < 0.2:
            x, y = (int(v) for v in rng.integers(0, 4000, 2))
            ops.append({"type": "tap", "x": x, "y": y})
        else:
            p0 = rng.integers(0, 4000, 2).astype(np.float32)
            p1 = p0 + rng.integers(-60, 61, 2).astype(np.float32)
            ops.append({"type": "line", "points": np.stack([p0, p1])})
    return ops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="500,1000,2000,4000,8000")
    args = ap.parse_args()

    import plotweave  # noqa: F401 — persistent compile cache
    import jax

    from plotweave.vector.planner import tour_length, two_opt_refine
    from plotweave.vector.refine_device import refine_ops_device

    print(f"backend: {jax.default_backend()}")
    for n in (int(s) for s in args.sizes.split(",")):
        ops = synth_ops(n, seed=5)
        L0 = tour_length(ops)

        refine_ops_device(ops, max_moves=1)  # warm this bucket's compile
        t0 = time.perf_counter()
        dev = refine_ops_device(ops, max_moves=max(4096, 4 * n))
        t_dev = time.perf_counter() - t0
        assert dev is not None
        Ld = tour_length(dev)

        host_part = ""
        if n <= HOST_MAX_N:
            t0 = time.perf_counter()
            host = two_opt_refine(list(ops), max_passes=1)
            t_host = time.perf_counter() - t0
            host_part = (
                f"   host 2-opt(1 pass) {t_host:7.1f} s → −{(1 - tour_length(host) / L0) * 100:4.1f}%"
            )
        print(
            f"n={n:6d}  device {t_dev:6.1f} s → travel −{(1 - Ld / L0) * 100:4.1f}%"
            f"{host_part}"
        )


if __name__ == "__main__":
    main()
