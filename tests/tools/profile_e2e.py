"""Per-stage wall-clock profile of the driver's e2e bench (bench.py's exact
runner) on the current default backend — names where the ~0.7 s warm run
goes (tunnel wait vs host stages).  Usage: python tests/tools/profile_e2e.py
[n_runs].  Prints per-run stage tables; compare best columns across stages
(this host's page-fault phases make single runs noisy — CLAUDE.md)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from plotweave.pipeline import stage_clock  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rtt = bench.probe_chip()
    print(f"probe RTT {rtt * 1e3:.0f} ms")
    runner, cleanup, mpx = bench._make_e2e_runner(False)
    try:
        t0 = time.perf_counter()
        runner("warmup")
        print(f"warmup {time.perf_counter() - t0:.2f}s")
        tables = []
        walls = []
        for i in range(n):
            with stage_clock() as clk:
                t0 = time.perf_counter()
                runner(f"p{i}")
                wall = time.perf_counter() - t0
            walls.append(wall)
            tables.append(dict(clk))
            print(f"\nrun {i}: wall {wall:.3f}s  ({mpx / wall:.4f} Mpx/s)")
            for k, v in clk.items():
                print(f"  {k:24s} {v * 1e3:8.1f} ms")
        best = min(range(n), key=lambda i: walls[i])
        print(f"\nbest run {best}: wall {walls[best]:.3f}s = {mpx / walls[best]:.4f} Mpx/s")
        stages = sorted({k for t in tables for k in t})
        print("per-stage min across runs (ms):")
        tot = 0.0
        for s in stages:
            v = min(t.get(s, 0.0) for t in tables) * 1e3
            tot += v
            print(f"  {s:24s} {v:8.1f}")
        print(f"  {'SUM of mins':24s} {tot:8.1f}")
    finally:
        cleanup()


if __name__ == "__main__":
    main()
