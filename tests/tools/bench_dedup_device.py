#!/usr/bin/env python3
"""VERDICT r3 item 8: spike a device-side stage-08 pass A and measure the
crossover against the whole-layer native pass (pw_virtual_draw_batch).

Stage 08 pass A (08_dedup_layer_basic.py:117-183) is a strictly sequential
per-sample loop: each arc-length sample is tested against the shared forbid
canvas, and samples older than the sliding tail are committed (thick-brush
stamped) before later samples are tested.  The device prototype below keeps
that dependency chain as a `lax.scan` over samples whose body does the two
per-sample primitives at full fidelity of ACCESS PATTERN (1×1 canvas read
at a dynamic index; (2R+1)² disc OR-stamp at a dynamic index with a fixed
commit lag standing in for the arc-length tail).  It intentionally does NOT
replicate the float tie-breaking/point-grid parity — it exists to measure
whether the sequential structure can be worth dispatching at all, which is
throughput-bound by the scan's per-step cost, not by those details.

The native comparison runs the production whole-layer batched pass
(`native/api.py::virtual_draw_batch_native`) on the same synthetic layer.

Usage: python tests/tools/bench_dedup_device.py [--samples 20000 100000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

CANVAS_H, CANVAS_W = 1188, 840  # A4 at 4 px/mm (the cfg3-class scaled canvas)
BRUSH_R = 12                    # collision radius class (pen_width 12 → 2× brush)
TAIL_LAG = 24                   # samples; stands in for the arc-length tail


def synth_samples(n: int, seed: int = 0) -> np.ndarray:
    """A serpentine random walk: locality like real resampled polylines."""
    rng = np.random.default_rng(seed)
    steps = rng.integers(-3, 4, (n, 2)).astype(np.float64).cumsum(axis=0)
    pts = np.empty((n, 2), np.int32)
    pts[:, 0] = np.clip(np.abs(steps[:, 0]) % (CANVAS_W - 2 * BRUSH_R), 0, None) + BRUSH_R
    pts[:, 1] = np.clip(np.abs(steps[:, 1]) % (CANVAS_H - 2 * BRUSH_R), 0, None) + BRUSH_R
    return pts


def device_scan(samples: np.ndarray):
    """One dispatch: scan over samples with the pass-A dependency chain."""
    import jax
    import jax.numpy as jnp

    D = 2 * BRUSH_R + 1
    yy, xx = np.mgrid[-BRUSH_R : BRUSH_R + 1, -BRUSH_R : BRUSH_R + 1]
    disc = ((yy * yy + xx * xx) <= BRUSH_R * BRUSH_R).astype(np.uint8)

    @jax.jit
    def run(pts):
        n = pts.shape[0]
        canvas0 = jnp.zeros((CANVAS_H, CANVAS_W), jnp.uint8)

        def body(canvas, i):
            x, y = pts[i, 0], pts[i, 1]
            # test: is this sample on forbidden canvas?
            hit = jax.lax.dynamic_slice(canvas, (y, x), (1, 1))[0, 0] != 0
            # commit the sample that just aged out of the tail
            j = jnp.maximum(i - TAIL_LAG, 0)
            cx, cy = pts[j, 0] - BRUSH_R, pts[j, 1] - BRUSH_R
            patch = jax.lax.dynamic_slice(canvas, (cy, cx), (D, D))
            patch = patch | jnp.where(i >= TAIL_LAG, disc, jnp.zeros_like(disc))
            canvas = jax.lax.dynamic_update_slice(canvas, patch, (cy, cx))
            return canvas, hit

        _, hits = jax.lax.scan(body, canvas0, jnp.arange(n))
        return jnp.sum(hits)

    return run


def native_layer(samples: np.ndarray, n_contours: int) -> float:
    """Time the production whole-layer native pass on the same samples split
    into ``n_contours`` polylines (includes its resample of the raw pts)."""
    from plotweave.native.api import virtual_draw_batch_native

    soffs = np.linspace(0, len(samples), n_contours + 1).astype(np.int64)
    sx = samples[:, 0].astype(np.float64)
    sy = samples[:, 1].astype(np.float64)
    canvas = np.zeros((CANVAS_H, CANVAS_W), np.uint8)
    t0 = time.perf_counter()
    r = virtual_draw_batch_native(
        sx, sy, soffs, canvas,
        grid_radius=float(BRUSH_R), grid_cell=float(BRUSH_R),
        tail_len_px=48.0, brush=2 * BRUSH_R, max_delta=4,
    )
    dt = time.perf_counter() - t0
    assert r is not None, "native library must be available"
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, nargs="+", default=[20000, 100000])
    args = ap.parse_args()

    import plotweave  # noqa: F401 — persistent compile cache
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    for n in args.samples:
        pts = synth_samples(n)
        run = device_scan(pts)
        dev_pts = jax.device_put(jnp.asarray(pts))
        t0 = time.perf_counter()
        float(np.asarray(run(dev_pts)))  # compile + run; host fetch = sync
        t_compile = time.perf_counter() - t0
        best = min(
            _timed(lambda: float(np.asarray(run(dev_pts)))) for _ in range(3)
        )
        t_native = min(native_layer(pts, max(1, n // 200)) for _ in range(3))
        print(
            f"n={n:7d}  device scan {best * 1e3:9.1f} ms ({best / n * 1e6:6.2f} us/sample, "
            f"compile+first {t_compile:.1f}s)   native whole-layer {t_native * 1e3:8.1f} ms "
            f"({t_native / n * 1e6:6.2f} us/sample)   device/native {best / t_native:8.1f}x"
        )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
