#!/usr/bin/env python3
"""Benchmark: fused raster front-end megapixels/sec on the available device.

Workload: 2000×1500 uint8 image → 4 color layers → morphology → Gaussian →
Canny → Zhang–Suen skeletons, one jitted program (stages 01–04's dense
compute).  Baseline: the same work through the reference's own
implementations, single-core CPU (cv2 single-thread + its numpy thinning),
measured by tests/tools/measure_reference_baseline.py on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# measured via tests/tools/measure_reference_baseline.py (2000×1500, 4 layers,
# cv2.setNumThreads(1), OMP_NUM_THREADS=1): 3.11 s → 0.9643 Mpx/s
REFERENCE_SINGLE_CORE_MPX_S = 0.9643


def synth_image(h=1500, w=2000, seed=0):
    import cv2

    cv2.setNumThreads(1)
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 255, np.uint8)
    for _ in range(120):
        c = tuple(int(v) for v in rng.integers(0, 256, 3))
        x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
        r = int(rng.integers(10, 150))
        if rng.random() < 0.5:
            cv2.circle(img, (x, y), r, c, -1)
        else:
            cv2.rectangle(img, (x, y), (x + r, y + r), c, -1)
    return img


def main() -> None:
    import jax

    from plotweave.ops.frontend import raster_frontend

    img = synth_image()
    h, w = img.shape[:2]
    mpx = h * w / 1e6
    centers = np.array(
        [[40, 128, 128], [110, 140, 120], [180, 150, 140], [240, 128, 126]], np.float32
    )

    dev_img = jax.device_put(img)
    dev_ctr = jax.device_put(centers)

    # warmup / compile
    out = raster_frontend(dev_img, dev_ctr, k=4)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = raster_frontend(dev_img, dev_ctr, k=4)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    value = mpx / dt
    print(
        json.dumps(
            {
                "metric": "raster_frontend_megapixels_per_sec",
                "value": round(value, 3),
                "unit": "Mpx/s",
                "vs_baseline": round(value / REFERENCE_SINGLE_CORE_MPX_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
