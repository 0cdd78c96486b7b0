#!/usr/bin/env python3
"""Benchmark (the BASELINE.json metric): end-to-end image→stream Mpx/s.

Default: the full 13-stage pipeline (1024×768, 4 color layers) against the
reference pipeline measured single-core on this host (189.5 s → 0.0042
Mpx/s).  ``--frontend`` instead measures the fused stage-01–04 device
program (2000×1500 → 4 layers → morphology → Gaussian → Canny → Zhang–Suen)
against the reference's cv2/numpy single-core equivalents (0.9643 Mpx/s,
tests/tools/measure_reference_baseline.py).

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


def bench_e2e(device_init: bool = False) -> None:
    """Primary benchmark: full image→stream pipeline Mpx/s.

    Baseline measured on this host: the reference pipeline (steps 1–13,
    subprocess-per-step, single-core cv2) on the same 1024×768 4-color image:
    189.5 s → 0.0042 Mpx/s.  plotweave runs the same chain warm in ~1.6 s
    (device-artifact handoffs + bitpacked transfers keep the tunnel mostly
    idle); a fresh process with the persistent compile cache adds one-time
    device/attach costs.
    """
    import json as _json
    import shutil
    import tempfile
    import cv2

    import plotweave  # noqa: F401 — enables the compilation cache
    from plotweave.config import load_config
    from plotweave.pipeline import run_pipeline

    ref_mpx_s = 0.0042
    rng = np.random.default_rng(7)
    H, W = 768, 1024
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :] = (230, 220, 210)
    colors = [(20, 20, 20), (90, 90, 200), (140, 180, 220), (230, 220, 210)]
    for _ in range(60):
        c = colors[int(rng.integers(0, 4))]
        x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
        r = int(rng.integers(15, 90))
        if rng.random() < 0.5:
            cv2.circle(img, (x, y), r, c, -1)
        else:
            cv2.rectangle(img, (x, y), (x + r, y + r), c, -1)

    base = tempfile.mkdtemp(prefix="pw_bench_")
    cv2.imwrite(f"{base}/img.png", img)

    def one_run(tag):
        out = f"{base}/{tag}"
        cfg_d = {
            "input_image": f"{base}/img.png", "output_dir": out,
            "colors": [list(c) for c in colors],
            "color_names": ["layer_dark", "layer_mid", "layer_skin", "layer_light"],
            "edge_low_threshold": 22, "edge_high_threshold": 70, "edge_kernel_size": 7,
            "target_width_mm": 210, "target_height_mm": 297, "pixels_per_mm": 4,
            "pen_width_px": 12, "pen_radius_px": 6,
        }
        if device_init:
            cfg_d["kmeans_init"] = "device"
        import os

        os.makedirs(out, exist_ok=True)
        with open(f"{out}/config.json", "w") as f:
            _json.dump(cfg_d, f)
        cfg = load_config(f"{out}/config.json")
        t0 = time.perf_counter()
        run_pipeline(cfg, 1, 13)
        return time.perf_counter() - t0

    one_run("warmup")  # compile (fills the persistent cache)
    dt = min(one_run("timed1"), one_run("timed2"))  # tunnel-latency variance
    shutil.rmtree(base, ignore_errors=True)
    value = (H * W / 1e6) / dt
    print(
        json.dumps(
            {
                "metric": "e2e_image_to_stream_megapixels_per_sec",
                "value": round(value, 4),
                "unit": "Mpx/s",
                "vs_baseline": round(value / ref_mpx_s, 2),
            }
        )
    )


def main() -> None:
    import sys

    # Default = the BASELINE.json metric: end-to-end image→stream Mpx/s.
    # --frontend measures the fused stage-01–04 device program in isolation.
    if "--frontend" not in sys.argv:
        # --device-init: the opt-in single-dispatch stage-02 production mode
        bench_e2e(device_init="--device-init" in sys.argv)
        return

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

    # enough back-to-back dispatches to amortize the host↔device tunnel
    # latency: this measures sustained device throughput
    iters = 50
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
