#!/usr/bin/env python3
"""BASELINE config-4 benchmark: batch of 64 mixed images, full pipeline.

Measures sustained Mpx/s for `run_pipeline_batch` at several host worker
counts to pick the default (VERDICT r1 item 9).  Images are bench-class
(1024x768, 4 layers) with per-image color/shape variation so k-means,
dedup and stream work differ across the batch.

Usage: python tests/tools/bench_batch.py [--workers 4 8 12] [--n 64]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import numpy as np

COLORS = [(20, 20, 20), (90, 90, 200), (140, 180, 220), (230, 220, 210)]
NAMES = ["layer_dark", "layer_mid", "layer_skin", "layer_light"]


def make_images(base: Path, n: int):
    import cv2

    paths = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        H, W = 768, 1024
        img = np.zeros((H, W, 3), np.uint8)
        img[:, :] = COLORS[-1]
        for _ in range(60):
            c = COLORS[int(rng.integers(0, 4))]
            x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
            r = int(rng.integers(15, 90))
            if rng.random() < 0.5:
                cv2.circle(img, (x, y), r, c, -1)
            else:
                cv2.rectangle(img, (x, y), (x + r, y + r), c, -1)
        p = base / f"img{i:03d}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
    return paths


def build_cfgs(paths, out: Path):
    from plotweave.config import load_config, PipelineConfig, save_config

    out.mkdir(parents=True)
    cfgs = []
    for p in paths:
        d = out / p.stem
        d.mkdir()
        cfg = PipelineConfig()
        f = save_config(cfg, str(d / "config.json"), {
            "input_image": str(p), "output_dir": str(d),
            "color_names": NAMES, "colors": [list(c) for c in COLORS],
            # bench-class canvas (matches bench.py's e2e config): the
            # default A4@40steps/mm canvas is ~100 Mpx and preview
            # rendering/PNG encode dominates either implementation
            "target_width_mm": 210, "target_height_mm": 297,
            "pixels_per_mm": 4, "pen_width_px": 12, "pen_radius_px": 6,
            "edge_low_threshold": 22, "edge_high_threshold": 70,
            "edge_kernel_size": 7,
        })
        cfgs.append(load_config(f))
    return cfgs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="+", default=[4])
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument(
        "--mesh", choices=["auto", "off"], default="auto",
        help="auto = dispatch rendezvous on (single-chip batching); "
        "off = per-image dispatches (the pre-r4 behavior, for A/B)",
    )
    ap.add_argument(
        "--ab", type=int, default=0, metavar="K",
        help="interleaved A/B: K alternating (batch, sequential) runs in the "
        "same phase; report per-side medians + per-stage steady-state sums "
        "(the ab.py convention — round-4 verdict #2/#3)",
    )
    args = ap.parse_args()

    from plotweave.pipeline import run_pipeline, run_pipeline_batch, stage_clock

    base = Path(tempfile.mkdtemp(prefix="pw_batch_"))
    paths = make_images(base, args.n)
    mpx = args.n * 1024 * 768 / 1e6

    if args.ab:
        from ab import ab_capture

        w = args.workers[0]
        runs = {"n": 0}
        stage_sums = {"batch": {}, "seq": {}}

        def one_side(label: str) -> float:
            runs["n"] += 1
            out = base / f"run{runs['n']:02d}_{label}"
            cfgs = build_cfgs(paths, out)
            with stage_clock() as clk:
                t0 = time.perf_counter()
                if label == "batch":
                    times = run_pipeline_batch(cfgs, 1, 13, workers=w, mesh_dp=None)
                    ok = sum(1 for t in times if t >= 0)
                else:  # sequential: one image at a time (the reference shape)
                    ok = 0
                    for c in cfgs:
                        run_pipeline(c, 1, 13)
                        ok += 1
                wall = time.perf_counter() - t0
            assert ok == args.n, f"{label}: only {ok}/{args.n} images ok"
            for k, v in clk.items():
                stage_sums[label][k] = stage_sums[label].get(k, 0.0) + v
            shutil.rmtree(out, ignore_errors=True)
            return mpx / wall

        res = ab_capture(
            lambda: one_side("batch"), lambda: one_side("seq"),
            k=args.ab, label_a="batch", label_b="seq",
        )
        # per-stage steady state, seconds per image, summed over all runs of
        # a side — this names the binder (the stage with the largest share)
        per_img = {
            side: {k: round(v / (args.ab * args.n), 4)
                   for k, v in sorted(d.items())}
            for side, d in stage_sums.items()
        }
        print(json.dumps({"metric": "cfg4_ab", "unit": "Mpx/s", "n": args.n,
                          "workers": w, **res, "stage_s_per_image": per_img}))
        shutil.rmtree(base, ignore_errors=True)
        return

    results = {}
    for w in args.workers:
        out = base / f"w{w}"
        cfgs = build_cfgs(paths, out)
        t0 = time.perf_counter()
        times = run_pipeline_batch(
            cfgs, 1, 13, workers=w, mesh_dp=(None if args.mesh == "auto" else False)
        )
        wall = time.perf_counter() - t0
        ok = sum(1 for t in times if t >= 0)
        results[w] = wall
        print(json.dumps({
            "workers": w, "wall_s": round(wall, 1), "ok": ok, "mesh": args.mesh,
            "mpx_per_s": round(mpx / wall, 3),
        }))
        shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
