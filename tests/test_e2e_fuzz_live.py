"""Live-oracle e2e fuzz: random (k-means-separable) images through BOTH
pipelines — the reference as a subprocess — and byte-compare the streams.

Catches regressions the committed goldens can't: randomized geometry, tap
configurations, margins, and parameter draws.  Skipped when /root/reference
is not mounted.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REF = Path("/root/reference/image_processor/pipeline.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

PALETTE = [(20, 20, 20), (40, 60, 200), (140, 180, 220), (235, 230, 225)]
NAMES = ["layer_dark", "layer_mid", "layer_skin", "layer_light"]


def _fuzz_image(rng, w, h):
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = PALETTE[-1]
    for _ in range(int(rng.integers(6, 20))):
        c = PALETTE[int(rng.integers(0, 4))]
        x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
        r = int(rng.integers(4, max(5, min(w, h) // 3)))
        shape = rng.random()
        if shape < 0.4:
            cv2.circle(img, (x, y), r, c, -1)
        elif shape < 0.7:
            cv2.rectangle(img, (x, y), (x + r, y + int(r * 0.7)), c, -1)
        else:
            cv2.line(img, (x, y), (x + r, y - r), c, max(1, r // 6))
    return img


def _fuzz_cfg(rng, img_path, out):
    return {
        "input_image": str(img_path),
        "output_dir": str(out),
        "colors": [list(c) for c in PALETTE],
        "color_names": NAMES,
        "edge_low_threshold": int(rng.integers(15, 60)),
        "edge_high_threshold": int(rng.integers(60, 160)),
        "edge_kernel_size": int(rng.choice([3, 5, 7])),
        "target_width_mm": int(rng.integers(100, 240)),
        "target_height_mm": int(rng.integers(120, 300)),
        "pixels_per_mm": int(rng.integers(2, 5)),
        "pen_width_px": int(rng.integers(6, 20)),
        "pen_radius_px": int(rng.integers(3, 10)),
        "margin_left_mm": float(rng.integers(0, 16)),
        "margin_right_mm": float(rng.integers(0, 16)),
        "margin_top_mm": float(rng.integers(0, 16)),
        "margin_bottom_mm": float(rng.integers(0, 16)),
    }


@pytest.mark.parametrize("seed", [101, 202])
def test_e2e_fuzz_stream_byte_identical(tmp_path, seed):
    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(120, 280)), int(rng.integers(100, 240))
    img_path = tmp_path / "img.png"
    cv2.imwrite(str(img_path), _fuzz_image(rng, w, h))

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    cfg = _fuzz_cfg(rng, img_path, ref_out)
    (ref_out / "config.json").write_text(json.dumps(cfg))
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    subprocess.run(
        [sys.executable, str(REF), str(img_path), "--output", str(ref_out), "--end-step", "13"],
        check=True,
        env=env,
        cwd=str(REF.parent),
        capture_output=True,
        timeout=600,
    )

    from plotweave.config import load_config
    from plotweave.pipeline import run_pipeline

    mine = tmp_path / "mine"
    mine.mkdir()
    cfg["output_dir"] = str(mine)
    (mine / "config.json").write_text(json.dumps(cfg))
    run_pipeline(load_config(str(mine / "config.json")), 1, 13)

    a = (ref_out / "plot_stream.bin").read_bytes()
    b = (mine / "plot_stream.bin").read_bytes()
    assert a == b, (
        f"seed {seed}: stream differs (lens {len(a)}/{len(b)}, first diff at "
        f"{next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), 'len')})"
    )
