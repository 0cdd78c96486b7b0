"""raster_device="cpu" (the cold-start escape hatch) must flow through the
pipeline and stay byte-identical to the default placement.  On the CPU test
backend both paths land on the same device, so this pins the PLUMBING
(config → context → stages); the cross-backend equality is covered by the
e2e goldens running on both backends and was verified on the real chip."""

from __future__ import annotations

import json

import cv2
import numpy as np

from plotweave.config import load_config
from plotweave.pipeline import run_pipeline

PALETTE = [(20, 20, 20), (40, 60, 200), (140, 180, 220), (235, 230, 225)]
NAMES = ["layer_dark", "layer_mid", "layer_skin", "layer_light"]


def test_raster_device_cpu_byte_identical(tmp_path):
    rng = np.random.default_rng(3)
    h, w = 256, 320  # same shape as test_spatial_e2e → shared jit cache when
    # the modules land in one session
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = PALETTE[-1]
    for c in PALETTE:
        for _ in range(4):
            x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
            cv2.circle(img, (x, y), int(rng.integers(10, 45)), c, -1)
    p = tmp_path / "i.png"
    cv2.imwrite(str(p), img)

    outs = {}
    for tag, dev in (("auto", "auto"), ("cpu", "cpu")):
        d = tmp_path / tag
        d.mkdir()
        cfg = {
            "input_image": str(p), "output_dir": str(d),
            "color_names": NAMES, "colors": [list(c) for c in PALETTE],
            "raster_device": dev,
        }
        (d / "config.json").write_text(json.dumps(cfg))
        run_pipeline(load_config(str(d / "config.json")), 1, 13)
        outs[tag] = (d / "plot_stream.bin").read_bytes()
    assert outs["auto"] == outs["cpu"]
