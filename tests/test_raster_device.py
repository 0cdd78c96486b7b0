"""raster_device="cpu" — the cold-start escape hatch (utils/devices.py)."""

from __future__ import annotations

import json
from contextlib import nullcontext
from unittest import mock

import cv2
import numpy as np
import pytest

from plotweave.config import PipelineConfig, load_config
from plotweave.pipeline import run_pipeline
from plotweave.utils.devices import raster_device_ctx

PALETTE = [(20, 20, 20), (40, 60, 200), (140, 180, 220), (235, 230, 225)]
NAMES = ["layer_dark", "layer_mid", "layer_skin", "layer_light"]


def test_ctx_policy():
    """auto → nullcontext; cpu on a cpu default → nullcontext; cpu on a
    non-cpu default → jax.default_device(cpu); junk values rejected.  On the
    CPU test backend the non-cpu case needs default_backend mocked — this is
    the leg the real chip exercises (verified byte-identical there)."""
    cfg = PipelineConfig()
    assert isinstance(raster_device_ctx(cfg), nullcontext)

    cfg.raster_device = "cpu"
    assert isinstance(raster_device_ctx(cfg), nullcontext)  # already on cpu

    with mock.patch("jax.default_backend", return_value="tpu"):
        ctx = raster_device_ctx(cfg)
    assert not isinstance(ctx, nullcontext)  # a real default_device context

    cfg.raster_device = "local"
    with pytest.raises(ValueError):
        raster_device_ctx(cfg)


def test_raster_device_cpu_pipeline_runs(tmp_path):
    """Plumbing: the flag flows config → stages and the full chain still
    produces a valid stream (cross-backend byte-equality is covered by the
    e2e goldens on both backends and was verified on the real chip)."""
    rng = np.random.default_rng(3)
    h, w = 256, 320  # same shape as test_spatial_e2e → shared jit cache
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = PALETTE[-1]
    for c in PALETTE:
        for _ in range(4):
            x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
            cv2.circle(img, (x, y), int(rng.integers(10, 45)), c, -1)
    p = tmp_path / "i.png"
    cv2.imwrite(str(p), img)

    d = tmp_path / "out"
    d.mkdir()
    cfg = {
        "input_image": str(p), "output_dir": str(d),
        "color_names": NAMES, "colors": [list(c) for c in PALETTE],
        "raster_device": "cpu",
    }
    (d / "config.json").write_text(json.dumps(cfg))
    run_pipeline(load_config(str(d / "config.json")), 1, 13)

    from plotweave.stream.decoder import StreamDecoder, replay

    man = json.loads((d / "vector_manifest.json").read_text())
    dec = StreamDecoder((d / "plot_stream.bin").read_bytes())
    replay(dec, *man["image_size"])
    assert dec.stats.eof_seen and dec.stats.off_canvas_steps == 0
