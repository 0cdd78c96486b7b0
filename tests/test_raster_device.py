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

    import jax

    jax.devices()  # the pinning legs below only apply once backends are live
    cfg.raster_device = "cpu"
    assert isinstance(raster_device_ctx(cfg), nullcontext)  # already on cpu

    with mock.patch("jax.default_backend", return_value="tpu"):
        ctx = raster_device_ctx(cfg)
    assert not isinstance(ctx, nullcontext)  # a real default_device context

    cfg.raster_device = "local"
    with pytest.raises(ValueError):
        raster_device_ctx(cfg)


@pytest.mark.slow
def test_raster_device_cpu_never_touches_default_backend(tmp_path):
    """The tunnel-down escape hatch must be TOTAL: in a fresh process with
    raster_device="cpu", the default (axon/TPU) backend must never be
    *initialized* — merely initializing it blocks forever on a hung tunnel
    (observed live, round 3).  Two layers pin this: ops/colorspace.py keeps
    its module constants numpy (a module-level jnp.array is an eager dispatch
    at import), and raster_device_ctx forces jax_platforms=cpu when no
    backend is live yet."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(3)
    h, w = 256, 320
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

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # clean driver-style env: no conftest forcing
    env.pop("JAX_PLATFORMS", None)
    code = f"""
import json
from plotweave.config import load_config
from plotweave.pipeline import run_pipeline
run_pipeline(load_config({str(d / "config.json")!r}), 1, 13)
from jax._src import xla_bridge as _xb
inited = sorted(_xb._backends)
assert inited == ["cpu"], f"non-cpu backend initialized: {{inited}}"
print("CPU_ONLY_OK", inited)
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    assert "CPU_ONLY_OK" in r.stdout
    assert (d / "plot_stream.bin").exists()


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
