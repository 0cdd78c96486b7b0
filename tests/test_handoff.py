"""Device-artifact handoff + bitpack: the in-process fast path must be
invisible — identical bytes to disk reads, and stale entries must fall back."""

from __future__ import annotations

import os
import time

import numpy as np

from plotweave.ops.bitpack import bitpack_rows, unpack_rows
from plotweave.utils import fetch_device_artifact, register_device_artifact, write_image


def test_bitpack_roundtrip_arbitrary_widths():
    rng = np.random.default_rng(0)
    for w in (1, 7, 8, 9, 64, 100, 1023, 1024):
        img = (rng.random((3, 5, w)) < 0.5).astype(np.uint8) * 255
        packed = np.asarray(bitpack_rows(img))
        assert packed.shape == (3, 5, (w + 7) // 8)
        np.testing.assert_array_equal(unpack_rows(packed, w), (img > 0).astype(np.uint8))


def test_handoff_roundtrip_and_stale_invalidation(tmp_path):
    import jax

    p = str(tmp_path / "art.png")
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    write_image(p, img)
    arr = jax.device_put(img)
    register_device_artifact(p, arr)
    got = fetch_device_artifact(p)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), img)

    # rewriting the file must invalidate the cached device array
    time.sleep(0.01)
    write_image(p, img[::-1].copy())
    assert fetch_device_artifact(p) is None
    # and stays invalid on repeat lookups
    assert fetch_device_artifact(p) is None


def test_handoff_missing_file(tmp_path):
    import jax

    p = str(tmp_path / "gone.png")
    write_image(p, np.zeros((4, 4), np.uint8))
    register_device_artifact(p, jax.device_put(np.zeros((4, 4), np.uint8)))
    os.remove(p)
    assert fetch_device_artifact(p) is None


def test_handoff_lru_bound(tmp_path):
    import jax

    from plotweave.utils.io import _DEVICE_HANDOFF, _DEVICE_HANDOFF_CAP

    for i in range(_DEVICE_HANDOFF_CAP + 10):
        p = str(tmp_path / f"a{i}.png")
        write_image(p, np.full((2, 2), i % 256, np.uint8))
        register_device_artifact(p, jax.device_put(np.zeros((2, 2), np.uint8)))
    assert len(_DEVICE_HANDOFF) <= _DEVICE_HANDOFF_CAP


def test_config_doc_covers_every_field():
    """CONFIG.md must mention every PipelineConfig field (doc-coverage guard)."""
    from dataclasses import fields
    from pathlib import Path

    from plotweave.config import PipelineConfig

    doc = (Path(__file__).parent.parent / "CONFIG.md").read_text()
    missing = [f.name for f in fields(PipelineConfig) if f"`{f.name}`" not in doc]
    assert not missing, f"CONFIG.md missing: {missing}"
