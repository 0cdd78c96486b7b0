"""Pallas fused Zhang–Suen kernel: must be bit-identical to the XLA stencil
(interpreter mode on the CPU mesh; the TPU path is exercised by bench.py)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from plotweave.ops.pallas_kernels import zhang_suen_pallas
from plotweave.ops.thinning import zhang_suen

GOLDEN = Path(__file__).parent / "golden"


def test_pallas_thinning_identical_both_rings():
    z = np.load(GOLDEN / "thinning_cases.npz")
    for t in range(2):
        edges = z[f"edges_{t}"]
        for rotated, it in [(True, 120), (False, 48)]:
            ref = np.asarray(zhang_suen(edges, max_iter=it, rotated=rotated))
            got = np.asarray(
                zhang_suen_pallas(edges, max_iter=it, rotated=rotated, interpret=True)
            )
            assert (ref == got).all(), (t, rotated)


def test_pallas_thinning_batched():
    z = np.load(GOLDEN / "thinning_cases.npz")
    e = z["edges_0"]
    batch = np.stack([e, np.roll(e, 7, 0), np.roll(e, 3, 1)])
    ref = np.asarray(zhang_suen(batch, rotated=True))
    got = np.asarray(zhang_suen_pallas(batch, rotated=True, interpret=True))
    assert (ref == got).all()


def test_pallas_v3_packed_bit_identical_interpret():
    from plotweave.ops.pallas_kernels import zhang_suen_packed_pallas

    rng = np.random.default_rng(3)
    for _ in range(4):
        k = int(rng.integers(1, 4))
        h = int(rng.integers(5, 200))
        w = int(rng.integers(5, 200))
        x = (rng.random((k, h, w)) < rng.uniform(0.2, 0.7)).astype(np.uint8) * 255
        for rotated in (True, False):
            ref = np.asarray(zhang_suen(x, 120, rotated))
            got = np.asarray(zhang_suen_packed_pallas(x, 120, rotated, interpret=True))
            np.testing.assert_array_equal(ref, got)
