"""Pin the float semantics of np.linalg.norm replicas.

The reference measures tail lengths with ``np.linalg.norm`` on float64
2-vectors (08_dedup_layer_basic.py:141,149).  That routes through BLAS ddot,
whose n=2 kernel computes ``fma(d1, d1, d0*d0)`` — one ulp off the naive
``d0*d0 + d1*d1`` in ~0.3% of inputs.  With small ``tail_len_px`` the aging
comparison flips on that ulp (lattice fuzz seed 1078), so both the Python
fallback (``dedup_intra._norm2``) and the native C++ (std::fma) replicate
the fma order.  These tests pin the equivalence on this host; if a BLAS
change ever breaks it, they fail loudly rather than as a silent stream diff.
"""

from __future__ import annotations

import numpy as np

from plotweave.vector.dedup_intra import _norm2


def test_norm2_matches_linalg_norm_float64():
    rng = np.random.default_rng(1234)
    for scale in (1.0, 3.0, 300.0, 1e6):
        a = (rng.random((50_000, 2)) * scale).astype(np.float32).astype(np.float64)
        b = (rng.random((50_000, 2)) * scale).astype(np.float32).astype(np.float64)
        for x, y in zip(a, b):
            d = x - y
            assert _norm2(float(d[0]), float(d[1])) == float(np.linalg.norm(d))


def test_native_virtual_draw_tail_matches_python():
    """Native and fallback must cut identically on a tail-ulp-sensitive case."""
    import os

    if os.environ.get("PLOTWEAVE_NO_NATIVE"):
        import pytest

        pytest.skip("native disabled")
    from unittest import mock

    from plotweave.vector.dedup_intra import virtual_draw_cut

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(30, 200))
        steps = rng.integers(-3, 4, (n, 2)).cumsum(axis=0) + 60
        poly = np.clip(steps, 0, 119).astype(np.int32).reshape(-1, 1, 2)
        kwargs = dict(
            grid_radius=float(rng.integers(2, 8)),
            grid_cell=float(rng.integers(5, 25)),
            sample_step=float(rng.choice([1, 2, 3])),
            tail_len_px=float(rng.choice([2.0, 3.0, 5.0, 9.0])),
            brush=int(rng.integers(2, 10)),
        )
        canvas_a = np.zeros((120, 120), np.uint8)
        canvas_b = np.zeros((120, 120), np.uint8)
        frags_native = virtual_draw_cut(poly, canvas_a, **kwargs)
        with mock.patch("plotweave.native.api.virtual_draw_native", return_value=None):
            frags_py = virtual_draw_cut(poly, canvas_b, **kwargs)
        assert (canvas_a == canvas_b).all(), f"trial {trial}: canvases differ"
        assert len(frags_native) == len(frags_py), f"trial {trial}"
        for fa, fb in zip(frags_native, frags_py):
            assert np.array_equal(fa, fb), f"trial {trial}"


def test_float32_norm_is_plain_accumulation():
    """08:190 computes np.linalg.norm on float32 2-vectors; for f32 numpy
    does NOT use the fma kernel — plain f32 (d0²+d1²) then sqrt matches
    (split_on_jumps relies on this)."""
    rng = np.random.default_rng(5)
    a = (rng.random((100_000, 2)) * 300).astype(np.float32)
    b = (rng.random((100_000, 2)) * 300).astype(np.float32)
    d = a - b
    vec = np.sqrt((d * d).sum(axis=1))
    for i in range(0, 100_000, 997):
        assert float(vec[i]) == float(np.linalg.norm(d[i]))
