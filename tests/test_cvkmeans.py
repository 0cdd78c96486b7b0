"""Oracle fuzz for the bit-exact cv2.kmeans replication (ops/cvkmeans.py).

cv2's thread-local theRNG() starts from state 0xffffffff in a fresh process
(each reference step is a subprocess); ``cv2.setRNGSeed(0)`` restores exactly
that state (RNG(_state=0) maps 0 → 0xffffffff), giving an in-process oracle.

Covers: random/clustered/gradient/duplicate-heavy data, the empty-cluster
fix, K ∈ {1 .. 8}, K == N, varied criteria/attempts, and the native C++ vs
Python-fallback equivalence.
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from plotweave.native.api import cv_kmeans_native, km_assign_native  # noqa: E402
from plotweave.ops.cvkmeans import _cv_kmeans_py, assign_labels, cv_kmeans  # noqa: E402


def _oracle(data, K, max_count=40, eps=0.5, attempts=3):
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, max_count, eps)
    cv2.setRNGSeed(0)
    return cv2.kmeans(data.copy(), K, None, crit, attempts, cv2.KMEANS_PP_CENTERS)


def _check(data, K, max_count=40, eps=0.5, attempts=3, check_py=True):
    c_o, l_o, cen_o = _oracle(data, K, max_count, eps, attempts)
    c_m, l_m, cen_m = cv_kmeans(data, K, max_count=max_count, epsilon=eps, attempts=attempts)
    assert (cen_o == cen_m).all(), f"centers differ (K={K}, N={len(data)})"
    assert (l_o.ravel() == l_m).all(), f"labels differ (K={K}, N={len(data)})"
    assert abs(c_o - c_m) <= 1e-9 * max(1.0, abs(c_o)), "compactness drifted"
    if check_py:
        c_p, l_p, cen_p = _cv_kmeans_py(
            np.ascontiguousarray(data, np.float32), K, max_count, eps, attempts, 0xFFFFFFFF
        )
        assert (cen_p == cen_m).all() and (l_p == l_m).all(), "py fallback != native"


def test_random_integer_data():
    rng = np.random.default_rng(11)
    for _ in range(6):
        N, K = int(rng.integers(20, 1500)), int(rng.integers(2, 9))
        _check(rng.integers(0, 256, (N, 3)).astype(np.float32), K)


def test_photo_gradient_data():
    """Non-separable photo-class data: the case round-1 could not match."""
    rng = np.random.default_rng(12)
    for _ in range(4):
        N, K = int(rng.integers(200, 3000)), int(rng.integers(2, 6))
        base = np.linspace(0, 255, N)[:, None]
        data = np.rint(base + rng.normal(0, 6, (N, 3))).clip(0, 255).astype(np.float32)
        _check(data, K)


def test_empty_cluster_fix():
    """Duplicate-heavy data with K > distinct values exercises the
    steal-farthest-from-biggest empty-cluster path."""
    rng = np.random.default_rng(13)
    for _ in range(6):
        u = int(rng.integers(1, 5))
        vals = rng.integers(0, 256, (u, 3))
        N = int(rng.integers(u + 4, 300))
        data = vals[rng.integers(0, u, N)].astype(np.float32)
        _check(data, min(int(rng.integers(2, 9)), N))


def test_degenerate_shapes():
    rng = np.random.default_rng(14)
    _check(np.full((40, 3), 123, np.float32), 3)  # all-identical points
    _check(rng.integers(0, 256, (100, 3)).astype(np.float32), 1)  # K=1
    data = rng.integers(0, 256, (6, 3)).astype(np.float32)
    _check(data, 6)  # K == N
    _check(data, 5)


def test_criteria_and_attempts_lattice():
    rng = np.random.default_rng(15)
    for max_count in (2, 5, 40, 77):
        for eps in (0.0, 0.5, 4.0):
            for attempts in (1, 3):
                N = int(rng.integers(60, 600))
                data = rng.integers(0, 256, (N, 3)).astype(np.float32)
                _check(data, 4, max_count, eps, attempts, check_py=False)


def test_noninteger_float_data():
    """Float (non-integer) samples drive the sequential kmeans++ scan."""
    rng = np.random.default_rng(16)
    for _ in range(4):
        N = int(rng.integers(100, 1200))
        _check((rng.random((N, 3)) * 255).astype(np.float32), 4)


def test_production_scale_subsample():
    """The reference's actual operating point: 200k Lab pixels, k=4."""
    rng = np.random.default_rng(17)
    base = np.linspace(0, 255, 200_000)[:, None]
    data = np.rint(base + rng.normal(0, 10, (200_000, 3))).clip(0, 255).astype(np.float32)
    _check(data, 4, check_py=False)  # py fallback is exercised at small N


def test_assign_labels_matches_reference_numpy():
    """assign_labels == the reference's vectorized numpy assignment
    (02_color_extract.py:52-55), native and fallback."""
    rng = np.random.default_rng(18)
    for n in (999, 300_000):
        lab = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        cen = (rng.random((5, 3)) * 255).astype(np.float32)
        diffs = lab.astype(np.float32)[:, None, :] - cen[None, :, :]
        ref = np.argmin(np.sum(diffs * diffs, axis=2), axis=1)
        got_native = km_assign_native(lab, cen)
        assert got_native is not None and (got_native == ref).all()
        # numpy fallback path (chunked) — call the internals directly
        import plotweave.ops.cvkmeans as m

        orig = m.np.argmin  # smoke guard that we run the same module
        assert orig is np.argmin
        from unittest import mock

        with mock.patch("plotweave.native.api.km_assign_native", return_value=None):
            got_py = assign_labels(lab, cen)
        assert (got_py == ref).all()


def test_native_available():
    """The production path must actually be native on this machine."""
    import os

    if os.environ.get("PLOTWEAVE_NO_NATIVE"):
        pytest.skip("native disabled")
    data = np.zeros((4, 3), np.float32)
    assert cv_kmeans_native(data, 2, 40, 0.5, 1, 0xFFFFFFFF) is not None


def test_nan_data_raises_not_oob():
    """All-NaN data leaves every kmeans++ trial cost NaN: OpenCV raises
    CV_Error; both our paths must raise RuntimeError instead of reading
    data[-1] out of bounds (ADVICE r2 #3)."""
    import os

    from plotweave.ops.cvkmeans import _cv_kmeans_py

    bad = np.full((64, 3), np.nan, np.float32)
    with pytest.raises(RuntimeError):
        _cv_kmeans_py(bad, 3, 40, 0.5, 3, 0xFFFFFFFF)
    if not os.environ.get("PLOTWEAVE_NO_NATIVE") and cv_kmeans_native(
        np.zeros((4, 3), np.float32), 2, 40, 0.5, 1, 0xFFFFFFFF
    ):
        with pytest.raises(RuntimeError):
            cv_kmeans_native(bad, 3, 40, 0.5, 3, 0xFFFFFFFF)


def test_maxcount_above_cv2_clamp():
    """cv2 clamps criteria.maxCount to min(max(mc,2),100); configs with
    kmeans_iters > 100 must keep byte parity (found by round-2 review)."""
    rng = np.random.default_rng(99)
    data = rng.uniform(0, 255, (20000, 3)).astype(np.float32)
    _check(data, 12, max_count=300, eps=0.0, attempts=1)
