"""Byte-exactness of the periodic fixpoint render elision (viz/previews.py).

The reference's cycle walks respin tiny loops thousands of times (guard =
4×fg, 04_find_contours.py:174-205), so preview layers carry millions of
byte-mandated duplicate segments.  render_layer elides repeat passes once a
full period leaves the canvas unchanged — these tests pin that the result
is IDENTICAL to the plain single-call render for AA and non-AA lines,
thicknesses, colors, partial periods, and non-periodic neighbors.
"""

from __future__ import annotations

import cv2
import numpy as np
import pytest

from plotweave.viz.previews import _PERIODIC_MIN, _find_period, render_layer


def _spin_poly(rng, reps: int, cycle_len: int = 0, prefix: int = 0, tail: int = 0):
    """prefix walk + `reps` exact repeats of a closed pixel cycle + tail —
    the shape the reference's guarded cycle walk produces."""
    cycle_len = cycle_len or int(rng.integers(8, 60))
    cx, cy = int(rng.integers(60, 200)), int(rng.integers(60, 200))
    t = np.linspace(0, 2 * np.pi, cycle_len, endpoint=False)
    r = int(rng.integers(4, 18))
    cyc = np.stack([cx + np.rint(r * np.cos(t)), cy + np.rint(r * np.sin(t))], axis=1).astype(np.int32)
    parts = []
    if prefix:
        x0, y0 = int(rng.integers(0, 250)), int(rng.integers(0, 250))
        parts.append(np.stack([np.linspace(x0, cyc[0, 0], prefix), np.linspace(y0, cyc[0, 1], prefix)], axis=1).astype(np.int32))
    parts.extend([cyc] * reps)
    parts.append(cyc[:1])  # walk re-enters the start
    if tail:
        x1, y1 = int(rng.integers(0, 250)), int(rng.integers(0, 250))
        parts.append(np.stack([np.linspace(cyc[0, 0], x1, tail), np.linspace(cyc[0, 1], y1, tail)], axis=1).astype(np.int32))
    return np.concatenate(parts).reshape(-1, 1, 2)


def _plain_render(size_wh, lines, color, thickness, aa):
    w, h = size_wh
    img = np.full((h, w, 3), 255, np.uint8)
    lt = cv2.LINE_AA if aa else cv2.LINE_8
    arrs = [np.asarray(p).reshape(-1, 1, 2).astype(np.int32) for p in lines if len(p) >= 2]
    if arrs:
        cv2.polylines(img, arrs, False, color, thickness, lt)
    return img


@pytest.mark.parametrize("aa", [True, False])
@pytest.mark.parametrize("thickness", [1, 2])
def test_periodic_render_byte_exact_fuzz(aa, thickness):
    rng = np.random.default_rng(5 + thickness + (10 if aa else 0))
    for trial in range(8):
        cycle_len = int(rng.integers(8, 60))
        reps = int(rng.integers(60, 400)) + (_PERIODIC_MIN // cycle_len) + 1
        lines = [
            _spin_poly(rng, reps, cycle_len=cycle_len,
                       prefix=int(rng.integers(0, 40)), tail=int(rng.integers(0, 40))),
            rng.integers(0, 250, (20, 1, 2)).astype(np.int32),  # ordinary neighbor
            _spin_poly(rng, reps // 2),
        ]
        assert any(len(p) >= _PERIODIC_MIN for p in lines), "fuzz must hit the elision path"
        color = tuple(int(v) for v in rng.integers(0, 255, 3))
        got = render_layer((260, 260), lines, color, thickness, aa)
        ref = _plain_render((260, 260), lines, color, thickness, aa)
        assert (got == ref).all(), (trial, aa, thickness)


def test_periodic_render_poster_class_elides_and_matches():
    """A 7M-vertex spun layer (poster-class) must render byte-identically
    while actually ELIDING most repeat passes (wall-clock asserts are flaky
    on this contended 1-core host, so elision is counted, not timed)."""
    rng = np.random.default_rng(1)
    lines = [_spin_poly(rng, 5000, cycle_len=224, prefix=60, tail=60) for _ in range(6)]
    total_verts = sum(len(p) for p in lines)

    drawn = {"verts": 0}
    orig = cv2.polylines

    def counting(img, pts, *a, **k):
        drawn["verts"] += sum(len(p) for p in pts)
        return orig(img, pts, *a, **k)

    cv2.polylines = counting
    try:
        got = render_layer((420, 594), lines, (0, 0, 0), 1, True)
    finally:
        cv2.polylines = orig
    ref = _plain_render((420, 594), lines, (0, 0, 0), 1, True)
    assert (got == ref).all()
    assert drawn["verts"] < total_verts * 0.1, (
        f"elision should skip ≥90% of segment draws: drew {drawn['verts']} of {total_verts}"
    )


def test_find_period_duplicate_run_cycles():
    """Cycles whose duplicate-point plateaus make the midpoint anchor pair
    recur at TWO alternating offsets per period (observed on poster-class
    layers: a 60-vertex oscillation with 8 unique points defeated the modal-
    spacing candidates and 1.1M vertices were drawn plainly).  The transition
    anchor + spacing-sum candidate must detect these, and the render must
    stay byte-exact."""
    y = 23
    plateau = [(345, 2), (346, 6), (347, 5), (348, 10), (347, 3), (346, 4)]
    cyc = np.array(
        [[x, y] for x, n in plateau for _ in range(n)], np.int32
    )
    reps = _PERIODIC_MIN // len(cyc) + 40
    pts = np.concatenate([cyc] * reps + [cyc[:1]])
    found = _find_period(pts)
    assert found is not None, "duplicate-run cycle must be detected"
    s, T, k = found
    assert T % len(cyc) == 0 and k >= 3
    lines = [pts.reshape(-1, 1, 2)]
    got = render_layer((260, 260), lines, (40, 50, 60), 1, True)
    ref = _plain_render((260, 260), lines, (40, 50, 60), 1, True)
    assert (got == ref).all()


def test_render_layer_period_memo_byte_exact():
    """The period memo shared between the black and colored renders must not
    change a single byte vs memo-less renders."""
    rng = np.random.default_rng(7)
    lines = [
        _spin_poly(rng, 300, cycle_len=40, prefix=20, tail=20),
        rng.integers(0, 250, (30, 1, 2)).astype(np.int32),
        _spin_poly(rng, 200, cycle_len=17),
    ]
    memo: dict = {}
    for color in [(0, 0, 0), (90, 140, 220)]:
        with_memo = render_layer((260, 260), lines, color, 1, True, period_memo=memo)
        without = render_layer((260, 260), lines, color, 1, True)
        assert (with_memo == without).all()
    assert memo, "memo must have been populated"


def test_find_period_shapes():
    rng = np.random.default_rng(3)
    p = _spin_poly(rng, 100, cycle_len=30)[:, 0, :]
    found = _find_period(p)
    assert found is not None
    s, T, k = found
    assert T % 30 == 0 and k >= 3
    # non-periodic data: no detection
    q = rng.integers(0, 1000, (8000, 2)).astype(np.int32)
    assert _find_period(q) is None


def test_find_period_native_matches_python_fuzz():
    """The C++ detector (pw_find_period) must return EXACTLY what the numpy
    reference returns — same (s, T, k) or same None — across the adversarial
    families (pure periods with prefix/tail, random walks, duplicate-point
    stretches, constants, stitched periods).  Rendering is byte-exact for any
    valid fixpoint, but parity keeps the two paths interchangeable."""
    from plotweave.native.api import find_period_native
    from plotweave.viz.previews import _find_period_py

    if find_period_native(np.zeros(8, np.int64)) == "unavailable":
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(120):
        kind = trial % 5
        if kind == 0:
            T = int(rng.integers(2, 60)); k = int(rng.integers(3, 30))
            period = rng.integers(0, 500, (T, 2))
            pre = rng.integers(0, 500, (int(rng.integers(0, 40)), 2))
            tail = rng.integers(0, 500, (int(rng.integers(0, 40)), 2))
            pts = np.concatenate([pre, np.tile(period, (k, 1)), period[:1], tail])
        elif kind == 1:
            n = int(rng.integers(8, 3000))
            pts = np.cumsum(rng.integers(-2, 3, (n, 2)), axis=0)
        elif kind == 2:
            T = int(rng.integers(3, 30)); k = int(rng.integers(3, 20))
            period = np.repeat(rng.integers(0, 100, (T, 2)), rng.integers(1, 4, T), axis=0)
            pts = np.tile(period, (k, 1))
        elif kind == 3:
            pts = np.full((int(rng.integers(8, 500)), 2), 7)
        else:
            Ta, Tb = int(rng.integers(2, 20)), int(rng.integers(2, 20))
            pa = np.tile(rng.integers(0, 50, (Ta, 2)), (int(rng.integers(2, 8)), 1))
            pb = np.tile(rng.integers(0, 50, (Tb, 2)), (int(rng.integers(3, 12)), 1))
            pts = np.concatenate([pa, pb])
        pts = pts.astype(np.int32)
        n = len(pts); j0 = n // 2
        if j0 + 2 >= n:
            continue
        v = np.ascontiguousarray(pts, np.int32).view(np.int64).ravel()
        assert find_period_native(v) == _find_period_py(v, n, j0), f"trial {trial}"
        checked += 1
    assert checked > 100
