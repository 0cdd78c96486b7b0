"""Native virtual-draw equivalence: fragments AND forbid-canvas must be
bit-identical to the Python loop, and the stamp table must reproduce
cv2.line exactly for every delta it covers."""

from __future__ import annotations

import numpy as np
import pytest

from plotweave.native import available

pytestmark = pytest.mark.skipif(not available(), reason="native library unavailable")


def test_stamp_table_reproduces_cv2_line_exactly():
    import cv2

    from plotweave.native.api import LineStampTable

    for brush in (3, 11, 36):
        R = 6
        t = LineStampTable(brush, R)
        m = R + brush + 4
        side = 2 * R + 1
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                ref = np.zeros((2 * m + 1, 2 * m + 1), np.uint8)
                cv2.line(ref, (m, m), (m + dx, m + dy), 255, brush, cv2.LINE_8)
                mine = np.zeros_like(ref)
                key = (dy + R) * side + (dx + R)
                s0 = t.span_start[key]
                for i in range(t.span_count[key]):
                    r = m + t.span_row[s0 + i]
                    mine[r, m + t.span_x0[s0 + i] : m + t.span_x1[s0 + i] + 1] = 255
                assert (ref == mine).all(), (brush, dx, dy)


def test_native_virtual_draw_bit_identical():
    import plotweave.native.api as napi
    from plotweave.vector.dedup_intra import virtual_draw_cut

    rng = np.random.default_rng(9)
    W, H = 500, 400
    polys = []
    for _ in range(40):
        n = int(rng.integers(3, 60))
        start = rng.uniform(20, 380, 2)
        steps = rng.normal(0, 12, (n, 2)).cumsum(axis=0)
        polys.append(np.clip(start + steps, 1, 399).astype(np.int32).reshape(-1, 1, 2))

    orig = napi.virtual_draw_native
    napi.virtual_draw_native = lambda *a, **k: None  # force Python path
    try:
        m_py = np.zeros((H, W), np.uint8)
        r_py = [virtual_draw_cut(p, m_py, 10.0, 10.0, 4.0, 40.0, 13) for p in polys]
    finally:
        napi.virtual_draw_native = orig

    m_nat = np.zeros((H, W), np.uint8)
    r_nat = [virtual_draw_cut(p, m_nat, 10.0, 10.0, 4.0, 40.0, 13) for p in polys]

    assert (m_py == m_nat).all()
    for a, b in zip(r_py, r_nat):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_native_virtual_draw_bails_on_offcanvas():
    from plotweave.native.api import virtual_draw_native

    canvas = np.zeros((50, 50), np.uint8)
    samples = np.array([[10.0, 10.0], [200.0, 10.0]])  # leaves the canvas
    assert virtual_draw_native(samples, canvas, 5.0, 5.0, 20.0, 3, 6) is None


def test_native_virtual_draw_bails_near_border():
    """cv2 thick lines are NOT translation-invariant once the unclipped
    stamp crosses the image border (cv2 clips the center segment before
    thickening), so the native path must reject contours whose samples fall
    within the stamp extent of the border — they replay through cv2."""
    from plotweave.native.api import LineStampTable, virtual_draw_native

    canvas = np.zeros((60, 60), np.uint8)
    t = LineStampTable(4, 5)
    assert t.extent > 0
    edge = float(t.extent - 1)
    samples = np.array([[edge, 30.0], [edge, 33.0], [edge, 36.0]])
    assert virtual_draw_native(samples, canvas, 2.0, 4.0, 10.0, 4, 5) is None
    inner = float(t.extent)
    samples = np.array([[inner, 30.0], [inner, 33.0], [inner, 36.0]])
    assert virtual_draw_native(samples, canvas, 2.0, 4.0, 10.0, 4, 5) is not None


def test_resample_batch_native_bit_identical():
    """pw_resample_batch vs the per-contour Python resample_arclen —
    including closed contours, duplicate-point runs, empty and singleton
    contours, and non-integer steps."""
    from plotweave.native.api import resample_batch_native
    from plotweave.vector.geometry import ensure_open, resample_arclen

    rng = np.random.default_rng(42)
    for trial in range(60):
        k = int(rng.integers(1, 16))
        step = max(1.0, float(rng.choice([1.0, 1.5, 0.37, 3.14159, 7.0])))
        p32s, closed, refs = [], [], []
        for _ in range(k):
            n = int(rng.integers(0, 60))
            pts = rng.integers(-50, 2200, (n, 2)).astype(np.int32)
            if n > 3 and rng.random() < 0.3:
                pts[-1] = pts[0]
            if n > 4 and rng.random() < 0.2:
                pts[1::2] = pts[0]
            opened = (
                ensure_open(pts).reshape(-1, 2).astype(np.float32)
                if n else np.zeros((0, 2), np.float32)
            )
            p32s.append(opened)
            closed.append(len(opened) > 2 and bool(np.all(opened[0] == opened[-1])))
            refs.append(
                np.asarray(resample_arclen(opened, step=step), np.float64).reshape(-1, 2)
                if len(opened) >= 2 else None
            )
        out = resample_batch_native(p32s, np.array(closed, np.uint8), step)
        assert out is not None
        sx, sy, offs = out
        for i in range(k):
            if refs[i] is None:
                continue
            got = np.stack([sx[offs[i]:offs[i + 1]], sy[offs[i]:offs[i + 1]]], axis=1)
            np.testing.assert_array_equal(got, refs[i], err_msg=f"trial {trial} contour {i}")


def test_dedup_layer_batched_vs_python_bit_identical():
    """The whole-layer batched pass A (resample + virtual draw in a handful
    of native calls, border/off-canvas contours replayed through Python
    mid-sequence) against the pure-Python per-contour loop."""
    import plotweave.native.loader as LOADER
    from plotweave.vector.dedup_intra import dedup_layer

    rng = np.random.default_rng(7)
    kw = dict(tap_diam=6.0, tap_max_dim=8.0, min_keep=3.0, tap_max_perimeter=20.0,
              tap_max_vertices=12, sample_step=1.0, tail_len_px=10.0,
              collision_radius=2.0, grid_cell=4.0, max_jump=12.0,
              post_enabled=False, post_brush=3, post_step=2.0, post_rdp_eps=0.8,
              post_min_len=4)
    for trial in range(12):
        W, H = int(rng.integers(80, 420)), int(rng.integers(80, 420))
        polys = []
        for _ in range(int(rng.integers(1, 120))):
            n = int(rng.integers(2, 40))
            start = rng.integers(0, [W, H], 2).astype(np.float64)
            steps = rng.normal(0, 6, (n - 1, 2))
            pts = np.clip(np.cumsum(np.vstack([start, steps]), axis=0), -8, [W + 8, H + 8])
            polys.append(pts.astype(np.int32).reshape(-1, 1, 2))
        kw2 = dict(kw, sample_step=float(rng.choice([1.0, 1.5, 2.0])),
                   collision_radius=float(rng.choice([1.0, 2.0, 3.5])))
        lines_a, taps_a = dedup_layer([p.copy() for p in polys], (W, H), **kw2)
        old = LOADER._lib, LOADER._tried
        LOADER._lib, LOADER._tried = None, True
        try:
            lines_b, taps_b = dedup_layer([p.copy() for p in polys], (W, H), **kw2)
        finally:
            LOADER._lib, LOADER._tried = old
        assert taps_a == taps_b, f"trial {trial}"
        assert len(lines_a) == len(lines_b), f"trial {trial}"
        for x, y in zip(lines_a, lines_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=f"trial {trial}")
