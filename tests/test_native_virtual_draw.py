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
