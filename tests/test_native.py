"""Native C++ runtime equivalence: the encoder and tracer must be
byte-/array-identical to the Python implementations (fuzzed)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from plotweave.native import available
from plotweave.stream import MotionProfile, StreamBuilder, emit_polyline, travel_ramped

pytestmark = pytest.mark.skipif(not available(), reason="native library unavailable")

GOLDEN = Path(__file__).parent / "golden"


def _random_profile(rng, scurve: bool) -> MotionProfile:
    return MotionProfile(
        div_start=int(rng.integers(10, 30)),
        div_fast=int(rng.integers(5, 16)),
        profile="scurve" if scurve else "triangle",
        corner_deg=float(rng.uniform(30, 120)),
        corner_div=int(rng.integers(10, 32)),
        corner_window_steps=int(rng.integers(5, 900)),
        short_len_steps=int(rng.integers(10, 200)),
        short_div=int(rng.integers(8, 20)),
        travel_div_fast=int(rng.integers(4, 12)),
        travel_start_div=int(rng.integers(4, 32)),
        travel_window_steps=int(rng.integers(3, 300)),
        travel_quant_step=int(rng.integers(1, 7)),
    )


def test_native_encoder_fuzz_byte_identical():
    from plotweave.native.api import NativeStreamBuilder

    rng = np.random.default_rng(3)
    for trial in range(25):
        prof = _random_profile(rng, scurve=trial % 2 == 1)
        py = StreamBuilder()
        nat = NativeStreamBuilder()
        pos = (0, 0)
        for _ in range(10):
            op = rng.integers(0, 4)
            if op == 0:
                pts = [tuple(int(v) for v in p) for p in rng.integers(0, 4000, (int(rng.integers(2, 15)), 2))]
                py.pen_down()
                emit_polyline(py, prof, pts)
                py.pen_up()
                nat.pen_down()
                nat.polyline(pts, prof)
                nat.pen_up()
            elif op == 1:
                dst = tuple(int(v) for v in rng.integers(0, 9000, 2))
                travel_ramped(py, *pos, *dst, prof)
                nat.travel(*pos, *dst, prof)
                pos = dst
            elif op == 2:
                c = int(rng.integers(0, 8))
                py.select_color(c)
                nat.select_color(c)
            else:
                py.tap()
                nat.tap()
        assert py.finish() == nat.finish(), f"trial {trial}"


def test_native_tracer_identical_on_goldens():
    from plotweave.native.api import trace_skeleton_native
    from plotweave.vector.trace import trace_skeleton

    z = np.load(GOLDEN / "thinning_cases.npz")
    for t in range(4):
        skel = z[f"skel04_{t}"] * 255
        p_py = trace_skeleton(skel)
        p_nat = trace_skeleton_native(skel)
        assert p_nat is not None
        assert len(p_py) == len(p_nat)
        for a, b in zip(p_py, p_nat):
            assert np.array_equal(a, b)


def test_emitter_backend_reports_native():
    from plotweave.stream.emitter import StreamEmitter

    assert StreamEmitter().backend == "native"
    import os

    os.environ["PLOTWEAVE_NO_NATIVE"] = "1"
    try:
        # loader caches; just check the python path is constructible
        e = StreamEmitter(use_native=False)
        assert e.backend == "python"
        e.pen_up()
        assert len(e.finish()) == 1024
    finally:
        del os.environ["PLOTWEAVE_NO_NATIVE"]


def test_native_thin_fuzz_identical_to_jax():
    from plotweave.native.api import thin_native
    from plotweave.ops import zhang_suen

    rng = np.random.default_rng(11)
    for trial in range(12):
        h, w = int(rng.integers(8, 90)), int(rng.integers(8, 90))
        img = (rng.random((h, w)) < rng.uniform(0.2, 0.8)).astype(np.uint8) * 255
        for rotated in (False, True):
            for max_iter in (48, 120):
                ours = thin_native(img, max_iter=max_iter, rotated=rotated)
                ref = np.asarray(zhang_suen(img, max_iter=max_iter, rotated=rotated))
                assert ours is not None
                np.testing.assert_array_equal(ours, ref.astype(np.uint8))


def test_native_component_path_fuzz_identical_to_python():
    import cv2

    from plotweave.native.api import component_path_native
    from plotweave.vector.dedup_intra import _component_path

    rng = np.random.default_rng(12)
    for trial in range(20):
        h, w = int(rng.integers(10, 70)), int(rng.integers(10, 70))
        img = np.zeros((h, w), np.uint8)
        for _ in range(int(rng.integers(1, 6))):
            p0 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.line(img, p0, p1, 255, 1)
        num, lab = cv2.connectedComponents((img > 0).astype(np.uint8), connectivity=8)
        lab = lab.astype(np.int32)
        min_len = int(rng.integers(2, 8))
        ys, xs = np.nonzero(img)
        anchors = [None, None]
        if ys.size:
            for i in range(2):
                if rng.random() < 0.7:
                    j = int(rng.integers(0, ys.size))
                    anchors[i] = (int(ys[j]), int(xs[j]))
                else:
                    anchors[i] = (int(rng.integers(0, h)), int(rng.integers(0, w)))
        a0, a1 = anchors
        for cc in range(1, int(num)):
            native = component_path_native(lab, cc, a0, a1, min_len)
            comp = (lab == cc).astype(np.uint8) * 255
            aa = a0 if (a0 is not None and comp[a0]) else None
            ab = a1 if (a1 is not None and comp[a1]) else None
            ref = _component_path(comp, aa, ab, min_len=min_len)
            assert [(int(y), int(x)) for (y, x) in native] == [(int(y), int(x)) for (y, x) in ref]


def test_native_degree_matches_python():
    import cv2

    from plotweave.native.api import get_lib
    from plotweave.native.loader import bind_skeleton_ops
    from plotweave.vector.trace import degree_map
    import ctypes

    lib = get_lib()
    bind_skeleton_ops(lib)
    rng = np.random.default_rng(4)
    for _ in range(8):
        h, w = int(rng.integers(4, 80)), int(rng.integers(4, 80))
        m = (rng.random((h, w)) < 0.4).astype(np.uint8)
        num, lab = cv2.connectedComponents(m, connectivity=8)
        lab = np.ascontiguousarray(lab.astype(np.int32))
        out = np.empty((h, w), np.uint8)
        lib.pw_degree(
            lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        np.testing.assert_array_equal(out, degree_map(m))


def test_native_trace_cycle_heavy_matches_python():
    """Overlapping circles make junction-rich components whose cycle walks
    revisit heavily (capacity-retry path) — outputs must still match."""
    import cv2

    from plotweave.ops import zhang_suen
    from plotweave.vector.trace import trace_skeleton
    from plotweave.native.api import trace_skeleton_native

    rng = np.random.default_rng(9)
    img = np.zeros((160, 200), np.uint8)
    for _ in range(25):
        x, y = int(rng.integers(0, 200)), int(rng.integers(0, 160))
        cv2.circle(img, (x, y), int(rng.integers(8, 50)), 255, 1)
    skel = (np.asarray(zhang_suen(img, 120, True)) > 0).astype(np.uint8)
    a = trace_skeleton_native(skel)
    b = trace_skeleton(skel)
    assert a is not None and len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_native_trace_cap_factor_tracks_need():
    """The adaptive walk-buffer factor must follow each call's actual need,
    not ratchet to the process max forever (one spin-heavy layer used to
    make every later trace allocate fg*factor_max points up front), and the
    post-overshoot compaction must not change the traced output."""
    import cv2

    import plotweave.native.api as A
    from plotweave.vector.trace import trace_skeleton

    if A.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    # a plain open path: needs factor ~1
    plain = np.zeros((40, 200), np.uint8)
    plain[20, 5:195] = 1

    old = A._TRACE_CAP_FACTOR
    try:
        A._TRACE_CAP_FACTOR = 256  # simulate a prior spin-heavy layer
        a = A.trace_skeleton_native(plain)
        b = trace_skeleton(plain)
        assert a is not None and len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # compaction: the returned views must not pin the fg*256 buffer
        base = a[0].base
        while getattr(base, "base", None) is not None:
            base = base.base
        assert base.nbytes <= plain.sum() * 2 * 4 * 8, "walk buffer not compacted"
        assert A._TRACE_CAP_FACTOR <= 4, "factor must decay to this call's need"
    finally:
        A._TRACE_CAP_FACTOR = old


def test_native_trace_spin_fast_path_exact():
    """Guard-bounded spin walks (the reference's 4×fg cycle respins) take the
    Brent cycle-detection bulk-replay fast path in pw_trace — output must be
    byte-identical to the plain Python walker.  The fixture is a real
    thinned-skeleton component from the 4K poster benchmark whose phase-2
    walks emit ~85× fg points (rho-shaped orbits: aperiodic transients
    through previously-visited pixels, then tiny limit cycles — exactly the
    shape a fixed-anchor detector misses)."""
    import base64
    import zlib

    import plotweave.native.api as A
    from plotweave.vector.trace import trace_skeleton

    if A.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    b64 = (
        "eNpVUTFOw0AQnLNPxpEskVCgFClOfoFFGkoXPMTwAvjBCVGkpMxz/AAeYeUFoUeYvdudkzjJ"
        "8nhvdndmDMipI/S476uhRwxWioLzOYC1GZiAm3X9zR9uIdPrfQ1sFTVYRkVt826jh4fW0PM5"
        "GPoYTUJ1rKzUnUi7n0h7A5V60hBIQ1x42bG0ZSfG4rFmyRffoUyLnFbRAlqMpLl1/VGaPLdp"
        "2EVdJrlZtDwveedeYmjzfAlt36tzuDnT8IquCoYWrzKGA3YW/ownRT2cyTjBqwwXsDH9ETo3"
        "9elc6XP6k6TPGuS1i6T1pOGLNNsgtGYiTZUn2pE0kyRL3WdGd+JwNm0MrcS9IaATFCeSEnOn"
        "HLk8l7/CtG31/wUTUUoff9m5Lo0="
    )
    crop = np.unpackbits(
        np.frombuffer(zlib.decompress(base64.b64decode(b64)), np.uint8)
    )[: 72 * 78].reshape(72, 78).astype(np.uint8)
    fg = int(crop.sum())
    assert fg == 357

    a = A.trace_skeleton_native(crop)
    b = trace_skeleton(crop)
    assert a is not None and len(a) == len(b)
    total = sum(len(x) for x in a)
    assert total > 50 * fg, "fixture must actually spin (guard-bounded walks)"
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_native_greedy_order_fuzz_identical():
    """The C++ selection loop vs the pure-Python one, with engineered ties
    (duplicate endpoints) and both closed_aware modes."""
    import os

    from plotweave.vector import sort as vsort

    rng = np.random.default_rng(21)
    for trial in range(25):
        n = int(rng.integers(2, 60))
        polys = []
        pool = rng.integers(0, 30, size=(max(4, n // 2), 2))  # small pool → ties
        for _ in range(n):
            m = int(rng.integers(2, 8))
            pts = pool[rng.integers(0, len(pool), size=m)]
            if rng.random() < 0.3:
                pts = np.vstack([pts, pts[0:1]])  # closed
            polys.append(pts.astype(np.int32).reshape(-1, 1, 2))
        for closed_aware in (False, True):
            closed = [bool(np.all(vsort.as_pts(p)[0] == vsort.as_pts(p)[-1])) and len(p) > 1 for p in polys]
            lengths = [float(vsort.perimeter_open(p)) for p in polys]
            starts = np.array([vsort._endpoints(c, closed_aware)[0] for c in polys])
            ends = np.array([vsort._endpoints(c, closed_aware)[1] for c in polys])
            seed = int(np.argmax(lengths))
            native = vsort._greedy_order_native(starts, ends, closed, closed_aware, seed)
            assert native is not None
            # pure python path: force the fallback
            os.environ["_PW_TEST"] = "1"
            try:
                orig = vsort._greedy_order_native
                vsort._greedy_order_native = lambda *a: None
                py = vsort.greedy_order(polys, lengths, closed, closed_aware)
            finally:
                vsort._greedy_order_native = orig
                os.environ.pop("_PW_TEST", None)
            assert native == (py[0], py[1]) or (list(native[0]), list(native[1])) == (py[0], py[1])


def test_batch_arc_length_sequential_exact():
    """batch_arc_length must equal the scalar arc_length (cv2.arcLength's
    sequential double accumulation) BIT-exactly — np.add.reduceat-style
    unrolled sums differ at the ulp from n≈4 up, which is an argmax-seed
    risk in the stage-07/10 greedy ordering."""
    from plotweave.vector.geometry import arc_length, batch_arc_length

    rng = np.random.default_rng(3)
    for trial in range(60):
        k = int(rng.integers(1, 30))
        ptss = [
            rng.integers(-13000, 13000, (int(rng.integers(0, 50)), 2)).astype(np.int32)
            for _ in range(k)
        ]
        closed = rng.random(k) < 0.5
        a = batch_arc_length(ptss, closed)
        c = np.array([arc_length(p, bool(cl)) for p, cl in zip(ptss, closed)])
        np.testing.assert_array_equal(a, c, err_msg=f"trial {trial}")

    # the zero-copy native path (pw_arc_batch_ptrs) hands the C loop each
    # contour's own storage — pin the non-contiguous / oddly-shaped inputs
    # that force its ascontiguousarray fallback: reversed views, every-other
    # row slices, and the pipeline's (N, 1, 2) contour layout
    base = rng.integers(-13000, 13000, (41, 2)).astype(np.int32)
    ptss = [base[::-1], base[::2], base.reshape(-1, 1, 2), base[5:29]]
    closed = np.array([True, False, True, False])
    a = batch_arc_length(ptss, closed)
    c = np.array([arc_length(p, bool(cl)) for p, cl in zip(ptss, closed)])
    np.testing.assert_array_equal(a, c)


def test_native_scale_batch_bit_identical():
    """pw_scale_batch (fused int32→float32-affine→int32 pass) must equal the
    numpy chain bit-for-bit: same int32→float32 conversion, single IEEE
    float32 mul/add (no fma), same truncating cast — stage 05's artifact is
    byte-compared in the e2e contract."""
    import plotweave.vector.scale as S

    rng = np.random.default_rng(17)

    def numpy_path(polys, *a):
        orig = S._scale_polys_native
        S._scale_polys_native = lambda *x: None
        try:
            return S.scale_polys(polys, *a)
        finally:
            S._scale_polys_native = orig

    for trial in range(120):
        k = int(rng.integers(1, 12))
        polys = [
            rng.integers(-13000, 13000, (int(rng.integers(1, 60)), 1, 2)).astype(np.int32)
            for _ in range(k)
        ]
        sx, sy = float(rng.uniform(0.001, 50)), float(rng.uniform(0.001, 50))
        dx, dy = float(rng.integers(-100, 100)), float(rng.integers(-100, 100))
        a = S.scale_polys(polys, sx, sy, dx, dy)
        b = numpy_path(polys, sx, sy, dx, dy)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x.dtype == y.dtype and x.shape == y.shape
            np.testing.assert_array_equal(x, y, err_msg=f"trial {trial}")
    # strided / reversed views hit the ascontiguousarray fallback
    p = rng.integers(-9000, 9000, (57, 2)).astype(np.int32)
    for v in (p[::-1], p[::2]):
        a = S.scale_polys([v], 0.19, 0.19, 20.0, 20.0)
        b = numpy_path([v], 0.19, 0.19, 20.0, 20.0)
        np.testing.assert_array_equal(a[0], b[0])


def test_native_comp_paths_all_fuzz_identical_to_per_cc():
    """The batched pw_comp_paths_all must reproduce every per-component
    pw_comp_path result exactly (shared stamped buffers + one seed pass
    change the allocation strategy, never the traversal)."""
    import cv2

    from plotweave.native.api import component_path_native, component_paths_all_native

    rng = np.random.default_rng(13)
    for trial in range(25):
        h, w = int(rng.integers(10, 90)), int(rng.integers(10, 90))
        img = np.zeros((h, w), np.uint8)
        for _ in range(int(rng.integers(1, 8))):
            p0 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.line(img, p0, p1, 255, 1)
        num, lab = cv2.connectedComponents((img > 0).astype(np.uint8), connectivity=8)
        lab = lab.astype(np.int32)
        min_len = int(rng.integers(2, 8))
        ys, xs = np.nonzero(img)
        anchors = [None, None]
        if ys.size:
            for i in range(2):
                if rng.random() < 0.7:
                    j = int(rng.integers(0, ys.size))
                    anchors[i] = (int(ys[j]), int(xs[j]))
                else:
                    anchors[i] = (int(rng.integers(0, h)), int(rng.integers(0, w)))
        a0, a1 = anchors
        batch = component_paths_all_native(lab, int(num), a0, a1, min_len)
        assert batch is not None and len(batch) == int(num) - 1
        for cc in range(1, int(num)):
            single = component_path_native(lab, cc, a0, a1, min_len)
            np.testing.assert_array_equal(
                batch[cc - 1], single, err_msg=f"trial {trial} cc {cc}"
            )
