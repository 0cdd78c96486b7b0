"""Raster-op exactness tests: resize, blur, morphology, Canny vs OpenCV
(live oracle — cv2 is a baked-in dependency), thinning vs committed
reference goldens, Lab/k-means tolerance tests."""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np
import pytest

from plotweave.ops import (
    area_resize,
    canny,
    gaussian_blur_u8,
    morph_close,
    morph_open,
    structuring_element,
    zhang_suen,
)

GOLDEN = Path(__file__).parent / "golden"
rng = np.random.default_rng(42)


# ------------------------------------------------------------------- resize


def test_area_resize_integer_ratio_bit_exact():
    for h, w, s in [(100, 100, 2), (120, 90, 3), (64, 64, 4)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ref = cv2.resize(img, (w // s, h // s), interpolation=cv2.INTER_AREA)
        got = np.asarray(area_resize(img, w // s, h // s))
        assert (got == ref).all()


def test_area_resize_fractional_bit_exact():
    # includes the BASELINE config-3 scale (3840→2000, factor 1.92) where the
    # former weight-matrix formulation lost ~1e-4 of pixels to rounding ties
    for h, w, nh, nw in [(333, 517, 166, 258), (97, 311, 31, 99), (640, 480, 512, 384)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        got = np.asarray(area_resize(img, nw, nh))
        assert (got == ref).all()


def test_area_resize_fractional_fuzz_bit_exact():
    r = np.random.default_rng(17)
    for _ in range(25):
        h, w = int(r.integers(40, 500)), int(r.integers(40, 500))
        nh, nw = int(r.integers(8, h)), int(r.integers(8, w))
        img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        got = np.asarray(area_resize(img, nw, nh))
        assert (got == ref).all(), (h, w, nh, nw)


def test_area_resize_extreme_ratio_chunked_bit_exact():
    """Ratios > ~15 take the chunked tap accumulation (bounded memory,
    ADVICE r2 #4) — must stay bit-exact vs cv2, including the chunk-boundary
    add ordering (44 taps = 3 groups of 16)."""
    for h, w, nh, nw in [(1813, 397, 89, 97), (997, 211, 23, 11)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        got = np.asarray(area_resize(img, nw, nh))
        assert (got == ref).all(), (h, w, nh, nw)


def test_area_resize_4k_scale_bit_exact():
    img = rng.integers(0, 256, (540, 960, 3)).astype(np.uint8)  # 1.92 factor
    ref = cv2.resize(img, (500, 281), interpolation=cv2.INTER_AREA)
    got = np.asarray(area_resize(img, 500, 281))
    assert (got == ref).all()


def test_area_resize_grayscale():
    img = rng.integers(0, 256, (80, 120)).astype(np.uint8)
    ref = cv2.resize(img, (60, 40), interpolation=cv2.INTER_AREA)
    assert (np.asarray(area_resize(img, 60, 40)) == ref).all()


# --------------------------------------------------------------------- blur


@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_gaussian_blur_bit_exact(ksize):
    img = rng.integers(0, 256, (77, 91)).astype(np.uint8)
    ref = cv2.GaussianBlur(img, (ksize, ksize), 0)
    assert (np.asarray(gaussian_blur_u8(img, ksize)) == ref).all()


# --------------------------------------------------------------- morphology


def test_structuring_elements_match_opencv():
    for k in (3, 5, 7, 9, 11):
        assert (
            structuring_element("ellipse", k)
            == cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k)).astype(bool)
        ).all()
        assert (
            structuring_element("rect", k)
            == cv2.getStructuringElement(cv2.MORPH_RECT, (k, k)).astype(bool)
        ).all()


@pytest.mark.parametrize("shape,cvshape,k", [("rect", cv2.MORPH_RECT, 3), ("ellipse", cv2.MORPH_ELLIPSE, 3), ("ellipse", cv2.MORPH_ELLIPSE, 5)])
def test_morphology_open_close_bit_exact(shape, cvshape, k):
    m = (rng.random((100, 120)) > 0.6).astype(np.uint8) * 255
    se = cv2.getStructuringElement(cvshape, (k, k))
    for iters in (1, 2):
        assert (
            np.asarray(morph_open(m, shape, k, iters))
            == cv2.morphologyEx(m, cv2.MORPH_OPEN, se, iterations=iters)
        ).all()
        assert (
            np.asarray(morph_close(m, shape, k, iters))
            == cv2.morphologyEx(m, cv2.MORPH_CLOSE, se, iterations=iters)
        ).all()


# -------------------------------------------------------------------- canny


def test_canny_bit_exact_masks_and_random():
    for t in range(6):
        h, w = int(rng.integers(16, 160)), int(rng.integers(16, 160))
        if t % 3 == 0:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        else:
            m = (rng.random((h, w)) > 0.55).astype(np.uint8) * 255
            img = cv2.GaussianBlur(m, (7, 7), 0)
        for lo, hi in [(22, 70), (50, 150)]:
            assert (np.asarray(canny(img, lo, hi)) == cv2.Canny(img, lo, hi)).all()


# ----------------------------------------------------------------- thinning


def test_thinning_matches_reference_goldens():
    z = np.load(GOLDEN / "thinning_cases.npz")
    n = len([k for k in z.files if k.startswith("edges_")])
    assert n >= 4
    for t in range(n):
        edges = z[f"edges_{t}"]
        got04 = np.asarray(zhang_suen(edges, rotated=True)).astype(np.uint8)
        assert (got04 == z[f"skel04_{t}"]).all(), f"stage04 variant, case {t}"
        got08 = np.asarray(zhang_suen(edges, max_iter=48, rotated=False)).astype(np.uint8)
        assert (got08 == z[f"skel08_{t}"]).all(), f"stage08 variant, case {t}"


def test_thinning_packed_matches_dense_fuzz():
    """The production thinner runs bit-packed (32 px/lane, carry-save-adder
    neighbor counts); pin it to the dense reference implementation on random
    densities, shapes, batch dims and both ring orientations."""
    from plotweave.ops.thinning import zhang_suen_dense

    r = np.random.default_rng(23)
    for _ in range(10):
        h, w = int(r.integers(10, 180)), int(r.integers(10, 180))
        x = (r.random((h, w)) < r.uniform(0.1, 0.8)).astype(np.uint8) * 255
        for rot in (True, False):
            a = np.asarray(zhang_suen_dense(x, rotated=rot))
            b = np.asarray(zhang_suen(x, rotated=rot))
            assert np.array_equal(a, b), (h, w, rot)
    xb = (r.random((3, 70, 200)) < 0.5).astype(np.uint8) * 255
    assert np.array_equal(
        np.asarray(zhang_suen_dense(xb)), np.asarray(zhang_suen(xb))
    )


# ------------------------------------------------------------ lab & k-means


def test_lab_close_to_opencv():
    from plotweave.ops.colorspace import bgr_to_lab_u8

    img = rng.integers(0, 256, (50, 60, 3)).astype(np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2LAB).astype(np.float32)
    got = np.asarray(bgr_to_lab_u8(img))
    assert np.abs(got - ref).max() <= 2.5


def test_kmeans_deterministic_and_sane():
    from plotweave.ops.kmeans import kmeans

    # 4 well-separated blobs
    g = np.random.default_rng(0)
    blobs = np.concatenate(
        [g.normal(c, 2.0, size=(500, 3)) for c in [(20, 20, 20), (80, 100, 120), (200, 128, 128), (240, 200, 180)]]
    ).astype(np.float32)
    c1, l1 = kmeans(blobs, 4)
    c2, l2 = kmeans(blobs, 4)
    assert (l1 == l2).all() and np.allclose(c1, c2)  # deterministic
    # every blob is recovered: each true center near some fitted center
    for c in [(20, 20, 20), (80, 100, 120), (200, 128, 128), (240, 200, 180)]:
        assert np.min(np.linalg.norm(c1 - np.array(c), axis=1)) < 5.0


def test_morphology_packed_matches_dense_fuzz():
    """Binary morphology runs bit-packed in the fused chains; pin it to the
    dense min/max implementation over shapes/kernels/programs."""
    from plotweave.ops.morphology import _morph, morph_binary_packed

    r = np.random.default_rng(31)
    for _ in range(6):
        h, w = int(r.integers(20, 180)), int(r.integers(20, 180))
        m = (r.random((3, h, w)) < r.uniform(0.2, 0.7)).astype(np.uint8) * 255
        for shape in ("rect", "ellipse", "cross"):
            for k in (3, 5, 7):
                for prog in ("ed", "de", "e", "d"):
                    a = np.asarray(_morph(m, shape, k, 1, prog))
                    b = np.asarray(morph_binary_packed(m, shape, k, 1, prog))
                    assert np.array_equal(a, b), (h, w, shape, k, prog)
