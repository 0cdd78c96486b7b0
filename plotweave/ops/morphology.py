"""Binary morphology as masked window min/max (VPU-friendly stencils).

Erode/dilate over an arbitrary structuring element are expressed as shifted-
array min/max algebra — XLA fuses the whole kernel footprint into one pass.
Border semantics match OpenCV's defaults (border does not constrain erosion
and does not feed dilation).  Reference use: 02_color_extract.py:136-154,
03_edge_detect.py:23-30.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def structuring_element(shape: str, ksize: int) -> np.ndarray:
    """Rect / ellipse / cross structuring element, OpenCV-compatible geometry."""
    if shape == "rect":
        return np.ones((ksize, ksize), dtype=bool)
    if shape == "cross":
        se = np.zeros((ksize, ksize), dtype=bool)
        se[ksize // 2, :] = True
        se[:, ksize // 2] = True
        return se
    if shape == "ellipse":
        r = ksize // 2
        c = r
        inv_r2 = 1.0 / (r * r) if r else 0.0
        se = np.zeros((ksize, ksize), dtype=bool)
        for i in range(ksize):
            dy = i - r
            if abs(dy) <= r:
                dx = int(np.rint(r * np.sqrt(max(0.0, (r * r - dy * dy) * inv_r2))))
                se[i, max(c - dx, 0) : min(c + dx + 1, ksize)] = True
        return se
    raise ValueError(f"unknown structuring element shape: {shape}")


def _window_reduce(x: jax.Array, se: np.ndarray, is_max: bool) -> jax.Array:
    """Min/max over the structuring element footprint via shifted slices.

    Operates on the last two dims; any leading dims (layer/batch) ride along —
    batching is free (static slices), no vmap needed.
    """
    h, w = x.shape[-2], x.shape[-1]
    ry, rx = se.shape[0] // 2, se.shape[1] // 2
    pad_val = jnp.iinfo(x.dtype).min if is_max else jnp.iinfo(x.dtype).max
    pad = [(0, 0)] * (x.ndim - 2) + [(ry, ry), (rx, rx)]
    p = jnp.pad(x, pad, constant_values=pad_val)
    ys, xs = np.nonzero(se)
    acc = None
    for dy, dx in zip(ys.tolist(), xs.tolist()):
        win = p[..., dy : dy + h, dx : dx + w]
        acc = win if acc is None else (jnp.maximum(acc, win) if is_max else jnp.minimum(acc, win))
    return acc


@partial(jax.jit, static_argnames=("shape", "ksize", "iterations", "program"))
def _morph(x, shape: str, ksize: int, iterations: int, program: str):
    """Apply a morphology program: each char is 'e' (erode) or 'd' (dilate),
    every char repeated ``iterations`` times."""
    se = structuring_element(shape, ksize)
    x = jnp.asarray(x)
    for op in program:
        for _ in range(iterations):
            x = _window_reduce(x, se, is_max=(op == "d"))
    return x


def erode(x, shape="rect", ksize=3, iterations=1):
    return _morph(x, shape, ksize, iterations, "e")


def dilate(x, shape="rect", ksize=3, iterations=1):
    return _morph(x, shape, ksize, iterations, "d")


def morph_open(x, shape="rect", ksize=3, iterations=1):
    """iterations× erode then iterations× dilate (OpenCV MORPH_OPEN semantics)."""
    return _morph(x, shape, ksize, iterations, "ed")


def morph_close(x, shape="rect", ksize=3, iterations=1):
    return _morph(x, shape, ksize, iterations, "de")


# --------------------------------------------------------------------------
# Bit-packed binary morphology: erode/dilate on 0/255 masks are pure AND/OR
# algebra, so 32 columns ride in each uint32 lane (same representation as
# ops.thinning's bitboards) — measured 2.9x faster than the dense min/max
# chain on the chip (10.4 -> 3.6 ms for the stage 02+03 8-pass program on
# 4x1500x2000).  Border semantics match the dense ops: dilation's zero-fill
# shifts ARE the non-feeding border; erosion runs as ~dilate(~x) with the
# padding bits kept zero so outside reads as set (the non-constraining
# border).  Bit-exact vs _morph on binary inputs (fuzz-pinned).


def _shift_cols_bits(p: jax.Array, dx: int) -> jax.Array:
    """bit j of the result = bit j+dx of the packed row (LSB-first within
    each uint32 word, carries across word boundaries, zero fill)."""
    from .thinning import _shift_words  # noqa: PLC0415

    if dx == 0:
        return p
    if dx > 0:
        return (p >> np.uint32(dx)) | (_shift_words(p, 1) << np.uint32(32 - dx))
    return (p << np.uint32(-dx)) | (_shift_words(p, -1) >> np.uint32(32 + dx))


def _dilate_bits(x: jax.Array, se: np.ndarray) -> jax.Array:
    from .thinning import _shift_rows  # noqa: PLC0415

    ys, xs = np.nonzero(se)
    r = se.shape[0] // 2
    acc = None
    for dy, dx in zip(ys.tolist(), xs.tolist()):
        t = _shift_cols_bits(_shift_rows(x, dy - r), dx - r)
        acc = t if acc is None else (acc | t)
    return acc


def _valid_bits(w: int) -> np.ndarray:
    """uint32 lane mask with bits [0, w) set (padding bits beyond w zero)."""
    nw = -(-w // 32)
    bits = (np.arange(nw * 32) < w).astype(np.uint64).reshape(nw, 32)
    weights = (np.uint64(1) << np.arange(32, dtype=np.uint64))
    return (bits * weights).sum(axis=-1).astype(np.uint32)


def morph_bits(x: jax.Array, valid, shape: str, ksize: int, iterations: int, program: str):
    """The _morph program on uint32 bitboards ((..., rows, ceil(W/32));
    ``valid`` from :func:`_valid_bits`)."""
    se = structuring_element(shape, ksize)
    for op in program:
        for _ in range(iterations):
            if op == "d":
                x = _dilate_bits(x, se)
            else:
                x = (~_dilate_bits((~x) & valid, se)) & valid
    return x


def morph_binary_packed(x, shape: str, ksize: int, iterations: int, program: str):
    """Drop-in for :func:`_morph` on BINARY (0/255 or 0/1) uint8 masks:
    pack → bit-domain program → unpack to 0/255 uint8."""
    from .thinning import pack_bitboards, unpack_bitboards  # noqa: PLC0415

    w = x.shape[-1]
    b = morph_bits(pack_bitboards(x), jnp.asarray(_valid_bits(w)), shape, ksize, iterations, program)
    return unpack_bitboards(b, w).astype(jnp.uint8) * 255
