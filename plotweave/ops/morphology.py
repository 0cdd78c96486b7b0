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
