"""Separable fixed-point Gaussian blur for uint8 images.

OpenCV's bit-exact uint8 Gaussian path quantizes the kernel to Q8 fixed
point and rounds once after both passes; for sigma=0 and ksize ∈ {3,5,7} the
canonical small-kernel taps are exactly representable in Q8, so an integer
separable convolution with a single ``(acc + 2^15) >> 16`` rounding is
bit-identical (validated in tests).  Reference use: 03_edge_detect.py:32-33.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# canonical sigma=0 small kernels (Q8 numerators over 256)
_SMALL_TAB = {
    1: [256],
    3: [64, 128, 64],
    5: [16, 64, 96, 64, 16],
    7: [8, 28, 56, 72, 56, 28, 8],
}


def gaussian_kernel_q8(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """Q8 integer Gaussian taps (sum 256)."""
    if sigma <= 0 and ksize in _SMALL_TAB:
        return np.asarray(_SMALL_TAB[ksize], dtype=np.int32)
    s = sigma if sigma > 0 else 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * s * s))
    k /= k.sum()
    q = np.rint(k * 256.0).astype(np.int32)
    # keep the sum at 256 by adjusting the center tap
    q[ksize // 2] += 256 - q.sum()
    return q


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur_u8(img: jax.Array, ksize: int, sigma: float = 0.0) -> jax.Array:
    """Blur (..., H, W) uint8; reflect-101 border; bit-exact for ksize ≤ 7.

    Leading dims (layer/batch) ride along — static slices, no vmap needed.
    """
    kq = gaussian_kernel_q8(ksize, sigma)
    r = ksize // 2
    if r == 0:
        return img
    h, w = img.shape[-2], img.shape[-1]
    lead = [(0, 0)] * (img.ndim - 2)
    # first pass accumulates in uint16 — taps sum to 256, so the row sum is
    # ≤ 256·255 = 65280 and fits exactly; halves the inter-pass HBM bytes
    p = jnp.pad(img.astype(jnp.uint16), lead + [(0, 0), (r, r)], mode="reflect")
    tmp = jnp.zeros(img.shape, jnp.uint16)
    for i in range(ksize):  # static unroll; XLA fuses into one pass
        tmp = tmp + int(kq[i]) * p[..., :, i : i + w]
    p = jnp.pad(tmp, lead + [(r, r), (0, 0)], mode="reflect")
    acc = jnp.zeros(img.shape, jnp.int32)
    for i in range(ksize):  # widen at the multiply (≤ 256·65280 needs 32 bits)
        acc = acc + int(kq[i]) * p[..., i : i + h, :].astype(jnp.int32)
    return jnp.clip((acc + (1 << 15)) >> 16, 0, 255).astype(jnp.uint8)
