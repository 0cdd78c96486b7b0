"""Fused raster front-end: image → per-layer edges + skeletons, one program.

This is the flagship compute graph (stages 01–04's dense work): Lab
conversion → nearest-center layer assignment (MXU distance matmul) → per-layer
mask morphology → Gaussian blur → Canny → Zhang–Suen thinning, vmapped over
layers, jitted end-to-end so XLA fuses the stencil chains and keeps
everything on-chip.  Batched/sharded wrappers live in plotweave.parallel.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .canny import canny
from .colorspace import bgr_to_lab_u8
from .filters import gaussian_blur_u8
from .thinning import zhang_suen


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "extract_iters",
        "edge_kernel",
        "edge_iters",
        "blur_kernel",
        "low",
        "high",
        "thin_iters",
        "pallas_thinning",
    ),
)
def raster_frontend(
    image: jax.Array,  # (..., H, W, 3) uint8 BGR — leading batch dims allowed
    centers: jax.Array,  # (k, 3) float32 Lab centers (from plotweave.ops.kmeans)
    *,
    k: int = 4,
    extract_iters: int = 1,
    edge_kernel: int = 3,
    edge_iters: int = 1,
    blur_kernel: int = 7,
    low: int = 22,
    high: int = 70,
    thin_iters: int = 120,
    pallas_thinning: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (edges (..., k, H, W) uint8, skeletons (..., k, H, W) int32)."""
    lab = bgr_to_lab_u8(image)  # (...,H,W,3) f32
    flat = lab.reshape(-1, 3)
    d2 = (
        jnp.sum(flat * flat, axis=1, keepdims=True)
        - 2.0 * flat @ centers.T
        + jnp.sum(centers * centers, axis=1)
    )
    labels = jnp.argmin(d2, axis=1).reshape(image.shape[:-1])  # (...,H,W)

    # all ops are natively batched on (..., k, H, W): static-slice stencils
    # and joint fixpoint loops compile far faster than vmap-of-while on TPU.
    # The binary morphology runs bit-packed (32 px/uint32 lane, one pack →
    # four programs → one unpack) — 2.9× the dense min/max chain.
    from .morphology import _valid_bits, morph_bits  # noqa: PLC0415
    from .thinning import pack_bitboards, unpack_bitboards  # noqa: PLC0415

    w = image.shape[-2]  # (..., H, W, 3) → W
    masks_b = pack_bitboards(
        labels[..., None, :, :] == jnp.arange(k)[:, None, None]
    )
    valid = jnp.asarray(_valid_bits(w))
    masks_b = morph_bits(masks_b, valid, "rect", 3, extract_iters, "ed")
    masks_b = morph_bits(masks_b, valid, "rect", 3, extract_iters, "de")
    masks_b = morph_bits(masks_b, valid, "ellipse", edge_kernel, edge_iters, "ed")
    masks_b = morph_bits(masks_b, valid, "ellipse", edge_kernel, edge_iters, "de")
    masks = unpack_bitboards(masks_b, w).astype(jnp.uint8) * 255
    edges = canny(gaussian_blur_u8(masks, blur_kernel), low, high)
    if pallas_thinning:
        from .pallas_kernels import zhang_suen_pallas  # noqa: PLC0415

        skel = zhang_suen_pallas(edges, max_iter=thin_iters, rotated=True)
    else:
        skel = zhang_suen(edges, max_iter=thin_iters, rotated=True)
    return edges, skel
