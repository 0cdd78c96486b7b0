"""Pallas TPU kernels for the stencil fixpoints.

``zhang_suen_pallas`` fuses one full Zhang–Suen iteration — both sequential
subpasses plus the convergence flag — into a single VMEM-resident kernel per
row tile, so each iteration costs one HBM read + one write instead of the
multi-pass dataflow XLA schedules for the unfused graph.  Row-tile halos are
assembled from the clamped neighbor blocks (edge tiles substitute zeros); the
padded layout keeps the lane dimension 128-aligned.

``zhang_suen_packed_pallas`` (v3) runs the bit-packed subpass
(ops.thinning's 32-px-per-lane bitboards) with the ENTIRE convergence loop
inside one kernel per layer.  Measured on the 4×1500×2000 stress case it
lands at 4.7 ms — close to, but not beating, the packed XLA while_loop
(4.45 ms) because the per-layer grid programs serialize the four layers'
fixpoints, while XLA batches them jointly; a joint-k VMEM-resident plane
would need ~30 MB of live bitboards (> 16 MB VMEM).  The packed XLA path
(ops.thinning.zhang_suen) is therefore the production thinner; these
kernels are kept as bit-identical, tested references for Pallas patterns
(neighbor-block halos in v1, whole-plane in-kernel fixpoints in v3).

All variants are bit-identical to ops.thinning.zhang_suen on both ring
orientations; tested on the CPU interpreter path and benchmarked on chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_RING = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def _shift0(t: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[i, j] = t[i+dy, j+dx] with zero fill (concat-based: Mosaic-friendly,
    no lax.pad inside the kernel)."""

    def ax(u, d, axis):
        if d == 0:
            return u
        size = u.shape[axis]
        zshape = list(u.shape)
        zshape[axis] = abs(d)
        z = jnp.zeros(zshape, u.dtype)
        if d > 0:
            body = jax.lax.slice_in_dim(u, d, size, axis=axis)
            return jnp.concatenate([body, z], axis=axis)
        body = jax.lax.slice_in_dim(u, 0, size + d, axis=axis)
        return jnp.concatenate([z, body], axis=axis)

    return ax(ax(t, dy, 0), dx, 1)


def _subpass_tile(t: jnp.ndarray, first: bool, rotated: bool) -> jnp.ndarray:
    """One Zhang–Suen subpass over the full tile (zero boundary); the tile's
    halo rows see zeros beyond the tile and are discarded by the caller."""
    ring = [(-dy, -dx) for dy, dx in _RING] if rotated else _RING
    p = [_shift0(t, dy, dx) for dy, dx in ring]
    b = p[0] + p[1] + p[2] + p[3] + p[4] + p[5] + p[6] + p[7]
    a = jnp.zeros_like(b)
    ringc = p + [p[0]]
    for i in range(8):
        a = a + ((ringc[i] == 0) & (ringc[i + 1] == 1)).astype(jnp.int32)
    if first:
        dir_ok = ((p[0] * p[2] * p[4]) == 0) & ((p[2] * p[4] * p[6]) == 0)
    else:
        dir_ok = ((p[0] * p[2] * p[6]) == 0) & ((p[0] * p[4] * p[6]) == 0)
    kill = (t == 1) & (a == 1) & (b >= 2) & (b <= 6) & dir_ok
    return jnp.where(kill, 0, t)


def _zs_iter_kernel(rotated: bool, above_ref, cur_ref, below_ref, out_ref):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    cur = cur_ref[0]  # (TILE, W)
    top = jnp.where(i > 0, above_ref[0][-2:, :], jnp.zeros_like(cur_ref[0][-2:, :]))
    bot = jnp.where(i < n - 1, below_ref[0][:2, :], jnp.zeros_like(cur_ref[0][:2, :]))
    t = jnp.concatenate([top, cur, bot], axis=0)  # (TILE+4, W)

    t1 = _subpass_tile(t, first=True, rotated=rotated)
    t2 = _subpass_tile(t1, first=False, rotated=rotated)
    out_ref[0] = t2[2:-2, :]


def _pad_to(x: np.ndarray | jax.Array, mult_r: int, mult_c: int):
    """Pad rows to a tile multiple and columns to a lane multiple with ONE
    zero column on the left: the kernels never update the tile's 1-px column
    frame, so real image columns must sit strictly inside it."""
    k, h, w = x.shape
    hp = -(-h // mult_r) * mult_r
    wp = -(-(w + 2) // mult_c) * mult_c
    return jnp.pad(x, ((0, 0), (0, hp - h), (1, wp - w - 1)))


@partial(jax.jit, static_argnames=("max_iter", "rotated", "tile", "interpret"))
def zhang_suen_pallas(
    binary: jax.Array,
    max_iter: int = 120,
    rotated: bool = True,
    tile: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """(k, H, W) 0/1 or 0/255 → 0/1 int32 skeletons, Pallas-fused iterations."""
    x0 = (binary > 0).astype(jnp.int32)
    squeeze = x0.ndim == 2
    if squeeze:
        x0 = x0[None]
    k, h, w = x0.shape
    xp = _pad_to(x0, tile, 128)
    kp, hp, wp = xp.shape
    nblk = hp // tile

    kernel = partial(_zs_iter_kernel, rotated)
    blk = pl.BlockSpec((1, tile, wp), lambda l, i: (l, i, 0))

    def one_iter(x):
        specs = dict(
            grid=(kp, nblk),
            in_specs=[
                pl.BlockSpec((1, tile, wp), lambda l, i: (l, jnp.maximum(i - 1, 0), 0)),
                blk,
                pl.BlockSpec((1, tile, wp), lambda l, i: (l, jnp.minimum(i + 1, nblk - 1), 0)),
            ],
            out_specs=blk,
        )
        new = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((kp, hp, wp), jnp.int32),
            interpret=interpret,
            **specs,
        )(x, x, x)
        return new, jnp.any(new != x)

    def body(state):
        x, it, _ = state
        new, changed = one_iter(x)
        return new, it + 1, changed

    def cond(state):
        return state[2] & (state[1] < max_iter)

    out, _, _ = jax.lax.while_loop(cond, body, (xp, jnp.int32(0), jnp.array(True)))
    out = out[:, :h, 1 : 1 + w]
    return out[0] if squeeze else out


# --------------------------------------------------------------------- v3
#
# Bit-packed whole-layer kernel (ROADMAP #6's "only idea with real
# headroom", realized): 32 px per uint32 lane via ops.thinning's bitboard
# subpass (carry-save-adder neighbor counts), the ENTIRE convergence loop
# inside one kernel per layer with the packed plane VMEM-resident — no
# per-iteration kernel launches, no HBM round trips, ~16x fewer VPU ops
# than the dense subpass.  Layers ride the grid (independent fixpoints).


def _zs_packed_kernel(rotated: bool, max_iter: int, x_ref, out_ref):
    from .thinning import _subpass_bits  # noqa: PLC0415

    x0 = x_ref[0]  # (hp, nwp) uint32 bitboards

    def body(state):
        x, it, _ = state
        x1 = _subpass_bits(x, first=True, rotated=rotated)
        x2 = _subpass_bits(x1, first=False, rotated=rotated)
        return x2, it + 1, jnp.any(x2 != x)

    def cond(state):
        return state[2] & (state[1] < max_iter)

    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.int32(0), jnp.array(True)))
    out_ref[0] = x


@partial(jax.jit, static_argnames=("max_iter", "rotated", "interpret"))
def zhang_suen_packed_pallas(
    binary: jax.Array,
    max_iter: int = 120,
    rotated: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """(k, H, W) 0/1 or 0/255 → 0/1 int32 skeletons; bit-exact vs
    ops.thinning.zhang_suen (both ring variants, fuzz-pinned)."""
    from .thinning import pack_bitboards, unpack_bitboards  # noqa: PLC0415

    squeeze = binary.ndim == 2
    if squeeze:
        binary = binary[None]
    w = binary.shape[-1]
    x0 = pack_bitboards(binary)
    k, h, nw = x0.shape
    hp = -(-h // 8) * 8
    nwp = -(-nw // 128) * 128
    xp = jnp.pad(x0, ((0, 0), (0, hp - h), (0, nwp - nw)))

    out = pl.pallas_call(
        partial(_zs_packed_kernel, rotated, max_iter),
        grid=(k,),
        in_specs=[pl.BlockSpec((1, hp, nwp), lambda l: (l, 0, 0))],
        out_specs=pl.BlockSpec((1, hp, nwp), lambda l: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, hp, nwp), jnp.uint32),
        interpret=interpret,
    )(xp)
    res = unpack_bitboards(out[:, :h, :nw], w)
    return res[0] if squeeze else res
