"""Pallas TPU kernels for the stencil fixpoints.

``zhang_suen_pallas`` fuses one full Zhang–Suen iteration — both sequential
subpasses plus the convergence flag — into a single VMEM-resident kernel per
row tile, so each iteration costs one HBM read + one write instead of the
multi-pass dataflow XLA schedules for the unfused graph.  Row-tile halos are
assembled from the clamped neighbor blocks (edge tiles substitute zeros); the
padded layout keeps the lane dimension 128-aligned.

Output is bit-identical to ops.thinning.zhang_suen (both ring orientations);
tested on the CPU interpreter path and benchmarked on the chip.
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
