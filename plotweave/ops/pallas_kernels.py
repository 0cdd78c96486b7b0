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


# --------------------------------------------------------------------- v2
#
# Second-generation kernel: uint8 HBM storage (4× less traffic than int32),
# a manually-DMA'd clamped halo window per row tile (≈1.1× read amplification
# vs 3× for the neighbor-block trick above), and the convergence flag reduced
# per-tile inside the kernel (no separate whole-array != pass).
#
# Measured on v5e-1 (4×1500×2000 dense input, 120 iterations): v2 ≈ 5.9 ms
# vs 5.2 ms for the fused XLA while_loop — the subpass is VPU-compute-bound
# (~50 elementwise ops per vector), not HBM-bound, and XLA's fusion is
# already near-optimal, so XLA remains the production thinner.  v2 is kept
# as the template for halo-window DMA kernels (and is bit-identical).
#
# Mosaic constraints encoded here: no i8 vector compute (widen to i32 after
# load), DMA row slices 8-aligned (pl.multiple_of), no scalar-predicated
# vector selects (blend static slices with 0/1 scalar weights).

from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _zs_iter_kernel_v2(rotated: bool, tile: int, win: int, hp: int, x_hbm, out_ref, chg_ref, scratch, sem):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    l = pl.program_id(0)
    # clamped halo window: interior tiles carry 8 extra rows on each side
    # (DMA slices must stay 8-row aligned; only 2 are semantically needed);
    # at the image top/bottom the window is flush with the buffer edge, where
    # the kernel's zero tile boundary IS the true image boundary
    start = pl.multiple_of(jnp.clip(i * tile - 8, 0, hp - win), 8)
    cp = pltpu.make_async_copy(x_hbm.at[l, pl.ds(start, win), :], scratch, sem)
    cp.start()
    cp.wait()
    # storage dtype keeps HBM traffic down; compute widens to a Mosaic-
    # supported vector width immediately after load
    t = scratch[:].astype(jnp.int32)
    t1 = _subpass_tile(t, first=True, rotated=rotated)
    t2 = _subpass_tile(t1, first=False, rotated=rotated)
    # body offset within the window: 0 at the top edge, 8 interior, 16 at the
    # bottom — only three static cases, so a switch of static slices lowers
    # (Pallas TPU cannot dynamic-slice values)
    if win == tile:  # single block: window flush with the whole image
        body, prev = t2, t
    else:
        # blend the three static slices with 0/1 scalar weights — scalar-
        # predicated vector selects (lax.switch/jnp.where) do not legalize
        top = (i == 0).astype(jnp.int32)
        bot = ((i > 0) & (i == n - 1)).astype(jnp.int32)
        mid = 1 - top - bot

        def blend(u):
            return top * u[0:tile] + mid * u[8 : tile + 8] + bot * u[16 : tile + 16]

        body = blend(t2)
        prev = blend(t)
    out_ref[0] = body.astype(out_ref.dtype)
    flag = jnp.any(body != prev).astype(jnp.int32)
    chg_ref[0, 0] = jnp.broadcast_to(flag, (8, 128))




@partial(jax.jit, static_argnames=("max_iter", "rotated", "tile", "interpret"))
def zhang_suen_pallas_v2(
    binary: jax.Array,
    max_iter: int = 120,
    rotated: bool = True,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """(k, H, W) 0/1 or 0/255 → 0/1 uint8 skeletons, bit-identical to
    ops.thinning.zhang_suen (see header: XLA remains the default thinner).
    tile ≤ 128 — larger tiles overflow scoped VMEM on v5e."""
    if tile % 8 or tile < 16:
        raise ValueError("tile must be a multiple of 8 and ≥ 16 (DMA row alignment)")
    x0 = (binary > 0).astype(jnp.uint8)
    squeeze = x0.ndim == 2
    if squeeze:
        x0 = x0[None]
    k, h, w = x0.shape
    hp = -(-h // tile) * tile
    wp = -(-(w + 2) // 128) * 128
    # 1 zero column on the left keeps real pixels inside the lane frame;
    # no row halo is stored — windows clamp to the buffer edges
    xp = jnp.pad(x0, ((0, 0), (0, hp - h), (1, wp - w - 1)))
    kp = k
    nblk = hp // tile
    win = tile + 16 if nblk > 1 else tile

    kernel = partial(_zs_iter_kernel_v2, rotated, tile, win, hp)

    def one_iter(x):
        return pl.pallas_call(
            kernel,
            grid=(kp, nblk),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[
                pl.BlockSpec((1, tile, wp), lambda l, i: (l, i, 0)),
                pl.BlockSpec((1, 1, 8, 128), lambda l, i: (l, i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kp, hp, wp), jnp.uint8),
                jax.ShapeDtypeStruct((kp, nblk, 8, 128), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((win, wp), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(x)

    def body(state):
        x, it, _ = state
        new, chg = one_iter(x)
        return new, it + 1, jnp.any(chg != 0)

    def cond(state):
        return state[2] & (state[1] < max_iter)

    out, _, _ = jax.lax.while_loop(cond, body, (xp, jnp.int32(0), jnp.array(True)))
    out = out[:, :h, 1 : 1 + w]
    return out[0] if squeeze else out
