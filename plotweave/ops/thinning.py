"""Zhang–Suen skeletonization as an iterated two-subpass stencil.

Each iteration runs the two classical subpasses (neighbor count B ∈ [2,6],
transition count A == 1, plus the subpass-specific direction products) as
whole-array boolean algebra inside a ``lax.while_loop`` that exits when an
iteration removes nothing or the cap is reached — identical convergence
semantics to the reference (04_find_contours.py:35-99, which also stops as
soon as a full iteration removes no pixel; its max_iter=120 cap is honored
via ``max_iter``).

Bit-exact vs the reference on any input (validated by golden tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _neighbors(x: jax.Array, rotated: bool):
    """P2..P9 ring, zero border.

    ``rotated=False``: textbook order (N, NE, E, SE, S, SW, W, NW) — used by
    the reference's stage-08 fallback thinner (08_dedup_layer_basic.py:342).
    ``rotated=True``: the 180°-rotated ring the reference's stage-04 thinner
    actually computes (its ``_shift(roi, -1, 0)`` reads the *south* neighbor,
    04_find_contours.py:14-22,53-55) — S, SW, W, NW, N, NE, E, SE.  Zhang–Suen
    is not rotation-symmetric, so the two variants differ on rare patterns and
    both must be available for bit-exact parity.
    """
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(x, pad)

    def at(dy, dx):
        return p[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    ring = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
    if rotated:
        ring = [(-dy, -dx) for dy, dx in ring]
    return tuple(at(dy, dx) for dy, dx in ring)


def _subpass(x: jax.Array, first: bool, rotated: bool) -> jax.Array:
    p2, p3, p4, p5, p6, p7, p8, p9 = _neighbors(x, rotated)
    ring = (p2, p3, p4, p5, p6, p7, p8, p9, p2)
    b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
    a = jnp.zeros_like(b)
    for i in range(8):
        a = a + ((ring[i] == 0) & (ring[i + 1] == 1)).astype(jnp.int32)
    if first:
        dir_ok = ((p2 * p4 * p6) == 0) & ((p4 * p6 * p8) == 0)
    else:
        dir_ok = ((p2 * p4 * p8) == 0) & ((p2 * p6 * p8) == 0)
    kill = (x == 1) & (a == 1) & (b >= 2) & (b <= 6) & dir_ok
    return jnp.where(kill, 0, x)


@partial(jax.jit, static_argnames=("max_iter", "rotated"))
def zhang_suen(binary: jax.Array, max_iter: int = 120, rotated: bool = True) -> jax.Array:
    """Thin a (..., H, W) 0/1 (or 0/255) image to 1-px skeletons; 0/1 int32.

    Leading dims are batched with one joint convergence loop (iterations past
    an element's fixpoint are no-ops).  ``rotated=True`` reproduces stage 04's
    thinner; ``rotated=False`` with ``max_iter=48`` reproduces stage 08's
    fallback thinner.
    """
    x0 = (binary > 0).astype(jnp.int32)

    def body(state):
        x, it, _ = state
        x1 = _subpass(x, first=True, rotated=rotated)
        x2 = _subpass(x1, first=False, rotated=rotated)
        changed = jnp.any(x2 != x)
        return x2, it + 1, changed

    def cond(state):
        _, it, changed = state
        return changed & (it < max_iter)

    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.int32(0), jnp.array(True)))
    return x
