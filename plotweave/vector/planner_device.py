"""Device greedy planner: stage 07's nearest-endpoint tour on the chip.

The host C++ selection loop (native pw_greedy_order) is O(n²) sequential;
on-device the per-step candidate scan vectorizes over all n, which wins for
large plans (measured on the real chip, tests/tools/bench_greedy_device.py:
host/device ms at n=1000: 6.4/35, n=5000: 122/69, n=20000: 2926/467 — and
the orders/flips matched EXACTLY at every n).

Selection semantics replicate 07_sort_contours.py:50-87 bit-for-bit:
float32 squared distances, jnp.argmin's first-minimum == the ascending
strict-< scan, closed contours always join at their start, open contours
prefer start when d²(start) ≤ d²(end).

Shapes are padded to a bucket (one compile per bucket + closed_aware, cached
persistently) with a DYNAMIC trip count, so padded iterations never run.
Float caveat: on XLA:CPU the compiler may contract mul+add into fma, which
can flip an ulp of d² against the host when squared coordinates exceed
float32's 2²⁴ integer range — the TPU backend was measured exact (above);
``greedy_order`` only auto-engages this path when the default backend is a
real accelerator.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Optional, Tuple

import numpy as np

# The 4096 bucket is unreachable under the DEFAULT gate (config.py
# planner_device_min_n=4500 → the smallest eligible plan pads to 8192); it
# exists only for user-lowered gates (planner_device_min_n ≤ 4096) and is
# therefore excluded from warm_planner_cache.py's default bucket list.
BUCKETS = (4096, 8192, 16384, 32768, 65536)
DEFAULT_WARM_BUCKETS = (8192, 16384, 32768, 65536)


@lru_cache(maxsize=1)
def _jitted():
    import jax

    return partial(jax.jit, static_argnames=("closed_aware",))(_greedy_device_impl)


def _greedy_device_impl(s, e, closed, seed, n_valid, closed_aware: bool):
    import jax
    import jax.numpy as jnp

    n = s.shape[0]
    closed_f = closed if closed_aware else jnp.zeros_like(closed)

    def body(i, st):
        used, cur_end, order, flips = st
        d2s = jnp.sum((s - cur_end) ** 2, axis=1)
        d2e = jnp.sum((e - cur_end) ** 2, axis=1)
        prefer_start = closed_f | (d2s <= d2e)
        cand = jnp.where(prefer_start, d2s, d2e)
        cand = jnp.where(used, jnp.inf, cand)
        best = jnp.argmin(cand)  # first min wins == ascending strict-<
        flip = ~prefer_start[best]
        new_end = jnp.where(closed_f[best], s[best], jnp.where(flip, s[best], e[best]))
        return (
            used.at[best].set(True),
            new_end,
            order.at[i].set(best.astype(jnp.int32)),
            flips.at[i].set(flip),
        )

    # padding rows (index ≥ n_valid) start used=True and are never selected;
    # the dynamic trip count stops at the real plan size
    used0 = (jnp.arange(n) >= n_valid).at[seed].set(True)
    cur0 = jnp.where(closed_f[seed], s[seed], e[seed])
    order0 = jnp.zeros(n, jnp.int32).at[0].set(seed.astype(jnp.int32))
    flips0 = jnp.zeros(n, bool)
    _, _, order, flips = jax.lax.fori_loop(1, n_valid, body, (used0, cur0, order0, flips0))
    return order, flips


def greedy_order_device(
    starts: np.ndarray,
    ends: np.ndarray,
    closed,
    closed_aware: bool,
    seed: int,
) -> Optional[Tuple[List[int], List[bool]]]:
    """(order, flips) via the device planner; None when the plan exceeds the
    largest bucket or the backend errors (callers fall back to host)."""
    import jax
    import jax.numpy as jnp

    n = len(starts)
    bucket = next((b for b in BUCKETS if b >= n), None)
    if bucket is None or n < 2:
        return None
    pad = bucket - n
    s = np.zeros((bucket, 2), np.float32)
    e = np.zeros((bucket, 2), np.float32)
    cl = np.zeros(bucket, bool)
    s[:n] = np.asarray(starts, np.float32)
    e[:n] = np.asarray(ends, np.float32)
    cl[:n] = np.asarray(closed, bool)
    try:
        order, flips = _jitted()(
            jnp.asarray(s), jnp.asarray(e), jnp.asarray(cl),
            jnp.asarray(seed), jnp.asarray(n), closed_aware,
        )
        order = np.asarray(order)[:n]
        flips = np.asarray(flips)[:n]
    except Exception as e:  # noqa: BLE001 — device trouble → host path
        import sys

        print(f"[sort] device planner unavailable ({type(e).__name__}: {e}); "
              "falling back to host", file=sys.stderr)
        return None
    return [int(i) for i in order], [bool(f) for f in flips]


def device_planner_eligible() -> bool:
    """Auto-engage only on a real accelerator: measured exact there, while
    XLA:CPU's fma contraction can flip d² ulps vs the host (module note)."""
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False
