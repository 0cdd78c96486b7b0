#!/usr/bin/env python3
"""VERDICT r1 item 7: measure stage 07's greedy nearest-neighbor ordering
on-device (fori_loop over a masked distance matrix — SURVEY build-plan
slice 4) against the host C++ selection loop (native pw_greedy_order).

Semantics replicated (07_sort_contours.py:50-87): float32 squared
distances, ascending-index first-minimum-wins (jnp.argmin), closed-aware
start preference, open contours prefer start when d2s <= d2e.

Usage: python tests/tools/bench_greedy_device.py   (runs on default backend)
Publishes numbers for ROADMAP.md.
"""

from __future__ import annotations

import time
from functools import partial

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("closed_aware",))
def greedy_order_device(starts, ends, closed, seed, closed_aware=True):
    """(order, flips) of the greedy nearest-endpoint tour, one dispatch."""
    s = starts.astype(jnp.float32)
    e = ends.astype(jnp.float32)
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

    used0 = jnp.zeros(n, bool).at[seed].set(True)
    cur0 = jnp.where(closed_f[seed], s[seed], e[seed])
    order0 = jnp.zeros(n, jnp.int32).at[0].set(seed.astype(jnp.int32))
    flips0 = jnp.zeros(n, bool)
    _, _, order, flips = jax.lax.fori_loop(1, n, body, (used0, cur0, order0, flips0))
    return order, flips


def host_order(starts, ends, closed, seed):
    from plotweave.vector.sort import _greedy_order_native

    return _greedy_order_native(starts, ends, closed, True, seed)


def main() -> None:
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for n in (100, 1000, 5000, 20000):
        starts = rng.integers(0, 4000, (n, 2)).astype(np.float32)
        ends = rng.integers(0, 4000, (n, 2)).astype(np.float32)
        closed = rng.random(n) < 0.3
        seed = 0

        t0 = time.perf_counter()
        o_host, f_host = host_order(starts, ends, closed, seed)
        t_host = time.perf_counter() - t0

        sd, ed, cd, seedd = (
            jnp.asarray(starts),
            jnp.asarray(ends),
            jnp.asarray(closed),
            jnp.asarray(seed),
        )
        o_dev, f_dev = greedy_order_device(sd, ed, cd, seedd)  # compile
        o_dev.block_until_ready()
        t0 = time.perf_counter()
        o_dev, f_dev = greedy_order_device(sd, ed, cd, seedd)
        o_dev.block_until_ready()
        t_dev = time.perf_counter() - t0

        match = np.array_equal(np.asarray(o_dev), np.asarray(o_host)) and np.array_equal(
            np.asarray(f_dev), np.asarray(f_host)
        )
        print(
            f"n={n:6d}  host C++ {t_host * 1e3:9.2f} ms   device {t_dev * 1e3:9.2f} ms"
            f"   ratio {t_dev / t_host:7.1f}x   order+flips match: {match}"
        )


if __name__ == "__main__":
    main()
