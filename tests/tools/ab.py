#!/usr/bin/env python3
"""Interleaved A/B capture harness — the BASELINE.md measurement convention.

This host's performance is episodically pathological (CLAUDE.md: fresh-page
faults swing 70 ms → 13 s for the same alloc; the tunnel RTT swings
0.03 → 0.5 s minute-to-minute), so best-of numbers captured in different
phases are meaningless.  The round-4 verdict's fix (weak #2): every
comparative claim runs k ALTERNATING A/B pairs in the same phase and quotes
the per-side MEDIAN + spread, bracketed by tunnel-health probes.

Usage (from any bench tool):

    from ab import ab_capture
    res = ab_capture(run_batch, run_seq, k=3, label_a="batch", label_b="seq")
    # res = {"a": {...median/min/max/times...}, "b": {...},
    #        "probe_rtt_s": [before, after], "winner": "a"|"b"|"tie"}

Each run_* callable executes one full measurement and returns a float whose
LARGER-IS-BETTER interpretation is up to the caller (pass throughput, or
negate wall seconds via ``lower_is_better=True``).
"""

from __future__ import annotations

import json
import statistics
import time
from typing import Callable, Optional


def probe_rtt() -> Optional[float]:
    """Trivial-op + HOST-FETCH tunnel round trip in seconds (the CLAUDE.md
    healthy-tunnel sanity check); None if the device is unreachable."""
    try:
        import numpy as np
        import jax.numpy as jnp

        t0 = time.perf_counter()
        v = float(np.asarray(jnp.sum(jnp.arange(8.0))))
        if v != 28.0:
            return None
        return time.perf_counter() - t0
    except Exception:  # noqa: BLE001 — dead tunnel → None
        return None


def _side(times: list) -> dict:
    return {
        "times": [round(t, 4) for t in times],
        "median": round(statistics.median(times), 4),
        "min": round(min(times), 4),
        "max": round(max(times), 4),
        "spread_pct": round(
            100.0 * (max(times) - min(times)) / max(1e-12, statistics.median(times)), 1
        ),
    }


def ab_capture(
    run_a: Callable[[], float],
    run_b: Callable[[], float],
    k: int = 3,
    label_a: str = "A",
    label_b: str = "B",
    lower_is_better: bool = False,
    probe: bool = True,
    verbose: bool = True,
) -> dict:
    """Run A and B alternately (A,B,A,B,…) k times per side in the SAME
    phase; return medians, spreads and the winner by median."""
    rtts = []
    if probe:
        rtts.append(probe_rtt())
    ta: list = []
    tb: list = []
    for i in range(k):
        for label, fn, acc in ((label_a, run_a, ta), (label_b, run_b, tb)):
            v = float(fn())
            acc.append(v)
            if verbose:
                print(f"[ab] pair {i + 1}/{k} {label}: {v:.4f}", flush=True)
    if probe:
        rtts.append(probe_rtt())
    a, b = _side(ta), _side(tb)
    ma, mb = a["median"], b["median"]
    if lower_is_better:
        winner = label_a if ma < mb else (label_b if mb < ma else "tie")
    else:
        winner = label_a if ma > mb else (label_b if mb > ma else "tie")
    res = {
        "protocol": f"interleaved A/B, k={k}, median-of-{k} per side, same phase",
        label_a: a,
        label_b: b,
        "winner": winner,
        "probe_rtt_s": [None if r is None else round(r, 3) for r in rtts] if probe else None,
    }
    if verbose:
        print("[ab] " + json.dumps(res), flush=True)
    return res
