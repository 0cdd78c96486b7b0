#!/usr/bin/env python3
"""Benchmark (the BASELINE.json metric): end-to-end image→stream Mpx/s.

Default: the full 13-stage pipeline (1024×768, 4 color layers) against the
reference pipeline measured single-core on this host (189.5 s → 0.0042
Mpx/s).  ``--frontend`` instead measures the fused stage-01–04 device
program (2000×1500 → 4 layers → morphology → Gaussian → Canny → Zhang–Suen)
against the reference's cv2/numpy single-core equivalents (0.9643 Mpx/s,
tests/tools/measure_reference_baseline.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} on success,
or {"metric", "error"} if every attempt failed — never a bare traceback.

Resilience (the chip is single-tenant and the tunnel flaps — see CLAUDE.md
"Environment facts"): a trivial-op + HOST-FETCH health probe runs before any
warmup, every pipeline run is retried with exponential backoff on runtime
errors (FAILED_PRECONDITION clears when the other tenant releases the chip),
and the final JSON is emitted from the best *completed* run even when later
runs fail.  The tunnel can also HANG outright (observed round 3: a trivial
op blocked > 15 min) — probe attempts run under a thread deadline and a
global watchdog (PW_BENCH_WATCHDOG_S, default 2400 s) emits the best
completed run or an explicit error line, then hard-exits.  Timing sync uses
host fetches of device scalars — CLAUDE.md: ``block_until_ready`` does not
reliably block on this backend.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

# measured via tests/tools/measure_reference_baseline.py (2000×1500, 4 layers,
# cv2.setNumThreads(1), OMP_NUM_THREADS=1): 3.11 s → 0.9643 Mpx/s
REFERENCE_SINGLE_CORE_MPX_S = 0.9643

# retry schedule (seconds between attempts) for transient device errors;
# tenancy conflicts on the single-tenant chip clear on the other process's
# exit, so waiting ~2 min total is worthwhile before giving up
BACKOFF_S = (5.0, 15.0, 30.0, 60.0)

# The tunnel can HANG (a trivial op blocks forever, observed round 3) — not
# just error.  Two guards make the JSON contract hold anyway:
#  - each chip-probe attempt runs under a thread deadline (a hung attempt
#    counts as a failure and is retried while the old call blocks on),
#  - a global watchdog emits the best COMPLETED run (or an explicit error
#    line) if the whole benchmark exceeds its deadline; in CLI runs it then
#    hard-exits (os._exit) so stuck runtime threads can't keep the process
#    alive (in-process/test use keeps SystemExit semantics instead).
WATCHDOG_S = float(os.environ.get("PW_BENCH_WATCHDOG_S", "2400"))
PROBE_ATTEMPT_S = float(os.environ.get("PW_BENCH_PROBE_ATTEMPT_S", "120"))

# The tunnel can be dead for HOURS (observed round 3).  Rather than record an
# error line for the whole round, the e2e benchmark falls back to measuring
# the same pipeline pinned to the host CPU backend (raster_device=cpu — the
# total escape hatch that never initializes the default backend, so a hung
# axon plugin can't block it).  The result is explicitly labeled
# "backend": "cpu-fallback" so it is never mistaken for a chip number.
CPU_FALLBACK_S = float(os.environ.get("PW_BENCH_CPU_FALLBACK_S", "1800"))

# A fallback is not the end of the story: the tunnel flaps minute-to-minute
# (CLAUDE.md), so after the labeled CPU measurement completes the benchmark
# keeps RE-PROBING the chip on a slow cadence for the remaining watchdog
# budget (round 4 left ~35 min unused) and, if it recovers, runs the real
# bench and emits the chip number as the primary record (the fallback value
# rides along as a secondary field).
REPROBE_INTERVAL_S = float(os.environ.get("PW_BENCH_REPROBE_S", "180"))
REPROBE_MARGIN_S = float(os.environ.get("PW_BENCH_REPROBE_MARGIN_S", "300"))

_BEST: dict = {}  # best completed result so far, emitted by the watchdog
_FB_STATE: dict = {}  # CPU-fallback bookkeeping: "attempted", "deadline", "result"
_WD_STATE: dict = {}  # watchdog arm time: "deadline" (monotonic)
_DONE = threading.Event()
_EMIT_LOCK = threading.Lock()  # exactly-one-JSON-line: main vs watchdog race
_HARD_EXIT = False  # set by main(): os._exit instead of SystemExit


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _emit(obj: dict, rc: int) -> None:
    # test-and-set must be atomic: the watchdog deadline can fire in the
    # same instant the benchmark completes, and both paths reach here
    with _EMIT_LOCK:
        if _DONE.is_set():  # the watchdog (or another path) already emitted
            raise SystemExit(rc)
        _DONE.set()
        print(json.dumps(obj), flush=True)
    if _HARD_EXIT:
        sys.stderr.flush()
        os._exit(rc)  # don't wait on threads stuck in hung tunnel calls
    raise SystemExit(rc)


def _start_watchdog(metric: str, fallback=None) -> None:
    """Arm the global deadline (idempotent per process).  ``fallback``, when
    given, is a zero-arg callable producing a metric dict (or None) — tried
    once as a last resort if the deadline passes with no completed run."""
    if getattr(_start_watchdog, "armed", False):
        return
    _start_watchdog.armed = True
    _WD_STATE["deadline"] = time.monotonic() + WATCHDOG_S

    def fire():
        deadline = _WD_STATE["deadline"]
        while True:
            step = min(30.0, max(0.0, deadline - time.monotonic()))
            if _DONE.wait(step):
                return
            # a CPU fallback launched by the main thread extends the deadline
            # (the fallback subprocess is itself bounded by CPU_FALLBACK_S)
            deadline = max(deadline, _FB_STATE.get("deadline", 0.0))
            if time.monotonic() >= deadline:
                break
        _log(f"watchdog: {WATCHDOG_S:.0f}s deadline hit")
        if _BEST.get("value") is not None:
            _emit(dict(_BEST), 0)
        if _FB_STATE.get("result") is not None:
            # a completed labeled CPU-fallback measurement (the main thread is
            # likely mid-re-probe or mid-recovered-run): emit it rather than
            # an error line
            _emit(dict(_FB_STATE["result"]), 0)
        if fallback is not None and not _FB_STATE.get("attempted"):
            obj = fallback()
            if obj is not None:
                _emit(obj, 0)
        _emit({"metric": metric,
               "error": f"no run completed within {WATCHDOG_S:.0f}s "
                        "(tunnel/device hang)"}, 1)

    threading.Thread(target=fire, name="bench-watchdog", daemon=True).start()


def _deadline(label: str, fn, seconds: float):
    """Run ``fn()`` in a worker thread with a join deadline; raise on timeout
    (the abandoned call keeps blocking in its thread — by then the tunnel is
    hung anyway and a fresh attempt is the only way forward)."""
    box: dict = {}

    def work():
        try:
            box["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — reported to the caller
            box["error"] = e

    t = threading.Thread(target=work, name=f"bench-{label}", daemon=True)
    t.start()
    t.join(seconds)
    if "error" in box:
        raise box["error"]
    if "value" not in box:
        raise TimeoutError(f"{label} still blocked after {seconds:.0f}s (hung tunnel?)")
    return box["value"]


def _retrying(label: str, fn, attempts: int = len(BACKOFF_S) + 1):
    """Run ``fn()`` with backoff on ANY exception; return (value, None) on
    success or (None, last_exception) after ``attempts`` failures."""
    last = None
    for i in range(attempts):
        try:
            return fn(), None
        except BaseException as e:  # noqa: BLE001 — SystemExit from a stage counts too
            if isinstance(e, KeyboardInterrupt):
                raise
            last = e
            _log(f"{label}: attempt {i + 1}/{attempts} failed: {type(e).__name__}: {e}")
            if i + 1 < attempts:
                delay = BACKOFF_S[min(i, len(BACKOFF_S) - 1)]
                _log(f"{label}: retrying in {delay:.0f}s")
                time.sleep(delay)
    return None, last


def probe_chip(attempts: int = len(BACKOFF_S) + 1, hang_attempts: int = 2) -> float:
    """Health-check the device with a trivial op + HOST FETCH round trip
    (the CLAUDE.md "healthy-tunnel sanity check").  Returns the round-trip
    seconds; raises after ``attempts`` failures.

    Failure modes differ: transient ERRORS (FAILED_PRECONDITION while another
    tenant holds the chip) clear within the backoff ladder, so they get all
    ``attempts``; a HANG (deadline timeout) means the tunnel is wedged — that
    state persists for hours when observed, so after ``hang_attempts`` hangs
    the probe gives up early and lets the caller reach its CPU fallback while
    any external capture timeout still has headroom."""
    last = None
    hangs = 0
    for i in range(attempts):
        try:

            def roundtrip() -> float:
                import jax.numpy as jnp  # noqa: PLC0415

                t0 = time.perf_counter()
                v = float(np.asarray(jnp.sum(jnp.arange(8.0))))
                if v != 28.0:
                    raise RuntimeError(f"probe computed {v}, expected 28.0")
                return time.perf_counter() - t0

            # the tunnel can hang outright — bound every attempt
            rtt = _deadline("probe", roundtrip, PROBE_ATTEMPT_S)
            _log(f"chip healthy; probe round trip {rtt * 1e3:.0f} ms")
            return rtt
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — reported to the caller
            last = e
            _log(f"probe: attempt {i + 1}/{attempts} failed: {type(e).__name__}: {e}")
            if isinstance(e, TimeoutError):
                hangs += 1
                if hangs >= hang_attempts:
                    raise RuntimeError(
                        f"chip probe failed: hung {hangs}× "
                        f"(deadline {PROBE_ATTEMPT_S:.0f}s each): {e}"
                    ) from e
            if i + 1 < attempts:
                delay = BACKOFF_S[min(i, len(BACKOFF_S) - 1)]
                _log(f"probe: retrying in {delay:.0f}s")
                time.sleep(delay)
    raise RuntimeError(f"chip probe failed after {attempts} attempts: {last!r}")


def _reprobe_until_recovered(probe) -> bool:
    """After a labeled CPU-fallback measurement, keep re-probing the chip on a
    slow cadence for the remaining watchdog budget (the tunnel flaps
    minute-to-minute — CLAUDE.md; round 4's driver run surrendered with ~35
    min of budget unused).  True iff the chip recovered with at least
    REPROBE_MARGIN_S left to run the real bench; False when the budget runs
    out (callers then emit the stored fallback record)."""
    wd_deadline = _WD_STATE.get("deadline") or (time.monotonic() + WATCHDOG_S)
    deadline = wd_deadline - REPROBE_MARGIN_S
    # attempt cap = budget/cadence: the loop ends on whichever of wall-clock
    # or attempt budget runs out first (each attempt also spends the probe's
    # own retry ladder, so the wall deadline usually binds in production)
    max_attempts = max(1, int((deadline - time.monotonic()) / max(1.0, REPROBE_INTERVAL_S)) + 1)
    n = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0 or n >= max_attempts:
            _log("re-probe: watchdog budget exhausted; keeping the CPU-fallback record")
            return False
        time.sleep(min(REPROBE_INTERVAL_S, remaining))
        n += 1
        try:
            probe()
            _log(f"re-probe: chip recovered on attempt {n}")
            return True
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — any failure = still down
            _log(f"re-probe attempt {n}: still unreachable: {type(e).__name__}: {e}")


def _extract_metric(stdout: str, metric: str):
    """Last parseable JSON line in ``stdout`` carrying ``metric`` + a value."""
    for line in reversed((stdout or "").strip().splitlines()):
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("metric") == metric and obj.get("value") is not None:
            return obj
    return None


def _cpu_fallback(metric: str, reason: str):
    """Measure the same e2e pipeline in a FRESH subprocess pinned to the host
    CPU backend and return its parsed metric line (labeled), or None.

    A fresh process matters: this process's probe already tried to initialize
    the default (axon) backend and may be wedged inside it; the subprocess
    runs ``bench.py --cpu-inner`` → raster_device=cpu, which never initializes
    the default backend at all (the tunnel-down escape hatch,
    tests/test_raster_device.py).  A real measured host number — honestly
    labeled — beats an error line when the tunnel is dead for hours."""
    import subprocess  # noqa: PLC0415

    _FB_STATE["attempted"] = True
    _FB_STATE["deadline"] = time.monotonic() + CPU_FALLBACK_S + 120.0
    _log(f"CPU fallback ({reason}): measuring with raster_device=cpu in a subprocess")
    env = dict(os.environ)
    # the inner watchdog must fire before our subprocess timeout so the inner
    # process emits its best completed run rather than being killed mid-flight
    env["PW_BENCH_WATCHDOG_S"] = str(max(120.0, CPU_FALLBACK_S - 120.0))
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-inner"],
            stdout=subprocess.PIPE, stderr=sys.stderr,
            timeout=CPU_FALLBACK_S, env=env, text=True,
        )
    except BaseException as e:  # noqa: BLE001 — fall through to the error line
        _log(f"CPU fallback subprocess failed: {type(e).__name__}: {e}")
        return None
    obj = _extract_metric(p.stdout, metric)
    if obj is None:
        _log(f"CPU fallback produced no metric line (rc={p.returncode})")
        return None
    obj["backend"] = "cpu-fallback"
    obj["note"] = (f"device unreachable ({reason}); same pipeline measured on "
                   "the host CPU backend via raster_device=cpu")
    return obj


def synth_image(h=1500, w=2000, seed=0):
    import cv2

    cv2.setNumThreads(1)
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 255, np.uint8)
    for _ in range(120):
        c = tuple(int(v) for v in rng.integers(0, 256, 3))
        x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
        r = int(rng.integers(10, 150))
        if rng.random() < 0.5:
            cv2.circle(img, (x, y), r, c, -1)
        else:
            cv2.rectangle(img, (x, y), (x + r, y + r), c, -1)
    return img


def _make_e2e_runner(device_init: bool, raster_device: str | None = None):
    """Build (runner, cleanup, mpx): runner(tag) runs the full pipeline into a
    fresh output dir and returns wall seconds.  Fresh dir per call so a failed
    attempt never leaves half-written artifacts for the retry."""
    import json as _json
    import os
    import shutil
    import tempfile
    import cv2

    import plotweave  # noqa: F401 — enables the compilation cache
    from plotweave.config import load_config
    from plotweave.pipeline import run_pipeline

    rng = np.random.default_rng(7)
    H, W = 768, 1024
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :] = (230, 220, 210)
    colors = [(20, 20, 20), (90, 90, 200), (140, 180, 220), (230, 220, 210)]
    for _ in range(60):
        c = colors[int(rng.integers(0, 4))]
        x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
        r = int(rng.integers(15, 90))
        if rng.random() < 0.5:
            cv2.circle(img, (x, y), r, c, -1)
        else:
            cv2.rectangle(img, (x, y), (x + r, y + r), c, -1)

    base = tempfile.mkdtemp(prefix="pw_bench_")
    cv2.imwrite(f"{base}/img.png", img)

    def runner(tag: str) -> float:
        out = f"{base}/{tag}"
        shutil.rmtree(out, ignore_errors=True)
        cfg_d = {
            "input_image": f"{base}/img.png", "output_dir": out,
            "colors": [list(c) for c in colors],
            "color_names": ["layer_dark", "layer_mid", "layer_skin", "layer_light"],
            "edge_low_threshold": 22, "edge_high_threshold": 70, "edge_kernel_size": 7,
            "target_width_mm": 210, "target_height_mm": 297, "pixels_per_mm": 4,
            "pen_width_px": 12, "pen_radius_px": 6,
        }
        if device_init:
            cfg_d["kmeans_init"] = "device"
        if raster_device:
            cfg_d["raster_device"] = raster_device
        os.makedirs(out, exist_ok=True)
        with open(f"{out}/config.json", "w") as f:
            _json.dump(cfg_d, f)
        cfg = load_config(f"{out}/config.json")
        t0 = time.perf_counter()
        run_pipeline(cfg, 1, 13)
        return time.perf_counter() - t0

    def cleanup() -> None:
        shutil.rmtree(base, ignore_errors=True)

    return runner, cleanup, H * W / 1e6


def bench_e2e(device_init: bool = False, runner_factory=None, probe=probe_chip,
              raster_device: str | None = None, cpu_fallback: bool = False) -> None:
    """Primary benchmark: full image→stream pipeline Mpx/s.

    Baseline measured on this host: the reference pipeline (steps 1–13,
    subprocess-per-step, single-core cv2) on the same 1024×768 4-color image:
    189.5 s → 0.0042 Mpx/s.  ``runner_factory``/``probe`` are injectable for
    the resilience tests (tests/test_bench_resilience.py).  ``cpu_fallback``
    (CLI default) reroutes a dead/hung device to a labeled host-CPU
    measurement instead of an error line; ``raster_device`` pins the pipeline
    backend (the ``--cpu-inner`` mode of that fallback).
    """
    ref_mpx_s = 0.0042
    metric = "e2e_image_to_stream_megapixels_per_sec"
    fb = (lambda: _cpu_fallback(metric, f"no run completed within {WATCHDOG_S:.0f}s")) \
        if cpu_fallback else None
    _start_watchdog(metric, fallback=fb)

    def record_best(dt: float) -> None:
        v = mpx / dt
        if _BEST.get("value") is None or v > _BEST["value"]:
            _BEST.update(metric=metric, value=round(v, 4), unit="Mpx/s",
                         vs_baseline=round(v / ref_mpx_s, 2))

    try:
        probe()
    except BaseException as e:  # noqa: BLE001
        if cpu_fallback:
            obj = _cpu_fallback(metric, f"device probe failed: {e}")
            if obj is not None:
                _FB_STATE["result"] = dict(obj)
            # the fallback record is banked — now spend the remaining watchdog
            # budget re-probing for a recovered tunnel; only a recovery falls
            # through to the real chip measurement below
            if not _reprobe_until_recovered(probe):
                if obj is not None:
                    _emit(obj, 0)
                _emit({"metric": metric, "error": f"device probe failed: {e}"}, 1)
            _log("re-probe: chip recovered — measuring the real e2e bench")
        else:
            _emit({"metric": metric, "error": f"device probe failed: {e}"}, 1)

    if runner_factory is not None:  # test seam: factories take device_init only
        runner, cleanup, mpx = runner_factory(device_init)
    else:
        runner, cleanup, mpx = _make_e2e_runner(device_init, raster_device)
    try:
        # warmup fills the persistent compile cache; its wall time also serves
        # as the best-completed-run fallback if both timed runs then fail
        warm, err = _retrying("warmup", lambda: runner("warmup"))
        if warm is None and cpu_fallback:
            # the chip answered the probe but flapped mid-run: bank a labeled
            # host measurement, then re-probe for a recovery and retry once
            if _FB_STATE.get("result") is None:
                obj = _cpu_fallback(metric, f"warmup never completed: {err}")
                if obj is not None:
                    _FB_STATE["result"] = dict(obj)
            if _reprobe_until_recovered(probe):
                _log("re-probe: chip recovered — retrying the warmup")
                warm, err = _retrying("warmup-recovered", lambda: runner("warmup"))
        if warm is None:
            obj = _FB_STATE.get("result")
            if obj is not None:
                _emit(dict(obj), 0)
            _emit({"metric": metric, "error": f"warmup never completed: {err}"}, 1)
        record_best(warm)

        times = []
        for tag in ("timed1", "timed2"):  # min() over 2: tunnel-latency variance
            t, err = _retrying(tag, lambda tag=tag: runner(tag), attempts=3)
            if t is not None:
                times.append(t)
                record_best(t)
        if not times:
            _log(f"no timed run completed ({err}); falling back to the warmup time "
                 "(warm persistent cache — compile cost only on a cold cache)")
            times = [warm]
        dt = min(times)
    finally:
        cleanup()

    value = mpx / dt
    obj = {
        "metric": metric,
        "value": round(value, 4),
        "unit": "Mpx/s",
        "vs_baseline": round(value / ref_mpx_s, 2),
    }
    if raster_device == "cpu":
        obj["backend"] = "cpu"
    elif _FB_STATE.get("result") is not None:
        # chip recovered after an initial CPU fallback: the chip number is the
        # primary record; the labeled fallback value rides along as secondary
        obj["fallback_value"] = _FB_STATE["result"].get("value")
        obj["note"] = "chip recovered after an initial cpu-fallback measurement"
    _emit(obj, 0)


def bench_frontend() -> None:
    """Fused stage-01–04 device program, sustained Mpx/s.

    Sync contract (CLAUDE.md): ``block_until_ready`` is unreliable on this
    backend — completion is forced by HOST-FETCHING a device-side scalar
    reduction of the outputs (only the scalar crosses the slow tunnel).  The
    device executes dispatches in order, so fetching the final iteration's
    reduction bounds the whole timed window.
    """
    metric = "raster_frontend_megapixels_per_sec"
    _start_watchdog(metric)

    try:
        probe_chip()
    except BaseException as e:  # noqa: BLE001
        _emit({"metric": metric, "error": f"device probe failed: {e}"}, 1)

    import jax
    import jax.numpy as jnp

    from plotweave.ops.frontend import raster_frontend

    img = synth_image()
    h, w = img.shape[:2]
    mpx = h * w / 1e6
    centers = np.array(
        [[40, 128, 128], [110, 140, 120], [180, 150, 140], [240, 128, 126]], np.float32
    )

    def fetch(out) -> float:
        # device-side reduction per leaf; only scalars cross the tunnel
        return float(sum(np.asarray(jnp.sum(jnp.asarray(o, jnp.float32))) for o in jax.tree.leaves(out)))

    def one_round() -> float:
        dev_img = jax.device_put(img)
        dev_ctr = jax.device_put(centers)
        fetch(raster_frontend(dev_img, dev_ctr, k=4))  # warmup; fetch proves compile+run finished
        # enough back-to-back dispatches to amortize the host↔device tunnel
        # latency: this measures sustained device throughput
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            out = raster_frontend(dev_img, dev_ctr, k=4)
        fetch(out)  # forces the whole in-order dispatch queue to completion
        return (time.perf_counter() - t0) / iters

    dt, err = _retrying("frontend", one_round)
    if dt is None:
        _emit({"metric": metric, "error": f"frontend bench never completed: {err}"}, 1)

    value = mpx / dt
    _emit(
        {
            "metric": metric,
            "value": round(value, 3),
            "unit": "Mpx/s",
            "vs_baseline": round(value / REFERENCE_SINGLE_CORE_MPX_S, 2),
        },
        0,
    )


def main() -> None:
    global _HARD_EXIT
    _HARD_EXIT = True  # CLI mode: never let stuck runtime threads hold the exit
    # Default = the BASELINE.json metric: end-to-end image→stream Mpx/s.
    # --frontend measures the fused stage-01–04 device program in isolation.
    if "--frontend" in sys.argv:
        bench_frontend()
    elif "--cpu-inner" in sys.argv:
        # the CPU-fallback subprocess: same pipeline pinned to the host CPU
        # backend (raster_device=cpu never initializes the default backend,
        # so a hung axon tunnel cannot block it); no probe, no re-fallback
        bench_e2e(probe=lambda: None, raster_device="cpu")
    else:
        # --device-init: the opt-in single-dispatch stage-02 production mode;
        # a dead/hung device reroutes to the labeled host-CPU measurement
        bench_e2e(device_init="--device-init" in sys.argv, cpu_fallback=True)


if __name__ == "__main__":
    main()
