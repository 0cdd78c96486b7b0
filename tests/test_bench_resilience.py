"""bench.py must ALWAYS emit one parseable JSON line (round-2 verdict #1).

The driver captures ``python bench.py`` stdout; round 2's record was a bare
traceback because one transient TPU FAILED_PRECONDITION at the first stage-02
device fetch killed the whole run.  These tests inject that failure mode
through bench.py's seams and assert the retry/backoff/fallback/JSON contract.
No device work happens here — everything is stubbed.
"""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


class _FakeFailedPrecondition(RuntimeError):
    pass


@pytest.fixture(autouse=True)
def _no_sleep(monkeypatch):
    delays = []
    monkeypatch.setattr(bench.time, "sleep", delays.append)
    return delays


@pytest.fixture(autouse=True)
def _fresh_watchdog_state():
    """_DONE/_BEST/armed are process-global (the watchdog emits at most one
    line per process); tests need a fresh slate each."""
    import threading

    bench._DONE = threading.Event()
    bench._BEST.clear()
    bench._FB_STATE.clear()
    bench._WD_STATE.clear()
    bench._start_watchdog.armed = False
    yield
    bench._DONE.set()  # release any armed watchdog thread promptly


def _run_e2e(capsys, runner, probe=lambda: 0.01):
    def factory(device_init):
        return runner, lambda: None, 0.786432  # 1024×768 Mpx

    with pytest.raises(SystemExit) as ei:
        bench.bench_e2e(runner_factory=factory, probe=probe)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"stdout must be exactly one line, got {out}"
    return ei.value.code, json.loads(out[0])


def test_first_dispatch_failure_is_retried(capsys, _no_sleep):
    """The exact round-2 failure: first pipeline run dies mid-stage; the
    retry succeeds and a normal metric line is emitted with rc 0."""
    calls = {"n": 0}

    def runner(tag):
        calls["n"] += 1
        if calls["n"] == 1:
            raise _FakeFailedPrecondition("TPU backend error (FailedPrecondition).")
        return 1.0

    rc, obj = _run_e2e(capsys, runner)
    assert rc == 0
    assert obj["metric"] == "e2e_image_to_stream_megapixels_per_sec"
    assert obj["value"] == pytest.approx(0.7864, abs=1e-3)
    assert obj["vs_baseline"] > 100
    assert _no_sleep, "a backoff sleep must separate the retry"


def test_timed_runs_fail_falls_back_to_warmup(capsys):
    """Warmup completed but every timed run fails → emit the best COMPLETED
    run (the warmup) rather than nothing."""

    def runner(tag):
        if tag != "warmup":
            raise _FakeFailedPrecondition("tenant holds the chip")
        return 2.0

    rc, obj = _run_e2e(capsys, runner)
    assert rc == 0
    assert obj["value"] == pytest.approx(0.786432 / 2.0, abs=1e-3)


def test_total_failure_emits_error_json(capsys):
    def runner(tag):
        raise _FakeFailedPrecondition("dead backend")

    rc, obj = _run_e2e(capsys, runner)
    assert rc == 1
    assert obj["metric"] == "e2e_image_to_stream_megapixels_per_sec"
    assert "dead backend" in obj["error"]


def test_probe_failure_emits_error_json(capsys):
    def probe():
        raise _FakeFailedPrecondition("no route to chip")

    rc, obj = _run_e2e(capsys, lambda tag: 1.0, probe=probe)
    assert rc == 1
    assert "probe failed" in obj["error"]


def test_stage_sysexit_is_caught(capsys):
    """A stage that calls sys.exit(1) (the pipeline's on_error="exit" path)
    must not leak through as an unparsed crash."""
    calls = {"n": 0}

    def runner(tag):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise SystemExit(1)
        return 1.0

    rc, obj = _run_e2e(capsys, runner)
    assert rc == 0
    assert obj["value"] > 0


def test_probe_hang_times_out(monkeypatch, _no_sleep):
    """A HUNG tunnel (observed round 3: trivial op blocked >15 min) must not
    hang the probe — each attempt runs under a thread deadline."""
    import time as real_time

    import threading

    class _HangingJnp:
        @staticmethod
        def arange(n):
            # _no_sleep patches the shared time module — hang via an Event
            threading.Event().wait(5.0)  # far beyond the patched deadline
            import numpy as np

            return np.arange(n)

        sum = staticmethod(lambda x: x.sum())

    import jax

    monkeypatch.setattr(jax, "numpy", _HangingJnp)
    monkeypatch.setattr(bench, "PROBE_ATTEMPT_S", 0.2)
    t0 = real_time.perf_counter()
    with pytest.raises(RuntimeError, match="probe failed"):
        bench.probe_chip(attempts=2)
    assert real_time.perf_counter() - t0 < 4.0, "deadline must cut the hang short"


def test_watchdog_emits_best_when_timed_runs_hang(capsys, monkeypatch):
    """Warmup completed, then the tunnel hangs mid-timed-run: the watchdog
    must emit the warmup-based metric line before any external timeout."""
    monkeypatch.setattr(bench, "WATCHDOG_S", 0.3)

    import threading

    def runner(tag):
        if tag == "warmup":
            return 2.0
        threading.Event().wait(1.2)  # hang long past the watchdog deadline
        return 1.0

    def factory(device_init):
        return runner, lambda: None, 0.786432

    with pytest.raises(SystemExit):
        bench.bench_e2e(runner_factory=factory, probe=lambda: 0.01)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"exactly one JSON line, got {out}"
    obj = json.loads(out[0])
    assert obj["value"] == pytest.approx(0.786432 / 2.0, abs=1e-3)


def test_probe_failure_routes_to_cpu_fallback(capsys, monkeypatch):
    """A dead tunnel (probe exhausts retries) with cpu_fallback enabled must
    emit the labeled host-CPU measurement, not an error line."""
    fb_calls = []

    def fake_fallback(metric, reason):
        fb_calls.append(reason)
        return {"metric": metric, "value": 0.5, "unit": "Mpx/s",
                "vs_baseline": 119.05, "backend": "cpu-fallback", "note": reason}

    monkeypatch.setattr(bench, "_cpu_fallback", fake_fallback)

    def probe():
        raise _FakeFailedPrecondition("no route to chip")

    def factory(device_init):
        return (lambda tag: 1.0), lambda: None, 0.786432

    with pytest.raises(SystemExit) as ei:
        bench.bench_e2e(runner_factory=factory, probe=probe, cpu_fallback=True)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert ei.value.code == 0
    assert obj["backend"] == "cpu-fallback"
    assert obj["value"] == 0.5
    assert fb_calls and "probe failed" in fb_calls[0]


def test_reprobe_recovery_after_probe_failure_emits_chip_number(capsys, monkeypatch):
    """Round-4 verdict #1: after the labeled CPU fallback, the benchmark must
    keep re-probing; when the tunnel recovers, the REAL chip bench runs and
    its number is the primary record (the fallback value kept as secondary)."""
    fb_calls = []

    def fake_fallback(metric, reason):
        fb_calls.append(reason)
        return {"metric": metric, "value": 0.5, "unit": "Mpx/s",
                "vs_baseline": 119.05, "backend": "cpu-fallback", "note": reason}

    monkeypatch.setattr(bench, "_cpu_fallback", fake_fallback)

    probes = {"n": 0}

    def probe():
        probes["n"] += 1
        if probes["n"] < 4:  # initial failure + 2 failed re-probes, then recovery
            raise _FakeFailedPrecondition("no route to chip")
        return 0.01

    def factory(device_init):
        return (lambda tag: 1.0), lambda: None, 0.786432

    with pytest.raises(SystemExit) as ei:
        bench.bench_e2e(runner_factory=factory, probe=probe, cpu_fallback=True)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert ei.value.code == 0
    assert obj.get("backend") is None, "primary record must be the chip number"
    assert obj["value"] == pytest.approx(0.7864, abs=1e-3)
    assert obj["fallback_value"] == 0.5
    assert "recovered" in obj["note"]
    assert fb_calls and probes["n"] >= 4


def test_reprobe_recovery_after_warmup_failure_retries_warmup(capsys, monkeypatch):
    """Probe OK but the chip flaps mid-warmup and exhausts the retry ladder:
    bank the labeled fallback, re-probe, and when the chip recovers retry the
    warmup and emit the chip number."""
    monkeypatch.setattr(
        bench, "_cpu_fallback",
        lambda metric, reason: {"metric": metric, "value": 0.4, "unit": "Mpx/s",
                                "vs_baseline": 95.24, "backend": "cpu-fallback",
                                "note": reason},
    )
    calls = {"n": 0}

    def runner(tag):
        calls["n"] += 1
        if calls["n"] <= 5:  # the full warmup retry ladder fails
            raise _FakeFailedPrecondition("tunnel flap")
        return 2.0

    def factory(device_init):
        return runner, lambda: None, 0.786432

    with pytest.raises(SystemExit) as ei:
        bench.bench_e2e(runner_factory=factory, probe=lambda: 0.01, cpu_fallback=True)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert ei.value.code == 0
    assert obj.get("backend") is None
    assert obj["value"] == pytest.approx(0.786432 / 2.0, abs=1e-3)
    assert obj["fallback_value"] == 0.4
    assert calls["n"] > 5, "warmup must have been retried after recovery"


def test_reprobe_budget_exhausted_keeps_fallback_record(capsys, monkeypatch):
    """Tunnel never recovers: the re-probe loop must terminate within its
    attempt budget and the labeled fallback record must be emitted."""
    monkeypatch.setattr(
        bench, "_cpu_fallback",
        lambda metric, reason: {"metric": metric, "value": 0.5, "unit": "Mpx/s",
                                "vs_baseline": 119.05, "backend": "cpu-fallback",
                                "note": reason},
    )
    probes = {"n": 0}

    def probe():
        probes["n"] += 1
        raise _FakeFailedPrecondition("still dead")

    def factory(device_init):
        return (lambda tag: 1.0), lambda: None, 0.786432

    with pytest.raises(SystemExit) as ei:
        bench.bench_e2e(runner_factory=factory, probe=probe, cpu_fallback=True)
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert ei.value.code == 0
    assert obj["backend"] == "cpu-fallback"
    # re-probes happened (initial probe + at least one re-probe) and the
    # attempt cap bounded them at ~budget/cadence
    assert 2 <= probes["n"] <= 2 + bench.WATCHDOG_S / bench.REPROBE_INTERVAL_S + 2


def test_cpu_fallback_failure_still_emits_error_json(capsys, monkeypatch):
    monkeypatch.setattr(bench, "_cpu_fallback", lambda metric, reason: None)

    def probe():
        raise _FakeFailedPrecondition("no route to chip")

    def factory(device_init):
        return (lambda tag: 1.0), lambda: None, 0.786432

    with pytest.raises(SystemExit) as ei:
        bench.bench_e2e(runner_factory=factory, probe=probe, cpu_fallback=True)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert ei.value.code == 1
    assert "probe failed" in json.loads(out[0])["error"]


def test_watchdog_tries_cpu_fallback_when_nothing_completed(capsys, monkeypatch):
    """Probe OK but the first (warmup) run hangs forever: the watchdog must
    try the CPU fallback once and emit its labeled result."""
    monkeypatch.setattr(bench, "WATCHDOG_S", 0.3)

    def fake_fallback(metric, reason):
        bench._FB_STATE["attempted"] = True
        return {"metric": metric, "value": 0.4, "unit": "Mpx/s",
                "vs_baseline": 95.24, "backend": "cpu-fallback", "note": reason}

    monkeypatch.setattr(bench, "_cpu_fallback", fake_fallback)

    import threading

    def runner(tag):
        threading.Event().wait(3.0)  # hang far past the watchdog deadline
        return 1.0

    def factory(device_init):
        return runner, lambda: None, 0.786432

    t = threading.Thread(
        target=lambda: pytest.raises(BaseException, bench.bench_e2e,
                                     runner_factory=factory, probe=lambda: 0.01,
                                     cpu_fallback=True),
        daemon=True,
    )
    t.start()
    deadline = 5.0
    import time as real_time

    t0 = real_time.perf_counter()
    while not bench._DONE.is_set() and real_time.perf_counter() - t0 < deadline:
        real_time.sleep(0.05)
    assert bench._DONE.is_set(), "watchdog never emitted"
    real_time.sleep(0.1)  # let the output flush
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert obj["backend"] == "cpu-fallback"
    assert obj["value"] == 0.4


def test_extract_metric_scans_last_parseable_line():
    m = "e2e_image_to_stream_megapixels_per_sec"
    stdout = "\n".join([
        "noise",
        json.dumps({"metric": m, "value": 0.1, "unit": "Mpx/s"}),
        "[bench] log line",
        json.dumps({"metric": m, "value": 0.2, "unit": "Mpx/s"}),
        "{broken json",
    ])
    assert bench._extract_metric(stdout, m)["value"] == 0.2
    assert bench._extract_metric("no json here", m) is None
    # error lines (no value) don't count
    assert bench._extract_metric(json.dumps({"metric": m, "error": "x"}), m) is None


def test_cpu_inner_runner_pins_raster_device(tmp_path, monkeypatch):
    """--cpu-inner must flow raster_device=cpu into the pipeline config."""
    captured = {}

    def fake_runner_factory(device_init, raster_device=None):
        captured["raster_device"] = raster_device
        raise _Stop()

    class _Stop(Exception):
        pass

    monkeypatch.setattr(bench, "_make_e2e_runner", fake_runner_factory)
    with pytest.raises(_Stop):
        bench.bench_e2e(probe=lambda: None, raster_device="cpu")
    assert captured["raster_device"] == "cpu"


def test_probe_retries_then_succeeds(monkeypatch, _no_sleep):
    import numpy as np

    calls = {"n": 0}

    class _FakeJnp:
        @staticmethod
        def arange(n):
            calls["n"] += 1
            if calls["n"] == 1:
                raise _FakeFailedPrecondition("flap")
            return np.arange(n)

        @staticmethod
        def sum(x):
            return np.sum(x)

    import jax

    monkeypatch.setattr(jax, "numpy", _FakeJnp)
    rtt = bench.probe_chip()
    assert rtt >= 0.0
    assert calls["n"] == 2
