"""Headless driver for the interactive simulator's playback core.

The pygame loop was the one component whose behavior was only hand-verified
(round-2 verdict #8).  These tests script the interactive controls —
play/pause (advance), single-step, forward/backward seek, and the
zoom-invalidates-canvas path (clear_snapshots) — against ``PlaybackEngine``
and assert frame-state invariants versus a straight decoder replay (the
reference previewer is the executable spec,
/root/reference/shared/omnirevolve_plotter_stream_previewer.py:412-503).
"""

from __future__ import annotations

import numpy as np
import pytest

from plotweave.stream import MotionProfile
from plotweave.stream.decoder import StreamDecoder, replay
from plotweave.stream.emitter import StreamEmitter
from plotweave.viz.simulator import PlaybackEngine

W = H = 400


@pytest.fixture(scope="module")
def commands():
    """A stream with lines, travels, taps and color changes → command list."""
    prof = MotionProfile()
    sb = StreamEmitter()
    sb.pen_up()
    sb.speed(prof.div_start)
    pos = (0, 0)
    rng = np.random.default_rng(3)
    for color in (3, 1, 0):
        sb.select_color(color)
        for _ in range(3):
            pts = rng.integers(10, 350, (4, 2)).tolist()
            sb.travel(pos[0], pos[1], pts[0][0], pts[0][1], prof)
            sb.pen_down()
            sb.polyline([tuple(p) for p in pts], prof)
            sb.pen_up()
            pos = tuple(pts[-1])
        tx, ty = (int(v) for v in rng.integers(10, 350, 2))
        sb.travel(pos[0], pos[1], tx, ty, prof)
        sb.tap()
        pos = (tx, ty)
    data = sb.finish()
    dec = StreamDecoder(data)
    assert dec.stats.eof_seen
    replay(dec, 10_000, 10_000)  # fills the invariant counters (final_x/y)
    return dec.commands, dec


class _Canvas:
    """Deterministic pixel canvas: lines mark both endpoints, taps mark a
    point — enough to detect any divergence in what was drawn and when."""

    def __init__(self):
        self.px = np.zeros((H, W), np.uint16)
        self.saves = {}
        self._tok = 0

    def draw_line(self, x0, y0, x1, y1, ci):
        for x, y in ((x0, y0), (x1, y1)):
            if 0 <= x < W and 0 <= y < H:
                self.px[y, x] = ci + 1

    def draw_tap(self, x, y, ci):
        if 0 <= x < W and 0 <= y < H:
            self.px[y, x] = 100 + ci

    def save(self):
        self._tok += 1
        self.saves[self._tok] = self.px.copy()
        return self._tok

    def restore(self, tok):
        self.px = np.zeros((H, W), np.uint16) if tok is None else self.saves[tok].copy()


def _engine(commands, snapshot_every=500):
    cv = _Canvas()
    eng = PlaybackEngine(commands, cv.draw_line, cv.draw_tap, cv.save, cv.restore,
                         snapshot_every=snapshot_every)
    return eng, cv


def _state(eng, cv):
    return (eng.i, eng.x, eng.y, eng.pen, eng.color_idx, cv.px.copy())


def test_full_playback_matches_decoder_replay(commands):
    cmds, dec = commands
    eng, cv = _engine(cmds)
    eng.seek(len(cmds))
    assert eng.done
    # the decoder's invariant counters are the spec: final position must agree
    assert (eng.x, eng.y) == (dec.stats.final_x, dec.stats.final_y)


def test_stepping_equals_seeking(commands):
    cmds, _ = commands
    a, ca = _engine(cmds)
    b, cb = _engine(cmds)
    n = min(len(cmds), 1200)
    for _ in range(n):
        a.advance(1)  # single-step control
    b.seek(n)  # direct seek
    assert _state(a, ca)[:5] == _state(b, cb)[:5]
    assert (ca.px == cb.px).all()


@pytest.mark.parametrize("snapshot_every", [100, 999, 10**9])
def test_random_seek_sequence_is_deterministic(commands, snapshot_every):
    """Arbitrary forward/backward seeks (the scrub control) must land in
    exactly the state of a fresh playback to the same position — whether the
    restore comes from a snapshot or a from-scratch replay."""
    cmds, _ = commands
    eng, cv = _engine(cmds, snapshot_every)
    rng = np.random.default_rng(7)
    for target in rng.integers(0, len(cmds) + 1, 12):
        eng.seek(int(target))
        ref, rcv = _engine(cmds)
        ref.seek(int(target))
        assert _state(eng, cv)[:5] == _state(ref, rcv)[:5], target
        assert (cv.px == rcv.px).all(), target


def test_zoom_invalidates_snapshots(commands):
    """The zoom control re-renders at a new viewport: clear_snapshots must
    force backward seeks to replay from blank, not restore stale pixels."""
    cmds, _ = commands
    eng, cv = _engine(cmds, snapshot_every=200)
    eng.seek(len(cmds) // 2)
    assert eng._snaps, "snapshots should exist before the zoom"
    eng.clear_snapshots()
    eng.seek(len(cmds) // 4)  # backward after invalidation
    ref, rcv = _engine(cmds)
    ref.seek(len(cmds) // 4)
    assert _state(eng, cv)[:5] == _state(ref, rcv)[:5]
    assert (cv.px == rcv.px).all()


def test_pen_and_color_state_invariants(commands):
    """At every snapshot boundary the engine state must match the decoder's
    incremental replay of the same prefix (pen/color/position)."""
    cmds, _ = commands
    from plotweave.stream.decoder import COLOR, PEN, STEP
    from plotweave.stream.protocol import B_PEN_DOWN, B_PEN_UP, B_TAP, DIR_VECTORS

    eng, cv = _engine(cmds)
    x = y = 0
    pen = False
    color = 0
    checkpoints = set(np.linspace(0, len(cmds), 17, dtype=int).tolist())
    for i, (kind, v) in enumerate(cmds):
        if i in checkpoints:
            eng.seek(i)
            assert (eng.x, eng.y, eng.pen, eng.color_idx) == (x, y, pen, color), i
        if kind == STEP:
            x += int(DIR_VECTORS[v][0])
            y += int(DIR_VECTORS[v][1])
        elif kind == PEN:
            if v == B_PEN_DOWN:
                pen = True
            elif v in (B_PEN_UP, B_TAP):
                pen = False
        elif kind == COLOR:
            color = v
