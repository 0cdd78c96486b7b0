"""Decoder invariants vs the reference previewer's Statistics (golden).

Only decode-time counters are compared: the reference counts taps and color
changes during *playback* (previewer:319,327), not decode — an asymmetry with
speed_changes, which it does count at decode (:163)."""

from __future__ import annotations

import json
from pathlib import Path

from plotweave.stream.decoder import StreamDecoder

GOLDEN = Path(__file__).parent / "golden"


def test_decoder_stats_match_reference_previewer():
    expected = json.loads((GOLDEN / "decoder_stats.json").read_text())
    assert expected
    for rel, want in expected.items():
        dec = StreamDecoder((GOLDEN / rel).read_bytes())
        s = dec.stats
        got = {
            "total_bytes": s.total_bytes,
            "step_bytes": s.step_bytes,
            "service_bytes": s.service_bytes,
            "single_steps": s.single_steps,
            "double_steps": s.double_steps,
            "steps_total": s.steps_total,
            "speed_changes": s.speed_changes,
            "eof_seen": s.eof_seen,
            "tail_after_eof": s.tail_after_eof,
            "n_commands": len(dec.commands),
        }
        assert got == want, f"{rel}: {got} != {want}"


def test_playback_engine_seek_deterministic():
    """Seeking backward (snapshot restore + replay) must land in exactly the
    state a fresh forward run reaches, and draw the same marks."""
    import numpy as np

    from plotweave.stream import MotionProfile, StreamBuilder, emit_polyline, travel_ramped
    from plotweave.stream.decoder import StreamDecoder
    from plotweave.viz.simulator import PlaybackEngine

    prof = MotionProfile()
    sb = StreamBuilder()
    sb.pen_up()
    rng = np.random.default_rng(2)
    cur = (0, 0)
    for _ in range(6):
        pts = [(int(rng.integers(0, 1200)), int(rng.integers(0, 1200))) for _ in range(4)]
        travel_ramped(sb, cur[0], cur[1], pts[0][0], pts[0][1], prof)
        sb.pen_down()
        emit_polyline(sb, prof, pts)
        sb.pen_up()
        cur = pts[-1]
        if rng.random() < 0.5:
            sb.tap()
    data = sb.finish()
    cmds = StreamDecoder(data).commands

    def make_engine(log):
        canvas = {"marks": ()}  # immutable tuple = cheap exact snapshots

        def draw_line(x0, y0, x1, y1, c):
            canvas["marks"] += (("L", x0, y0, x1, y1, c),)

        def draw_tap(x, y, c):
            canvas["marks"] += (("T", x, y, c),)

        eng = PlaybackEngine(
            cmds, draw_line, draw_tap,
            save_canvas=lambda: canvas["marks"],
            restore_canvas=lambda tok: canvas.__setitem__("marks", tok if tok is not None else ()),
            snapshot_every=500,
        )
        log.append(canvas)
        return eng

    log_a, log_b = [], []
    a = make_engine(log_a)
    b = make_engine(log_b)

    n = len(cmds)
    # a: straight run to several positions; b: wander forward/backward
    for target in (n // 3, n // 7, n - 1, 0, n // 2, n):
        a2_log = []
        fresh = make_engine(a2_log)
        fresh.seek(target)
        b.seek(target)
        assert (b.i, b.x, b.y, b.pen, b.color_idx) == (fresh.i, fresh.x, fresh.y, fresh.pen, fresh.color_idx)
        assert log_b[0]["marks"] == a2_log[0]["marks"]
