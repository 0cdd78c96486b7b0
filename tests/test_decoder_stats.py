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
