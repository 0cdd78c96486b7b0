#!/usr/bin/env python3
"""Golden decoder statistics from the reference previewer (run as oracle).

Decodes committed golden streams with the reference StreamDecoder and stores
its Statistics counters; tests require plotweave's decoder to agree on every
invariant (byte/step/service totals, singles/doubles, taps, color/speed
changes, EOF, tail-after-EOF).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

GOLDEN = Path(__file__).resolve().parent.parent / "golden"


def main() -> None:
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_prev", "/root/reference/shared/omnirevolve_plotter_stream_previewer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_prev"] = mod  # dataclasses need the module registered
    spec.loader.exec_module(mod)

    out = {}
    streams = sorted(GOLDEN.glob("stream_*.bin")) + sorted(GOLDEN.glob("gcode/ref_*.bin"))
    for p in streams:
        dec = mod.StreamDecoder(p.read_bytes())
        s = dec.stats
        key = str(p.relative_to(GOLDEN))
        out[key] = {
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
        print(key, out[key]["steps_total"], "steps")
    (GOLDEN / "decoder_stats.json").write_text(json.dumps(out, indent=1))
    print("saved", GOLDEN / "decoder_stats.json")


if __name__ == "__main__":
    main()
