#!/usr/bin/env python3
"""Generate golden stream bytes by RUNNING the reference encoder as an oracle.

Builds a randomized but seeded "program" (a list of stream specs: profile +
emission ops), interprets it with the reference helper imported from
/root/reference/shared, and writes:

    tests/golden/stream_program.json   — the program (shared input spec)
    tests/golden/stream_NN.bin         — expected bytes per stream

The committed goldens make the byte-equality tests self-contained; re-run
this script only to extend coverage (requires /root/reference mounted).

No reference code is copied — the reference module is executed, not vendored.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REF_SHARED = "/root/reference/shared"
GOLDEN_DIR = Path(__file__).resolve().parent.parent / "golden"


def build_program(seed: int = 7) -> list:
    rng = np.random.default_rng(seed)
    streams = []

    def rand_pts(n, lo=0, hi=4000):
        return [[int(v) for v in p] for p in rng.integers(lo, hi, size=(n, 2))]

    # 1. polylines under the step-13 drawing profile (corner windows 800)
    streams.append(
        {
            "profile": {
                "div_start": 25,
                "div_fast": 15,
                "profile": "triangle",
                "corner_deg": 85.0,
                "corner_div": 30,
                "corner_window_steps": 800,
                "travel_div_fast": 10,
            },
            "ops": [
                {"op": "pen_up"},
                {"op": "color", "index": 3},
                {"op": "pen_down"},
                {"op": "polyline", "pts": rand_pts(12)},
                {"op": "pen_up"},
                {"op": "pen_down"},
                # sharp zig-zag: every vertex is a corner
                {"op": "polyline", "pts": [[0, 0], [900, 10], [20, 30], [950, 40], [30, 60]]},
                {"op": "pen_up"},
            ],
        }
    )

    # 2. default profile, short/degenerate segments and duplicates
    streams.append(
        {
            "profile": {},
            "ops": [
                {"op": "pen_down"},
                {"op": "polyline", "pts": [[5, 5], [6, 5], [6, 5], [7, 6], [7, 6], [100, 6]]},
                {"op": "polyline", "pts": [[0, 0], [1, 1]]},
                {"op": "polyline", "pts": [[10, 10], [10, 10]]},
                {"op": "polyline", "pts": [[0, 0], [0, 1], [1, 1], [0, 0]]},
                {"op": "pen_up"},
            ],
        }
    )

    # 3. s-curve profile with small corner windows
    streams.append(
        {
            "profile": {
                "profile": "scurve",
                "div_start": 28,
                "div_fast": 12,
                "corner_div": 26,
                "corner_window_steps": 40,
                "short_len_steps": 30,
                "short_div": 20,
            },
            "ops": [
                {"op": "pen_down"},
                {"op": "polyline", "pts": rand_pts(30, 0, 300)},
                {"op": "pen_up"},
            ],
        }
    )

    # 4. travels: short odd/even, exactly 1 step, long with cruise, quant steps
    travel_ops = [{"op": "travel", "frm": [0, 0], "to": [1, 0]}]
    cur = [1, 0]
    for dst in [[5, 3], [5, 4], [250, 250], [240, 9000], [0, 0], [13210, 13019], [7, 13012]]:
        travel_ops.append({"op": "travel", "frm": list(cur), "to": list(dst)})
        cur = dst
    streams.append({"profile": {"travel_quant_step": 4}, "ops": travel_ops})
    streams.append(
        {
            "profile": {"travel_quant_step": 7, "travel_window_steps": 100, "travel_div_fast": 8},
            "ops": [{"op": "travel", "frm": [0, 0], "to": [int(a), int(b)]} for a, b in rng.integers(0, 9000, (8, 2))],
        }
    )

    # 5. a mini layer: travel/color/pen/tap interleaving like step 13
    ops = [{"op": "pen_up"}, {"op": "travel", "frm": [0, 0], "to": [500, 700]}, {"op": "color", "index": 1}]
    pos = [500, 700]
    for _ in range(6):
        pts = rand_pts(5, 0, 2500)
        ops += [
            {"op": "pen_up"},
            {"op": "travel", "frm": list(pos), "to": list(pts[0])},
            {"op": "pen_down"},
            {"op": "polyline", "pts": pts},
            {"op": "pen_up"},
        ]
        pos = pts[-1]
        tap = [int(v) for v in rng.integers(0, 2500, 2)]
        ops += [{"op": "travel", "frm": list(pos), "to": list(tap)}, {"op": "tap"}]
        pos = tap
    streams.append(
        {
            "profile": {"div_start": 25, "div_fast": 15, "corner_div": 30, "corner_window_steps": 800},
            "ops": ops,
        }
    )

    return streams


def run_reference(program: list) -> list[bytes]:
    sys.path.insert(0, REF_SHARED)
    import omnirevolve_plotter_stream_creator_helper as ref  # noqa: PLC0415

    blobs = []
    for spec in program:
        cfg = ref.Config(**spec["profile"])
        w = ref.StreamWriter()
        for op in spec["ops"]:
            kind = op["op"]
            if kind == "polyline":
                ref.emit_polyline(w, cfg, [tuple(p) for p in op["pts"]])
            elif kind == "travel":
                ref.travel_ramped(w, op["frm"][0], op["frm"][1], op["to"][0], op["to"][1], cfg)
            elif kind == "pen_up":
                w.pen_up()
            elif kind == "pen_down":
                w.pen_down()
            elif kind == "tap":
                w.tap()
            elif kind == "color":
                w.select_color(op["index"])
        blobs.append(w.finalize())
    return blobs


def main() -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    program = build_program()
    (GOLDEN_DIR / "stream_program.json").write_text(json.dumps(program, indent=1))
    for i, blob in enumerate(run_reference(program)):
        (GOLDEN_DIR / f"stream_{i:02d}.bin").write_bytes(blob)
        print(f"stream_{i:02d}.bin: {len(blob)} bytes")


if __name__ == "__main__":
    main()
