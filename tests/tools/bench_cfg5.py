#!/usr/bin/env python3
"""Reproducible BASELINE config-5 benchmark: SVG → G-code → stream.

Generates a deterministic 2000-path cubic-Bézier SVG, converts it with the
plotweave front-ends (phase-split timings for svg2gcode and each
gcode2stream stage), optionally times the reference gcode2stream on the
same G-code (the reference's svg2gcode leg cannot run — its external
``svg_to_gcode`` dep is uninstallable) and byte-compares the streams.

Usage: python tests/tools/bench_cfg5.py [--no-reference] [--paths N]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
REF = Path("/root/reference/svg_to_stream/gcode2stream.py")


def make_svg(n_paths: int = 2000, seed: int = 5) -> str:
    """n cubic-Bézier strokes scattered over a 1000×1400 canvas."""
    rng = np.random.default_rng(seed)
    parts = [
        '<svg xmlns="http://www.w3.org/2000/svg" width="1000" height="1400" '
        'viewBox="0 0 1000 1400">'
    ]
    for _ in range(n_paths):
        p = rng.uniform((0, 0), (1000, 1400), size=(4, 2))
        d = (
            f"M {p[0,0]:.2f} {p[0,1]:.2f} "
            f"C {p[1,0]:.2f} {p[1,1]:.2f}, {p[2,0]:.2f} {p[2,1]:.2f}, "
            f"{p[3,0]:.2f} {p[3,1]:.2f}"
        )
        parts.append(f'<path d="{d}" fill="none" stroke="black"/>')
    parts.append("</svg>")
    return "\n".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=2000)
    ap.add_argument("--no-reference", action="store_true")
    ap.add_argument("--steps-per-mm", type=float, default=40.0)
    args = ap.parse_args()

    from plotweave.frontends.gcode import (
        emit_stream,
        mm_polylines_to_steps,
        order_nearest_l1,
        parse_polylines_mm,
    )
    from plotweave.frontends.svg2gcode import convert
    from plotweave.stream import MotionProfile

    svg_text = make_svg(args.paths)

    t0 = time.perf_counter()
    gcode = convert(svg_text, samples_per_unit=0.5)
    t_svg2gcode = time.perf_counter() - t0
    print(f"svg2gcode: {t_svg2gcode:.2f} s ({args.paths} paths, "
          f"{len(gcode.splitlines())} G-code lines, {len(gcode) / 1e6:.1f} MB)")

    spm = args.steps_per_mm
    w, h = int(round(210.0 * spm)), int(round(297.0 * spm))

    t0 = time.perf_counter()
    paths_mm, pen_moves = parse_polylines_mm(gcode)
    t_parse = time.perf_counter() - t0
    t0 = time.perf_counter()
    paths = mm_polylines_to_steps(paths_mm, spm, w, h, False)
    t_steps = time.perf_counter() - t0
    t0 = time.perf_counter()
    ordered = order_nearest_l1(paths, (0, 0))
    t_order = time.perf_counter() - t0
    prof = MotionProfile(steps_per_mm=spm, invert_y=False)
    t0 = time.perf_counter()
    data = emit_stream(ordered, prof, 3)
    t_emit = time.perf_counter() - t0
    t_g2s = t_parse + t_steps + t_order + t_emit
    print(
        f"gcode2stream: {t_g2s:.2f} s total — parse {t_parse:.2f} | "
        f"mm→steps {t_steps:.2f} | order {t_order:.2f} | emit {t_emit:.2f} "
        f"({len(paths_mm)} polylines, {pen_moves} moves, {len(data) / 1e6:.1f} MB stream)"
    )
    print(f"full chain: {t_svg2gcode + t_g2s:.2f} s")

    if args.no_reference or not REF.exists():
        return
    import tempfile

    with tempfile.TemporaryDirectory(prefix="pw_cfg5_") as td:
        gpath = Path(td) / "doc.gcode"
        gpath.write_text(gcode)
        rbin = Path(td) / "ref.bin"
        t0 = time.perf_counter()
        r = subprocess.run(
            [
                sys.executable, str(REF), str(gpath), "-o", str(rbin),
                "--steps-per-mm", str(spm),
            ],
            capture_output=True, text=True,
        )
        t_ref = time.perf_counter() - t0
        if r.returncode != 0:
            print(f"reference FAILED: {r.stderr[-500:]}")
            return
        ref_bytes = rbin.read_bytes()
        same = ref_bytes == data
        print(
            f"reference gcode2stream: {t_ref:.2f} s → "
            f"{'BYTE-IDENTICAL' if same else 'MISMATCH!'} "
            f"({t_ref / t_g2s:.1f}× vs plotweave)"
        )


if __name__ == "__main__":
    main()
