#!/usr/bin/env python3
"""Generate the byte golden for the alternative manifest stream creator by
RUNNING the reference creator as a CLI oracle.

The reference `shared/omnirevolve_plotter_stream_creator.py` is runnable
(its helper import resolves via the script directory), so the legacy-format
fixture built here is fed to it via subprocess and the resulting stream
bytes are committed:

    tests/golden/manifest_creator_ref.bin

The fixture itself is DETERMINISTIC (seeded rng, pure-content pickles) and
is rebuilt inside the test at run time — only the reference-produced bytes
are committed.  It exercises the creator's quirks: layer sort by color
index, entry-level color fallbacks, OpenCV-shaped (N,1,2) contours,
off-canvas clamping, round-half-even coordinate ties, sub-2-point contour
filtering, taps-only and empty layers, a missing layer file, and the
explicit initial set_speed byte.

No reference code is copied — the reference module is executed, not
vendored.
"""

from __future__ import annotations

import json
import pickle
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REF_CREATOR = Path("/root/reference/shared/omnirevolve_plotter_stream_creator.py")
GOLDEN = Path(__file__).resolve().parent.parent / "golden" / "manifest_creator_ref.bin"

W_STEPS, H_STEPS = 8400, 11880


def make_fixture(out_dir: Path, seed: int = 31) -> Path:
    """Write the legacy-format layer pickles + manifest into ``out_dir``;
    returns the manifest path.  Deterministic for a given seed."""
    rng = np.random.default_rng(seed)
    out_dir.mkdir(parents=True, exist_ok=True)

    def contour(n, lo=-50.0, hi=9000.0, cv_shape=False, dtype=np.float64):
        pts = rng.uniform(lo, hi, (n, 2))
        # sprinkle exact .5 ties (round-half-even) and clamp-needing points
        if n >= 3:
            pts[0] = [100.5, 101.5]
            pts[1] = [-20.0, H_STEPS + 500.0]
        a = pts.astype(dtype)
        if cv_shape:
            a = a.reshape(-1, 1, 2)
        return a

    layers = [
        # out-of-order color indices: creator must sort 2,0,3,1 -> 0,1,2,3
        {
            "file": "layer_red.pkl",
            "color_name": "red",
            "color_index": 2,
            "data": {
                "color_name": "red",
                "color_idx": 2,
                "contours": [
                    {"points": contour(8)},
                    {"points": contour(5, cv_shape=True, dtype=np.int32)},
                    {"points": contour(1)},  # filtered: < 2 points
                    {"points": np.empty((0, 2), np.float64)},
                ],
                "taps": [{"x": 123.5, "y": 456.5}, {"x": -5, "y": 99999}],
            },
        },
        {
            "file": "layer_blue.pkl",
            "color_name": "blue",
            "color_index": 0,
            "data": {
                "color_name": "blue",
                "color_idx": 0,
                "contours": [{"points": contour(12)}, {"points": contour(3)}],
                "taps": [],
            },
        },
        # pickle lacking color fields: entry-level fallbacks apply
        {
            "file": "layer_fallback.pkl",
            "color_name": "green",
            "color_index": 3,
            "data": {
                "contours": [{"points": contour(4, cv_shape=True)}],
                "taps": [{"x": 800, "y": 800}],
            },
        },
        # taps-only layer (first element is a tap: pre-travel to it)
        {
            "file": "layer_taps.pkl",
            "color_name": "taps",
            "color_index": 1,
            "data": {
                "color_name": "taps",
                "color_idx": 1,
                "contours": [],
                "taps": [{"x": 40.0, "y": 40.0}, {"x": 40.0, "y": 40.0},
                         {"x": 2000.25, "y": 3000.75}],
            },
        },
        # neither contours nor taps: no pre-travel, color still selected
        {
            "file": "layer_empty.pkl",
            "color_name": "empty",
            "color_index": 4,
            "data": {"color_name": "empty", "color_idx": 4,
                     "contours": [], "taps": []},
        },
    ]
    manifest = {"image_size": [W_STEPS, H_STEPS], "layers": []}
    for L in layers:
        (out_dir / L["file"]).write_bytes(pickle.dumps(L["data"], protocol=4))
        manifest["layers"].append(
            {"file": L["file"], "color_name": L["color_name"],
             "color_index": L["color_index"]}
        )
    # an entry whose file is absent: creator prints a warning and skips
    manifest["layers"].append(
        {"file": "layer_missing.pkl", "color_name": "ghost", "color_index": 5}
    )
    mp = out_dir / "vector_manifest.json"
    mp.write_text(json.dumps(manifest, indent=2), encoding="utf-8")
    return mp


def run_reference(manifest: Path, out_bin: Path) -> bytes:
    subprocess.run(
        [
            sys.executable, str(REF_CREATOR), str(manifest),
            "-o", str(out_bin),
            "--target-width-steps", str(W_STEPS),
            "--target-height-steps", str(H_STEPS),
        ],
        check=True, capture_output=True, timeout=300,
    )
    return out_bin.read_bytes()


def main() -> None:
    with tempfile.TemporaryDirectory() as td:
        mp = make_fixture(Path(td) / "vec")
        data = run_reference(mp, Path(td) / "ref.bin")
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN.write_bytes(data)
    print(f"wrote {GOLDEN} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
