"""Regression tests for the standalone tools and auxiliary front-ends that
round 1 shipped untested: tools/analyze_colors, tools/process_colors,
frontends/gcode2svg, frontends/svg2stream (orchestrator), utils/analysis.

gcode2svg is oracle-compared against the runnable reference
(svg_to_stream/gcode2svg.py).  analyze_colors' reference counterpart is
non-runnable (its palette module is missing from the reference repo), so its
tests pin structure + determinism instead.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_G2SVG = Path("/root/reference/svg_to_stream/gcode2svg.py")

GCODE = """G21
G90
M5
G0 X10.0 Y20.0
M3
G1 X40.5 Y20.0
G1 X40.5 Y55.25
M5
G0 X60 Y60
M3
G1 X61.2 Y80.4
G1 X10 Y80.4
M5
"""


def _svg_polylines(text: str):
    """Parse polyline point lists (as float pairs) out of a simple SVG."""
    out = []
    for m in re.finditer(r"<polyline[^>]*points=['\"]([^'\"]+)['\"]", text):
        pts = []
        for pair in m.group(1).split():
            x, y = pair.split(",")
            pts.append((float(x), float(y)))
        out.append(pts)
    return out


def test_gcode2svg_matches_reference_oracle(tmp_path):
    gfile = tmp_path / "in.gcode"
    gfile.write_text(GCODE)

    from plotweave.frontends.gcode2svg import main as g2svg_main

    mine_svg = tmp_path / "mine.svg"
    g2svg_main([str(gfile), "-o", str(mine_svg)])

    if REF_G2SVG.exists():
        ref_svg = tmp_path / "ref.svg"
        subprocess.run(
            [sys.executable, str(REF_G2SVG), str(gfile), str(ref_svg)],
            check=True, capture_output=True, timeout=120,
        )
        a = _svg_polylines(ref_svg.read_text())
        b = _svg_polylines(mine_svg.read_text())
        assert a == b, "gcode2svg geometry differs from the reference"
        # canvas dims follow the same int(extent*scale)+2*margin rule
        wa = re.search(r"width=['\"](\d+)['\"]", ref_svg.read_text()).group(1)
        wb = re.search(r"width=['\"](\d+)['\"]", mine_svg.read_text()).group(1)
        assert wa == wb
    else:
        b = _svg_polylines(mine_svg.read_text())
        assert len(b) == 2 and b[0][0] == (10.0, 10.0)  # margin-normalized


def test_gcode2svg_empty_input(tmp_path):
    from plotweave.frontends.gcode2svg import gcode_to_svg

    svg = gcode_to_svg("G21\nG90\nM5\n")
    assert "<svg" in svg and "polyline" not in svg


def test_process_colors_adaptive(tmp_path):
    rng = np.random.default_rng(3)
    img = np.zeros((60, 80, 3), np.uint8)
    img[:30] = (200, 30, 30)
    img[30:, :40] = (30, 200, 30)
    img[30:, 40:] = (30, 30, 200)
    img = np.clip(img.astype(np.int16) + rng.integers(-8, 9, img.shape), 0, 255).astype(np.uint8)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img)

    from plotweave.tools.process_colors import split_layers

    out = tmp_path / "layers"
    pal = split_layers(str(p), str(out), k=3)
    assert len(pal["colors"]) == 3
    labels = np.load(out / "labels.npy")
    assert labels.shape == (60, 80)
    # masks are a partition: exactly one layer hot per pixel
    masks = [
        cv2.imread(str(out / f"layer_{i}_{c['name']}.png"), 0) for i, c in enumerate(pal["colors"])
    ]
    total = sum((m > 0).astype(int) for m in masks)
    assert (total == 1).all()
    # pixel counts in palette.json match the label map
    for i, c in enumerate(pal["colors"]):
        assert c["pixels"] == int((labels == i).sum())
    assert json.loads((out / "palette.json").read_text()) == pal


def test_process_colors_palette_mode(tmp_path):
    img = np.zeros((20, 20, 3), np.uint8)
    img[:10] = (250, 10, 10)  # BGR blue-ish
    img[10:] = (10, 10, 250)  # BGR red-ish
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img)
    pal_path = tmp_path / "pal.json"
    pal_path.write_text(json.dumps({
        "recommended_markers": [
            {"name": "red", "rgb": [250, 10, 10]},
            {"name": "blue", "rgb": [10, 10, 250]},
        ]
    }))

    from plotweave.tools.process_colors import split_layers

    out = tmp_path / "layers"
    pal = split_layers(str(p), str(out), palette_json=str(pal_path))
    names = [c["name"] for c in pal["colors"]]
    assert names == ["red", "blue"]
    labels = np.load(out / "labels.npy")
    # BGR (250,10,10) = RGB (10,10,250) → "blue"; BGR (10,10,250) → "red"
    assert (labels[:10] == 1).all() and (labels[10:] == 0).all()


def test_analyze_colors_structure_and_determinism(tmp_path):
    rng = np.random.default_rng(4)
    img = np.zeros((50, 70, 3), np.uint8)
    img[:25] = (40, 60, 200)   # BGR: red-dominant
    img[25:] = (200, 160, 40)  # BGR: blue/cyan-dominant
    img = np.clip(img.astype(np.int16) + rng.integers(-10, 11, img.shape), 0, 255).astype(np.uint8)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img)

    from plotweave.tools.analyze_colors import analyze, main

    r1 = analyze(str(p), k=3, n_recommend=2)
    r2 = analyze(str(p), k=3, n_recommend=2)
    assert r1 == r2, "analysis must be deterministic"
    assert len(r1["clusters"]) == 3
    assert abs(sum(c["coverage"] for c in r1["clusters"]) - 1.0) < 1e-2
    assert 1 <= len(r1["recommended_markers"]) <= 2
    assert set(r1["hue_histogram"]) == {
        "red", "orange", "yellow", "green", "cyan", "blue", "violet", "magenta"
    }
    # red is a dominant hue in this image
    assert r1["hue_histogram"]["red"] + r1["hue_histogram"]["orange"] > 0.2

    # CLI writes <stem>_colors.json (+ optional matplotlib panel)
    panel = tmp_path / "panel.png"
    main([str(p), "-k", "3", "-n", "2", "--panel", str(panel)])
    out_json = tmp_path / "img_colors.json"
    assert json.loads(out_json.read_text()) == r1
    assert panel.exists() and panel.stat().st_size > 0


def test_svg2stream_orchestrator(tmp_path):
    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg" width="100" height="100" '
        'viewBox="0 0 100 100"><rect x="10" y="10" width="50" height="30"/>'
        '<line x1="20" y1="70" x2="80" y2="90"/></svg>'
    )
    src = tmp_path / "in.svg"
    src.write_text(svg)
    out_bin = tmp_path / "out.bin"
    gcode_out = tmp_path / "mid.gcode"
    preview = tmp_path / "prev.png"

    from plotweave.frontends.svg2stream import main

    main([str(src), "-o", str(out_bin), "--gcode-out", str(gcode_out),
          "--preview", str(preview)])

    data = out_bin.read_bytes()
    assert len(data) > 0 and len(data) % 1024 == 0
    meta = json.loads(out_bin.with_suffix(".json").read_text())
    assert meta["canvas_steps"] == [8400, 11880]
    assert gcode_out.exists() and "G1" in gcode_out.read_text()
    assert preview.exists() and cv2.imread(str(preview)) is not None

    # the orchestrated stream must equal the two-step composition it wraps
    from plotweave.frontends.gcode import gcode_to_stream
    from plotweave.frontends.svg2gcode import convert as svg_to_gcode_text
    from plotweave.stream import MotionProfile

    g = svg_to_gcode_text(svg, 210.0, 297.0, 10.0, 0.5)
    prof = MotionProfile(steps_per_mm=40.0, invert_y=True)
    data2, _ = gcode_to_stream(
        g, steps_per_mm=40.0, canvas_w=8400, canvas_h=11880, invert_y=True,
        color_index=3, reorder=True, profile=prof, speed_scale=1.0,
    )
    assert data == data2

    # decoder round-trip: clean EOF, everything on canvas
    from plotweave.stream.decoder import StreamDecoder, replay

    dec = StreamDecoder(data)
    replay(dec, 8400, 11880)
    assert dec.stats.eof_seen and dec.stats.off_canvas_steps == 0


def test_utils_analysis_stats_and_svg(tmp_path):
    """Run a tiny pipeline, then exercise the stats table + combined SVG."""
    img = np.full((80, 100, 3), 255, np.uint8)
    cv2.circle(img, (30, 40), 18, (20, 20, 20), -1)
    cv2.rectangle(img, (55, 15), (90, 60), (40, 60, 200), -1)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img)
    out = tmp_path / "out"
    out.mkdir()
    cfg_d = {
        "input_image": str(p),
        "output_dir": str(out),
        "colors": [[20, 20, 20], [40, 60, 200], [140, 180, 220], [235, 230, 225]],
        "color_names": ["layer_dark", "layer_mid", "layer_skin", "layer_light"],
        "target_width_mm": 100,
        "target_height_mm": 120,
        "pixels_per_mm": 3,
        "pen_width_px": 8,
    }
    (out / "config.json").write_text(json.dumps(cfg_d))

    from plotweave.config import load_config
    from plotweave.pipeline import run_pipeline

    cfg = load_config(str(out / "config.json"))
    run_pipeline(cfg, 1, 13)

    from plotweave.utils.analysis import export_combined_svg, main, stage_stats

    stats = stage_stats(cfg)
    assert set(stats) == set(cfg_d["color_names"])
    import pickle

    for name, per_stage in stats.items():
        n_sorted, _ = per_stage["sorted"]
        real = len(pickle.loads((out / name / "contours_sorted.pkl").read_bytes()))
        assert n_sorted == real, name

    svg_path = tmp_path / "combined.svg"
    export_combined_svg(cfg, str(svg_path))
    text = svg_path.read_text()
    for name in cfg_d["color_names"]:
        assert f'id="{name}"' in text
    n_polylines = text.count("<polyline")
    n_expected = sum(
        len([q for q in pickle.loads((out / n / "lines_cross.pkl").read_bytes()) if len(np.asarray(q).reshape(-1, 2)) >= 2])
        for n in cfg_d["color_names"]
    )
    assert n_polylines == n_expected

    # the CLI wrapper runs the table + svg export end to end
    svg2 = tmp_path / "combined2.svg"
    main([str(out), "--svg", str(svg2)])
    assert svg2.read_text() == text
