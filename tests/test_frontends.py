"""Front-end tests: G-code → stream byte-equality vs committed
reference-generated goldens, SVG chain round-trips, demo generator, tools."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from plotweave.frontends.gcode import gcode_to_stream, parse_polylines_mm
from plotweave.frontends.svg import fit_to_page, parse_path_data, svg_to_polylines
from plotweave.stream import MotionProfile
from plotweave.stream.decoder import StreamDecoder, replay

GOLDEN = Path(__file__).parent / "golden" / "gcode"


def _profile_28():
    # the reference gcode2stream CLI defaults (div_start 28, corner 28/300)
    return MotionProfile()


def test_gcode2stream_byte_equality_speed_scaled():
    text = (GOLDEN / "sample.gcode").read_text()
    data, _ = gcode_to_stream(
        text, invert_y=True, profile=MotionProfile(invert_y=True), speed_scale=1.3
    )
    assert data == (GOLDEN / "ref_g.bin").read_bytes()


def test_gcode2stream_byte_equality_no_reorder():
    text = (GOLDEN / "sample.gcode").read_text()
    data, _ = gcode_to_stream(text, reorder=False, profile=_profile_28())
    assert data == (GOLDEN / "ref_g2.bin").read_bytes()


def test_gcode_parser_features():
    text = (GOLDEN / "sample.gcode").read_text()
    paths, moves = parse_polylines_mm(text)
    # square (abs), triangle legs (rel), Z-inferred diagonal, inch segment
    assert len(paths) == 4
    assert moves == 4 + 3 + 2 + 1
    # inches converted: X7 → 177.8 mm
    assert abs(paths[-1][0][0] - 177.8) < 1e-9


def test_svg_path_grammar():
    # closed triangle: Z returns to start
    tri = parse_path_data("M 0 0 L 10 0 L 10 10 Z")[0]
    assert (tri[0] == tri[-1]).all()
    # smooth cubic continuity: S reflects the previous control point
    two = parse_path_data("M0,0 C 0,10 10,10 10,0 S 20,-10 20,0")
    assert len(two) == 1 and len(two[0]) > 10
    # relative quads with T
    q = parse_path_data("m 0 0 q 5 -5 10 0 t 10 0")[0]
    assert abs(q[-1][0] - 20) < 1e-9 and abs(q[-1][1]) < 1e-6
    # arcs land on their endpoint
    a = parse_path_data("M 0 0 A 10 10 0 0 1 20 0")[0]
    assert np.allclose(a[-1], [20, 0], atol=1e-6)


def test_svg_transforms_and_fit():
    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg">'
        '<g transform="translate(5,5) scale(2)"><rect x="0" y="0" width="10" height="10"/></g>'
        "</svg>"
    )
    polys = svg_to_polylines(svg)
    assert len(polys) == 1
    assert np.allclose(polys[0].min(axis=0), [5, 5])
    assert np.allclose(polys[0].max(axis=0), [25, 25])
    fitted = fit_to_page(polys, 210, 297, 10)
    allpts = np.concatenate(fitted)
    assert np.allclose(allpts.min(axis=0), [10, 10])
    assert allpts.max() <= 297 - 10 + 1e-6


def test_svg_to_stream_chain(tmp_path):
    from plotweave.frontends.svg2gcode import convert

    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 100 100">'
        '<circle cx="50" cy="50" r="30"/><path d="M10,10 C 30,0 70,0 90,10"/></svg>'
    )
    gcode = convert(svg)
    data, info = gcode_to_stream(gcode, invert_y=True)
    dec = StreamDecoder(data)
    res = replay(dec, *info["canvas_steps"])
    assert dec.stats.eof_seen
    assert dec.stats.off_canvas_steps == 0
    assert len(res.polylines) == info["polylines_steps"] == 2


def test_demo_generator(tmp_path):
    from plotweave.demo.generator import generate_demo

    data = generate_demo(str(tmp_path / "demo.bin"))
    dec = StreamDecoder(data)
    res = replay(dec, 8400, 11880)
    assert dec.stats.eof_seen
    assert dec.stats.taps == 63  # 9×7 tap matrix
    assert dec.stats.off_canvas_steps == 0
    assert len(res.polylines) > 100
    assert json.loads((tmp_path / "demo.json").read_text())["bytes"] == len(data)


def test_manifest_creator(tmp_path):
    import pickle

    from plotweave.stream.manifest_creator import build

    for i, name in enumerate(["a", "b"]):
        (tmp_path / f"layer_{name}.pkl").write_bytes(
            pickle.dumps(
                {
                    "color_name": name,
                    "color_idx": 1 - i,
                    "contours": [{"points": np.array([[100, 100], [500, 400]], np.int32)}],
                    "taps": [{"x": 600 + i, "y": 700}],
                }
            )
        )
    (tmp_path / "manifest.json").write_text(
        json.dumps(
            {
                "image_size": [8400, 11880],
                "layers": [
                    {"file": f"layer_{n}.pkl", "color_name": n, "color_index": i}
                    for i, n in enumerate(["a", "b"])
                ],
            }
        )
    )
    data = build(tmp_path / "manifest.json", tmp_path / "s.bin", 8400, 11880, MotionProfile())
    dec = StreamDecoder(data)
    res = replay(dec, 8400, 11880)
    # layers sorted by color_idx: 'b'(0) before 'a'(1); initial speed byte set
    assert res.colors == [0, 1]
    assert data[1] == 0x40 | 28
    assert dec.stats.taps == 2


def test_tools_palette_and_analysis():
    from plotweave.tools.palette import MarkerPalette

    pal = MarkerPalette()
    m, d = pal.nearest((250, 10, 10))
    assert m.name in ("red", "dark red")
    recs = pal.recommend(
        np.array([[250, 10, 10], [240, 20, 20], [10, 10, 200]]),
        np.array([0.5, 0.3, 0.2]),
        n=3,
    )
    names = [m.name for m, _ in recs]
    assert len(names) == len(set(names))  # dedup suppressed the near-duplicate red
