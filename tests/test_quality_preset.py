"""The shipped "quality" preset (plotweave/presets/quality.json) must run the
tour-refinement path end-to-end: valid decodable stream, and total pen-up
travel ≤ the default (greedy-only) pipeline's — the plotweave extension over
the reference's greedy ordering (12_optimize_plot_order.py:111-161)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    import cv2

    from plotweave.config import load_config
    from plotweave.pipeline import load_preset, run_pipeline

    tmp = tmp_path_factory.mktemp("quality")
    rng = np.random.default_rng(5)
    H, W = 160, 200
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :] = (235, 230, 225)
    colors = [(20, 20, 20), (40, 60, 200), (140, 180, 220), (235, 230, 225)]
    # enough scattered small shapes that the greedy tour leaves slack for
    # 2-opt to recover
    for _ in range(28):
        c = colors[int(rng.integers(0, 3))]
        x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
        cv2.circle(img, (x, y), int(rng.integers(4, 16)), c, -1)
    p_img = tmp / "img.png"
    cv2.imwrite(str(p_img), img)

    outs = {}
    for tag in ("default", "quality"):
        out = tmp / tag
        out.mkdir()
        cfg_d = {
            "input_image": str(p_img), "output_dir": str(out),
            "colors": [list(c) for c in colors],
            "color_names": ["layer_dark", "layer_mid", "layer_skin", "layer_light"],
            "target_width_mm": 100, "target_height_mm": 80, "pixels_per_mm": 2,
            "pen_width_px": 8, "pen_radius_px": 4,
        }
        if tag == "quality":
            cfg_d.update(load_preset("quality"))
        with open(out / "config.json", "w") as f:
            json.dump(cfg_d, f)
        run_pipeline(load_config(str(out / "config.json")), 1, 13)
        outs[tag] = out
    return outs


def _total_travel(outdir) -> float:
    from plotweave.utils import load_pickle
    from plotweave.vector.planner import tour_length

    manifest = json.loads((outdir / "vector_manifest.json").read_text())
    total = 0.0
    for layer in manifest["layers"]:
        ops = load_pickle(os.path.join(str(outdir), layer["file"]))
        total += tour_length(ops)
    return total


def test_quality_preset_loads():
    from plotweave.pipeline import load_preset

    p = load_preset("quality")
    assert p["plotopt_two_opt"] is True
    assert p["refine_device_min_n"] >= 1

    with pytest.raises(SystemExit, match="unknown preset"):
        load_preset("no-such-preset")


def test_quality_stream_decodes_validly(runs):
    from plotweave.stream.decoder import StreamDecoder, replay

    data = (runs["quality"] / "plot_stream.bin").read_bytes()
    assert len(data) % 1024 == 0 and len(data) > 0
    dec = StreamDecoder(data)
    res = replay(dec)
    assert len(res.polylines) + len(res.taps) > 0  # drew something
    assert dec.stats.total_bytes == len(data)


def test_quality_tour_not_longer_than_greedy(runs):
    t_default = _total_travel(runs["default"])
    t_quality = _total_travel(runs["quality"])
    assert t_quality <= t_default + 1e-6, (
        f"quality preset travel {t_quality:.0f} > greedy {t_default:.0f}"
    )
    # the refinement must actually run (stage 12 logs aside, the preset is
    # pointless if it never shortens anything on a scattered-shape input)
    assert t_quality < t_default, "2-opt/or-opt found no improvement on slack tour"


def test_quality_stream_draws_same_geometry(runs):
    """Refinement only reorders/flips pen-down ops: both streams must draw
    the same multiset of line segments (order-independent draw equality)."""
    from plotweave.utils import load_pickle

    def op_multiset(outdir):
        manifest = json.loads((outdir / "vector_manifest.json").read_text())
        sigs = []
        for layer in manifest["layers"]:
            for op in load_pickle(os.path.join(str(outdir), layer["file"])):
                if op["type"] == "tap":
                    sigs.append(("tap", layer["name"], (op["x"], op["y"])))
                else:
                    pts = np.asarray(op["points"]).reshape(-1, 2)
                    fwd = tuple(map(tuple, pts.tolist()))
                    rev = tuple(map(tuple, pts[::-1].tolist()))
                    sigs.append(("line", layer["name"], min(fwd, rev)))
        return sorted(sigs)

    assert op_multiset(runs["default"]) == op_multiset(runs["quality"])
