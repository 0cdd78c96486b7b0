"""End-to-end pipeline test against committed reference-run artifacts.

The golden tarball holds a full reference-pipeline run (steps 1–13) on the
committed synthetic test image.  This test runs the plotweave pipeline on the
same image/config and compares EVERY stage artifact — masks, edges, all six
pickle stages, the manifest — and finally requires plot_stream.bin to be
byte-identical (the SURVEY §6 headline metric).

Byte-equality holds on arbitrary inputs (photo-class included) since the
cv2-exact k-means replication (ops/cvkmeans.py); the photo-input cases live
in test_e2e_fuzz_live.py against the live reference.
"""

from __future__ import annotations

import json
import os
import pickle
import tarfile
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "e2e"


# two reference-run configurations: the default-ish one and a variant with
# asymmetric margins, a color-by-order remap, tighter dedup parameters and
# different Canny settings (only reference-HONORED keys — see SURVEY §2.1)
CONFIGS = [
    ("base_cfg.json", "ref_artifacts.tar.gz"),
    ("base_cfg2.json", "ref_artifacts2.tar.gz"),
    # 8 layers: darkness-rank ties (stable sort), the step-12 color-index
    # fallback branch, an out-of-range stream_color_by_name entry (&7), and
    # heavier cross-layer dedup (regenerate: tests/tools/gen_e2e_goldens.py)
    ("cfg3_8layers.json", "ref_artifacts3.tar.gz"),
    # 512×512 grayscale, single configured layer (BASELINE config 1): the
    # reference clusters with K = max(2, len(names)) = 2 and emits only the
    # darkest cluster
    ("cfg4_gray1layer.json", "ref_artifacts4.tar.gz"),
]


@pytest.fixture(scope="module", params=CONFIGS, ids=["default", "variant", "8layers", "gray1layer"])
def runs(request, tmp_path_factory):
    cfg_name, tar_name = request.param
    base = tmp_path_factory.mktemp("e2e")
    ref_dir = base / "ref"
    ref_dir.mkdir()
    with tarfile.open(GOLDEN / tar_name) as tf:
        tf.extractall(ref_dir, filter="data")

    mine_dir = base / "mine"
    mine_dir.mkdir()
    cfg_dict = json.loads((GOLDEN / cfg_name).read_text())
    cfg_dict["input_image"] = str(GOLDEN / Path(cfg_dict["input_image"]).name)
    cfg_dict["output_dir"] = str(mine_dir)
    (mine_dir / "config.json").write_text(json.dumps(cfg_dict))

    from plotweave.config import load_config
    from plotweave.pipeline import run_pipeline

    cfg = load_config(str(mine_dir / "config.json"))
    run_pipeline(cfg, 1, 13)
    return ref_dir, mine_dir, list(cfg_dict["color_names"])



def _cmp_pkl(a: Path, b: Path) -> None:
    A = pickle.loads(a.read_bytes())
    B = pickle.loads(b.read_bytes())
    assert len(A) == len(B), f"{a.name}: {len(A)} vs {len(B)} items"
    for i, (x, y) in enumerate(zip(A, B)):
        if isinstance(x, dict):  # ops
            assert x["type"] == y["type"], f"{a.name}[{i}] type"
            if x["type"] == "line":
                assert np.array_equal(x["points"], y["points"]), f"{a.name}[{i}] points"
            else:
                assert (x["x"], x["y"]) == (y["x"], y["y"]), f"{a.name}[{i}] tap"
        else:
            assert np.array_equal(np.asarray(x), np.asarray(y)), f"{a.name}[{i}]"


@pytest.mark.parametrize("fname", ["mask.png", "edges.png"])
def test_raster_artifacts_identical(runs, fname):
    import cv2

    ref, mine, layers = runs
    for layer in layers:
        a = cv2.imread(str(ref / layer / fname), cv2.IMREAD_GRAYSCALE)
        b = cv2.imread(str(mine / layer / fname), cv2.IMREAD_GRAYSCALE)
        assert a is not None and b is not None
        assert (a == b).all(), f"{layer}/{fname}"


@pytest.mark.parametrize(
    "fname",
    [
        "contours.pkl",
        "contours_scaled.pkl",
        "contours_sorted.pkl",
        "lines_intra.pkl",
        "taps_intra.pkl",
        "lines_cross.pkl",
        "taps_cross.pkl",
        "ops.pkl",
    ],
)
def test_vector_artifacts_identical(runs, fname):
    ref, mine, layers = runs
    for layer in layers:
        _cmp_pkl(ref / layer / fname, mine / layer / fname)


def test_manifest_identical(runs):
    ref, mine, _layers = runs
    assert json.loads((ref / "vector_manifest.json").read_text()) == json.loads(
        (mine / "vector_manifest.json").read_text()
    )


def test_stream_byte_identical(runs):
    ref, mine, _layers = runs
    a = (ref / "plot_stream.bin").read_bytes()
    b = (mine / "plot_stream.bin").read_bytes()
    assert a == b, (
        f"stream differs: lens {len(a)}/{len(b)}, first diff at "
        f"{next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), 'len')}"
    )


def test_stream_decodes_cleanly(runs):
    from plotweave.stream.decoder import StreamDecoder, replay

    _, mine, _layers = runs
    dec = StreamDecoder((mine / "plot_stream.bin").read_bytes())
    man = json.loads((mine / "vector_manifest.json").read_text())
    W, H = man["image_size"]
    replay(dec, W, H)
    assert dec.stats.eof_seen
    assert dec.stats.off_canvas_steps == 0


@pytest.mark.parametrize("fname", ["scaled_preview.png", "preview_intra.png", "preview_cross.png"])
def test_per_layer_previews_identical(runs, fname):
    """Per-layer previews render in black with the same cv2 calls → bytes."""
    import cv2

    ref, mine, layers = runs
    for layer in layers:
        a = cv2.imread(str(ref / layer / fname))
        b = cv2.imread(str(mine / layer / fname))
        assert a is not None and b is not None
        assert (a == b).all(), f"{layer}/{fname}"


def test_edges_composite_identical(runs):
    import cv2

    ref, mine, _layers = runs
    a = cv2.imread(str(ref / "edges_composite.png"))
    b = cv2.imread(str(mine / "edges_composite.png"))
    assert (a == b).all()


@pytest.mark.parametrize(
    "fname",
    ["scaled_preview_composite.png", "preview_intra_composite.png", "preview_cross_composite.png"],
)
def test_composites_identical(runs, fname):
    """Composites use palette approx_bgr — exact since the cv2-exact k-means
    + fixed-point Lab path (ops/cvkmeans.py), so bytes must match."""
    import cv2

    ref, mine, _layers = runs
    a = cv2.imread(str(ref / fname))
    b = cv2.imread(str(mine / fname))
    assert a is not None and b is not None and a.shape == b.shape
    assert (a == b).all(), f"{fname}: {(a != b).any(axis=2).mean():.4f} of pixels differ"


def test_palette_identical(runs):
    """palette_by_name.json must match exactly: cluster Lab ints (truncation
    semantics), approx_bgr (cv2 Lab2BGR on the truncated uint8 center),
    pixel counts and mask nonzeros (02:156-173)."""
    ref, mine, _layers = runs
    a = json.loads((ref / "palette_by_name.json").read_text())
    b = json.loads((mine / "palette_by_name.json").read_text())
    assert a == b
