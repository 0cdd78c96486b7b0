"""Regenerate the committed e2e goldens by running the REFERENCE pipeline
(/root/reference, read-only oracle) on the committed test images/configs.

Usage:
    python tests/tools/gen_e2e_goldens.py            # all configs
    python tests/tools/gen_e2e_goldens.py cfg3_8layers.json

For each (cfg, tarball) pair in CONFIGS this writes the config's
``input_image`` (synthesizing it if it is one of the generated test images),
runs reference steps 1–13 via ``pipeline.py`` in a temp dir, and tars the
entire artifact directory into tests/golden/e2e/<tarball>.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tarfile
import tempfile
from pathlib import Path

import cv2
import numpy as np

GOLDEN = Path(__file__).resolve().parent.parent / "golden" / "e2e"
REFERENCE = Path("/root/reference/image_processor/pipeline.py")

CONFIGS = [
    ("base_cfg.json", "ref_artifacts.tar.gz"),
    ("base_cfg2.json", "ref_artifacts2.tar.gz"),
    ("cfg3_8layers.json", "ref_artifacts3.tar.gz"),
    ("cfg4_gray1layer.json", "ref_artifacts4.tar.gz"),
]

# 8 well-separated BGR colors (separability ⇒ both k-means implementations
# converge to the identical Voronoi assignment despite different RNGs)
COLORS8 = [
    (20, 20, 20),     # near-black          → layer_dark
    (60, 40, 100),    # maroon              → deep_dark
    (40, 60, 200),    # red                 → mid_red
    (60, 170, 60),    # green               → mid_green
    (190, 120, 50),   # blue-ish            → accent (no rank keyword)
    (140, 180, 220),  # skin tone           → layer_skin
    (90, 210, 230),   # yellow              → light_yellow
    (235, 230, 225),  # near-white          → layer_light
]


def build_testimg8(path: Path) -> None:
    """Deterministic 8-color composition, 512×384 (≤200k px so the k-means
    sample is the full image on both sides), AA-free solid shapes."""
    rng = np.random.default_rng(5)
    H, W = 384, 512
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :] = COLORS8[-1]
    for i, c in enumerate(COLORS8[:-1]):
        for _ in range(6):
            x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
            r = int(rng.integers(14, 60))
            if (i + int(rng.integers(0, 2))) % 2 == 0:
                cv2.circle(img, (x, y), r, c, -1)
            else:
                cv2.rectangle(img, (x, y), (x + r, y + int(r * 0.8)), c, -1)
    cv2.imwrite(str(path), img)


def build_testimg_gray(path: Path) -> None:
    """512×512 grayscale two-tone composition (BASELINE config 1: single
    layer; the reference still clusters with K = max(2, len(names)) = 2 and
    maps only the darkest cluster to the one configured name)."""
    rng = np.random.default_rng(6)
    img = np.full((512, 512, 3), 235, np.uint8)
    for _ in range(24):
        x, y = int(rng.integers(0, 512)), int(rng.integers(0, 512))
        r = int(rng.integers(10, 80))
        if rng.random() < 0.5:
            cv2.circle(img, (x, y), r, (40, 40, 40), 2)
        else:
            cv2.line(img, (x, y), (x + r, y + int(rng.integers(-r, r + 1))), (40, 40, 40), 3)
    cv2.imwrite(str(path), img)


def run_reference(cfg_path: Path, tar_path: Path) -> None:
    cfg = json.loads(cfg_path.read_text())
    img_name = cfg["input_image"]
    img_path = GOLDEN / img_name
    if img_name == "testimg8.png" and not img_path.exists():
        build_testimg8(img_path)
    if img_name == "testimg_gray.png" and not img_path.exists():
        build_testimg_gray(img_path)
    if not img_path.exists():
        raise FileNotFoundError(img_path)

    with tempfile.TemporaryDirectory(prefix="pw_gold_") as td:
        out = Path(td) / "out"
        out.mkdir()
        cfg = dict(cfg)
        cfg["input_image"] = str(img_path)
        cfg["output_dir"] = str(out)
        (out / "config.json").write_text(json.dumps(cfg, indent=1))
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        subprocess.run(
            [sys.executable, str(REFERENCE), str(img_path), "--output", str(out), "--end-step", "13"],
            check=True,
            env=env,
            cwd=str(REFERENCE.parent),
        )
        with tarfile.open(tar_path, "w:gz") as tf:
            tf.add(out, arcname=".")
    print(f"wrote {tar_path}")


def main() -> None:
    only = set(sys.argv[1:])
    for cfg_name, tar_name in CONFIGS:
        if only and cfg_name not in only:
            continue
        run_reference(GOLDEN / cfg_name, GOLDEN / tar_name)


if __name__ == "__main__":
    main()
