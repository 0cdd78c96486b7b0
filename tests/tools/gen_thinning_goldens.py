#!/usr/bin/env python3
"""Golden skeletons from the reference thinners (run as oracle, not vendored).

Writes tests/golden/thinning_cases.npz with inputs + expected outputs for
both reference variants (stage 04's rotated-ring thinner and stage 08's
standard-ring fallback thinner).
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, "/root/reference/image_processor")


def _load(name: str, fname: str):
    spec = importlib.util.spec_from_file_location(name, f"/root/reference/image_processor/{fname}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ref04 = _load("ref04", "04_find_contours.py")
    ref08 = _load("ref08", "08_dedup_layer_basic.py")
    rng = np.random.default_rng(123)
    arrays = {}
    for t in range(4):
        h, w = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        m = (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
        m = cv2.GaussianBlur(m, (5, 5), 0)
        edges = cv2.Canny(m, 22, 70)
        with contextlib.redirect_stdout(io.StringIO()):
            s04 = ref04.thinning_zhangsuen(edges.copy(), layer="t")
        s08 = ref08._zhang_suen_fast(edges.copy())
        arrays[f"edges_{t}"] = edges
        arrays[f"skel04_{t}"] = (s04 > 0).astype(np.uint8)
        arrays[f"skel08_{t}"] = (s08 > 0).astype(np.uint8)
        print(t, edges.shape, int((edges > 0).sum()))
    out = Path(__file__).resolve().parent.parent / "golden" / "thinning_cases.npz"
    np.savez_compressed(out, **arrays)
    print("saved", out)


if __name__ == "__main__":
    main()
