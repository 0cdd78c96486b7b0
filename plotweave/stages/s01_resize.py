"""[01] Input resize: cap the longest side at max_dimension → resized.png
(reference 01_resize.py)."""

from __future__ import annotations

import os

import numpy as np

from ..config import PipelineConfig
from ..ops import resize_if_needed
from ..utils import read_image, write_image


def run(cfg: PipelineConfig) -> None:
    cfg.ensure_output_dirs()
    img = read_image(cfg.input_image)
    out, resized = resize_if_needed(img, cfg.max_dimension)
    out = np.asarray(out)
    h, w = img.shape[:2]
    if resized:
        print(f"Resizing: {w}x{h} -> {out.shape[1]}x{out.shape[0]}")
    else:
        print(f"No resize required: {w}x{h}")
    dst = os.path.join(cfg.output_dir, "resized.png")
    write_image(dst, out)
    print(f"Saved: {dst}")
