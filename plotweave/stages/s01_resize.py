"""[01] Input resize: cap the longest side at max_dimension → resized.png
(reference 01_resize.py)."""

from __future__ import annotations

import os

import numpy as np

from ..config import PipelineConfig
from ..ops import resize_if_needed
from ..utils import read_image, register_device_artifact, write_image


def run(cfg: PipelineConfig) -> None:
    import jax  # noqa: PLC0415

    cfg.ensure_output_dirs()
    img = read_image(cfg.input_image)
    out_raw, resized = resize_if_needed(img, cfg.max_dimension)
    out = np.asarray(out_raw)
    # stage 02 wants the image on device: when a resize ran, its output is
    # already resident; otherwise start the upload now (async) so the PNG
    # encode below overlaps the transfer
    out_dev = out_raw if resized else jax.device_put(out)
    h, w = img.shape[:2]
    if resized:
        print(f"Resizing: {w}x{h} -> {out.shape[1]}x{out.shape[0]}")
    else:
        print(f"No resize required: {w}x{h}")
    dst = os.path.join(cfg.output_dir, "resized.png")
    write_image(dst, out)
    register_device_artifact(dst, out_dev)
    print(f"Saved: {dst}")
