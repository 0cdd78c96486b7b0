"""[03] Edge detection → <layer>/edges.png + edges_composite.png.

Per layer: ellipse-kernel open/close, Gaussian blur, Canny (reference
03_edge_detect.py:13-40).  Where the reference forks a process pool across
layers, the whole chain here is one jitted, layer-batched (vmap) device
program — the TPU-native replacement for its only multiprocessing.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import numpy as np

from ..config import PipelineConfig
from ..ops.canny import canny
from ..ops.filters import gaussian_blur_u8
from ..ops.morphology import _morph
from ..utils import read_image, write_image
from .common import layer_dir, palette_bgr


def _ensure_odd(n: int) -> int:
    n = max(3, int(n))
    return n if n % 2 == 1 else n + 1


@partial(jax.jit, static_argnames=("mk", "oi", "ci", "bk", "lo", "hi"))
def _edges_batched(masks, mk: int, oi: int, ci: int, bk: int, lo: int, hi: int):
    """(L, H, W) masks → (L, H, W) edges; the ops are natively layer-batched."""
    m = masks
    if oi > 0:
        m = _morph(m, "ellipse", mk, oi, "ed")
    if ci > 0:
        m = _morph(m, "ellipse", mk, ci, "de")
    return canny(gaussian_blur_u8(m, bk), lo, hi)


def run(cfg: PipelineConfig) -> None:
    names = list(cfg.color_names)
    masks = []
    for name in names:
        p = os.path.join(cfg.output_dir, name, "mask.png")
        if not os.path.exists(p):
            raise FileNotFoundError(f"Mask not found: {p}")
        masks.append(read_image(p, gray=True))
    batch = np.stack(masks, axis=0)

    edges = np.asarray(
        _edges_batched(
            batch,
            max(1, int(cfg.edge_morph_kernel)),
            int(cfg.edge_morph_open_iters),
            int(cfg.edge_morph_close_iters),
            _ensure_odd(cfg.edge_kernel_size),
            int(cfg.edge_low_threshold),
            int(cfg.edge_high_threshold),
        )
    )

    for name, e in zip(names, edges):
        out = os.path.join(layer_dir(cfg, name), "edges.png")
        write_image(out, e)
        print(f"Edges extracted: {name} | nz={int(np.count_nonzero(e))}")

    _composite(cfg, names)


def _composite(cfg: PipelineConfig, names) -> None:
    """Overlay per-layer edges in layer colors on white (03:60-111).

    Keeps the reference's palette quirk: it looks up key "bgr", which the
    stage-02 palette never writes, so colors always fall back to cfg.colors.
    """
    try:
        base = read_image(os.path.join(cfg.output_dir, "resized.png"))
        h, w = base.shape[:2]
    except FileNotFoundError:
        h = w = None
        for name in names:
            p = os.path.join(cfg.output_dir, name, "edges.png")
            if os.path.exists(p):
                e = read_image(p, gray=True)
                h, w = e.shape[:2]
                break
        if h is None:
            raise FileNotFoundError("No edges found to build edges_composite.png")
    canvas = np.full((h, w, 3), 255, np.uint8)
    colors = palette_bgr(cfg, key="bgr")
    for name in names:
        p = os.path.join(cfg.output_dir, name, "edges.png")
        if not os.path.exists(p):
            continue
        e = read_image(p, gray=True)
        m = e > 0
        if m.any():
            canvas[m] = colors[name]
    out = os.path.join(cfg.output_dir, "edges_composite.png")
    write_image(out, canvas)
    print(f"Edges composite saved: {out}")
