"""[02] Color-layer extraction → <layer>/mask.png + palette_by_name.json.

Default mode clusters pixels in Lab with deterministic k-means and maps
clusters to layer names by darkness; legacy swatch mode thresholds around
configured BGR swatches (reference 02_color_extract.py).  The all-pixel
assignment and mask morphology run jitted/batched on device.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..ops import morph_close, morph_open
from ..ops.colorspace import bgr_to_lab_u8, lab_u8_to_bgr
from ..ops.kmeans import kmeans
from ..ops.morphology import _morph
from ..utils import read_image, save_json, write_image
from .common import darkness_rank, layer_dir


@partial(jax.jit, static_argnames=("k", "open_iters", "close_iters"))
def _assign_and_masks(img, centers, lut, k: int, open_iters: int, close_iters: int):
    """One fused device call: Lab → nearest-center labels (original center
    order, then LUT-relabelled dark→light exactly like the reference's
    two-step argmin+relabel) → per-cluster pixel counts → morphology-cleaned
    masks.  A single host↔device round trip for the whole stage."""
    lab = bgr_to_lab_u8(img)
    flat = lab.reshape(-1, 3)
    d2 = (
        jnp.sum(flat * flat, axis=1, keepdims=True)
        - 2.0 * flat @ centers.T
        + jnp.sum(centers * centers, axis=1)
    )
    labels = lut[jnp.argmin(d2, axis=1)].reshape(img.shape[:2])
    sel = labels[None, :, :] == jnp.arange(k)[:, None, None]
    counts = sel.sum(axis=(1, 2))
    masks = sel.astype(jnp.uint8) * 255
    if open_iters > 0:
        masks = _morph(masks, "rect", 3, open_iters, "ed")
    if close_iters > 0:
        masks = _morph(masks, "rect", 3, close_iters, "de")
    return masks, counts


def _swatch_mode(cfg: PipelineConfig, img: np.ndarray) -> None:
    """Threshold ±tolerance around each swatch, trying both channel orders and
    keeping the better-covered mask (02:82-109)."""
    tol = int(cfg.color_tolerance)
    names: List[str] = list(cfg.color_names)
    colors = list(cfg.colors)
    if not colors or len(colors) < len(names):
        raise RuntimeError("swatch mode: 'colors' must have ≥ len(color_names) entries.")
    for i, name in enumerate(names):
        d = layer_dir(cfg, name)
        raw = tuple(int(v) for v in colors[i])
        for candidate in ((raw[2], raw[1], raw[0]), raw):  # RGB→BGR first, then as-is
            lo = np.maximum(np.array(candidate) - tol, 0).astype(np.uint8)
            hi = np.minimum(np.array(candidate) + tol, 255).astype(np.uint8)
            m = (np.all(img >= lo, axis=2) & np.all(img <= hi, axis=2)).astype(np.uint8) * 255
            if candidate == (raw[2], raw[1], raw[0]):
                best = m
            elif int(np.count_nonzero(m)) > int(np.count_nonzero(best)):
                best = m
        mask = np.asarray(morph_close(morph_open(best, "rect", 3, 1), "rect", 3, 1))
        write_image(os.path.join(d, "mask.png"), mask)
        print(f"Extracted (swatch): {name} | nz={int(np.count_nonzero(mask))}")
    print("Color extraction: done.")


def run(cfg: PipelineConfig) -> None:
    os.makedirs(cfg.output_dir, exist_ok=True)
    img = read_image(os.path.join(cfg.output_dir, "resized.png"))

    if cfg.extraction_mode.lower() == "swatch":
        _swatch_mode(cfg, img)
        return

    names = list(cfg.color_names)
    k = cfg.resolve_cluster_k()

    lab = np.asarray(bgr_to_lab_u8(img)).reshape(-1, 3)
    # fit centers on the seeded subsample; the all-pixel assignment, counts
    # and mask morphology happen in ONE fused device call below
    centers, _ = kmeans(
        lab,
        k,
        sample_limit=int(cfg.kmeans_sample_limit),
        attempts=int(cfg.kmeans_attempts),
        iters=int(cfg.kmeans_iters),
        seed=int(cfg.kmeans_seed),
        assign=False,
    )

    # relabel dark→light by the L channel (reference 02:120-127)
    order = np.argsort(centers[:, 0])
    lut = np.zeros_like(order)
    lut[order] = np.arange(len(order))
    masks_dev, counts_dev = _assign_and_masks(
        img,
        jnp.asarray(centers),
        jnp.asarray(lut),
        k,
        int(cfg.extract_open_iters),
        int(cfg.extract_close_iters),
    )
    masks = np.asarray(masks_dev)
    counts = [int(c) for c in np.asarray(counts_dev)]
    centers = centers[order]

    names_sorted = sorted(names, key=darkness_rank)

    palette = {}
    for cluster_idx, name in enumerate(names_sorted[:k]):
        d = layer_dir(cfg, name)
        mask = masks[cluster_idx]
        write_image(os.path.join(d, "mask.png"), mask)

        center_lab = np.clip(np.rint(centers[cluster_idx]), 0, 255).astype(np.uint8)
        bgr = tuple(int(v) for v in np.asarray(lab_u8_to_bgr(center_lab.astype(np.float32))))
        nz = int(np.count_nonzero(mask))
        palette[name] = {
            "mode": "kmeans",
            "cluster_index": int(cluster_idx),
            "cluster_lab": [int(v) for v in center_lab],
            "approx_bgr": list(bgr),
            "pixels": counts[cluster_idx],
            "mask_nonzero": nz,
        }
        print(
            f"Extracted (kmeans): {name} | cluster={cluster_idx} | "
            f"L*={centers[cluster_idx, 0]:.1f} | pixels={counts[cluster_idx]} | nz={nz}"
        )

    pal_path = os.path.join(cfg.output_dir, "palette_by_name.json")
    save_json(palette, pal_path)
    print(f"Palette saved: {pal_path}")
    print("Color extraction: done.")
