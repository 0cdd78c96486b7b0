"""[01] Input resize: cap the longest side at max_dimension → resized.png
(reference 01_resize.py)."""

from __future__ import annotations

import os

from ..config import PipelineConfig
from ..utils import read_image, register_device_artifact, write_image


def run(cfg: PipelineConfig) -> None:
    import cv2  # noqa: PLC0415
    import jax  # noqa: PLC0415

    cfg.ensure_output_dirs()
    img = read_image(cfg.input_image)
    h, w = img.shape[:2]
    m = max(h, w)
    # Resize on HOST and upload only the result: the host→device link is
    # upload-fast but download-slow (and its bandwidth varies wildly), so a
    # device-side resize pays a full-resolution upload AND a resized download
    # (for the PNG) — ~30x the traffic of uploading the small result once.
    # cv2.resize IS the byte-exactness contract (reference 01_resize.py:20);
    # ops.area_resize replicates it bit-exactly for device-resident callers
    # (fused chain, spatial sharding) and is fuzz-pinned against it.
    if m > cfg.max_dimension:
        scale = cfg.max_dimension / m
        out = cv2.resize(
            img, (int(w * scale), int(h * scale)), interpolation=cv2.INTER_AREA
        )
        print(f"Resizing: {w}x{h} -> {out.shape[1]}x{out.shape[0]}")
    else:
        out = img
        print(f"No resize required: {w}x{h}")
    dst = os.path.join(cfg.output_dir, "resized.png")
    # only the kmeans_init="device" mode consumes the image device-resident
    # (s02 fetches it); the default host-exact mode reads host pixels and
    # uploads bit-packed masks itself — skip the upload then (the tunnel is
    # the scarce resource).  The float k-means runs on the default backend
    # regardless of raster_device (see utils/devices.py), so upload there.
    if str(getattr(cfg, "kmeans_init", "host-exact")).lower() == "device":
        out_dev = jax.device_put(out)  # async; overlaps the PNG encode below
        write_image(dst, out)
        register_device_artifact(dst, out_dev)
    else:
        write_image(dst, out)
    print(f"Saved: {dst}")
