"""Rasterized stage previews (stages 06 / 09 / 11).

One renderer serves all three: per-layer black rendering plus a palette-
colored composite where any non-white pixel of a layer wins (reference
06_preview_scaled.py:76-137, 09_preview_intra.py:75-127, 11 similarly).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..vector.geometry import as_pts

BGR = Tuple[int, int, int]


def render_layer(
    size_wh: Tuple[int, int],
    lines: List[np.ndarray],
    color: BGR,
    thickness: int,
    antialiased: bool,
    taps: Optional[List[Tuple[int, int]]] = None,
    tap_color: Optional[BGR] = None,
    tap_radius: int = 0,
) -> np.ndarray:
    w, h = size_wh
    img = np.full((h, w, 3), 255, np.uint8)
    lt = cv2.LINE_AA if antialiased else cv2.LINE_8
    # one cv2 call for all polylines (each is still drawn independently, in
    # order — identical pixels to per-contour calls, ~100× fewer crossings)
    arrs = [
        a
        for p in lines
        if p is not None
        for a in (as_pts(p).reshape(-1, 1, 2).astype(np.int32),)
        if len(a) >= 2
    ]
    if arrs:
        cv2.polylines(img, arrs, False, color, thickness, lt)
    if taps:
        for x, y in taps:
            cv2.circle(img, (int(x), int(y)), int(tap_radius), tap_color or color, -1, cv2.LINE_AA)
    return img


def overlay_nonwhite(composite: np.ndarray, layer_img: np.ndarray) -> None:
    """composite[p] = layer_img[p] wherever layer_img[p] != (255,255,255)."""
    white = cv2.inRange(layer_img, (255, 255, 255), (255, 255, 255))
    cv2.copyTo(layer_img, cv2.bitwise_not(white), composite)


def render_stage_previews(
    out_dir: str,
    size_wh: Tuple[int, int],
    layers: List[Tuple[str, List[np.ndarray], Optional[List[Tuple[int, int]]]]],
    palette: Dict[str, BGR],
    per_layer_name: str,
    composite_name: str,
    thickness: int,
    antialiased: bool,
    tap_radius: int = 0,
    tap_color_black_pass: BGR = (0, 0, 255),
) -> str:
    """Write <layer>/<per_layer_name> + <out_dir>/<composite_name>.

    Layers render concurrently (cv2 releases the GIL; each layer's render and
    PNG write are independent), then composite overlays apply in layer order —
    output bytes are identical to the sequential loop.
    """
    from ..utils import thread_map  # noqa: PLC0415

    composite = np.full((size_wh[1], size_wh[0], 3), 255, np.uint8)

    def one(layer):
        name, lines, taps = layer
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        black = render_layer(
            size_wh, lines, (0, 0, 0), thickness, antialiased,
            taps=taps, tap_color=tap_color_black_pass, tap_radius=tap_radius,
        )
        cv2.imwrite(os.path.join(d, per_layer_name), black)
        col = palette.get(name, (0, 0, 0))
        return render_layer(
            size_wh, lines, col, thickness, antialiased,
            taps=taps, tap_color=col, tap_radius=tap_radius,
        )

    colored_layers = thread_map(one, layers)
    for (name, lines, taps), colored in zip(layers, colored_layers):
        overlay_nonwhite(composite, colored)
        print(f"[preview] {name}: lines={len(lines)}, taps={len(taps or [])}")
    out = os.path.join(out_dir, composite_name)
    cv2.imwrite(out, composite)
    print(f"[preview] composite saved: {out}")
    return out
