"""Stream simulator: decode + replay a plotter stream, render to an image or
drive an interactive pygame playback (reference
shared/omnirevolve_plotter_stream_previewer.py).

The decoder statistics (EOF, tail-after-EOF, off-canvas steps, final
position, byte/step/service totals) are the protocol's invariant counters —
printable via --stats and used as the executable spec in tests.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional, Tuple

import numpy as np

from ..stream.decoder import StreamDecoder, replay

BGR = Tuple[int, int, int]
DEFAULT_PALETTE: List[BGR] = [(0, 0, 255), (0, 255, 0), (255, 0, 0), (0, 0, 0)]  # R,G,B,K in BGR
TAP_DIAM_PX = 10


def parse_color(spec: str) -> Tuple[int, int, int]:
    """'r'/'red'/'#rrggbb'/'r,g,b' → RGB tuple."""
    s = spec.strip().lower()
    named = {
        "r": (255, 0, 0), "red": (255, 0, 0),
        "g": (0, 255, 0), "green": (0, 255, 0),
        "b": (0, 0, 255), "blue": (0, 0, 255),
        "k": (0, 0, 0), "black": (0, 0, 0),
        "w": (255, 255, 255), "white": (255, 255, 255),
        "y": (255, 255, 0), "yellow": (255, 255, 0),
        "c": (0, 255, 255), "cyan": (0, 255, 255),
        "m": (255, 0, 255), "magenta": (255, 0, 255),
    }
    if s in named:
        return named[s]
    if s.startswith("#") and len(s) == 7:
        return (int(s[1:3], 16), int(s[3:5], 16), int(s[5:7], 16))
    if "," in s:
        r, g, b = (max(0, min(255, int(p))) for p in s.split(","))
        return (r, g, b)
    raise ValueError(f"Bad color spec: {spec}")


def render_stream(
    data: bytes,
    canvas_w: int,
    canvas_h: int,
    render_w: int = 1200,
    render_h: int = 900,
    invert_y: bool = True,
    palette: Optional[List[BGR]] = None,
    render_taps: bool = True,
    white_bg: bool = True,
) -> Tuple[np.ndarray, StreamDecoder]:
    """Headless render: replay the stream onto a BGR image."""
    import cv2  # noqa: PLC0415

    palette = palette or DEFAULT_PALETTE
    dec = StreamDecoder(data)
    res = replay(dec, canvas_w, canvas_h)

    scale = min(render_w / max(1, canvas_w), render_h / max(1, canvas_h))
    used_w, used_h = int(canvas_w * scale), int(canvas_h * scale)
    ox, oy = (render_w - used_w) // 2, (render_h - used_h) // 2
    img = np.full((render_h, render_w, 3), 255 if white_bg else 0, np.uint8)

    def to_px(x: int, y: int) -> Tuple[int, int]:
        px = int(ox + x * scale)
        py = int(oy + (canvas_h - 1 - y) * scale) if invert_y else int(oy + y * scale)
        return px, py

    for poly, cidx in zip(res.polylines, res.colors):
        color = palette[min(cidx, len(palette) - 1)]
        pts = np.array([to_px(int(x), int(y)) for x, y in poly], np.int32).reshape(-1, 1, 2)
        cv2.polylines(img, [pts], False, color, 1, cv2.LINE_8)
    if render_taps:
        for (x, y), cidx in zip(res.taps, res.tap_colors):
            color = palette[min(cidx, len(palette) - 1)]
            cv2.circle(img, to_px(int(x), int(y)), max(1, TAP_DIAM_PX // 2), color, -1)
    cv2.rectangle(img, (ox, oy), (ox + used_w - 1, oy + used_h - 1), (30, 30, 30), 1)
    return img, dec


def print_stats(dec: StreamDecoder, file=sys.stderr) -> None:
    s = dec.stats
    print("=== Stream statistics ===", file=file)
    print(f"bytes={s.total_bytes} step_bytes={s.step_bytes} service_bytes={s.service_bytes}", file=file)
    print(f"steps={s.steps_total} singles={s.single_steps} doubles={s.double_steps}", file=file)
    print(f"pen_down_segments={s.pen_down_segments} taps={s.taps}", file=file)
    print(f"color_changes={s.color_changes} speed_changes={s.speed_changes}", file=file)
    print(f"off_canvas_steps={s.off_canvas_steps} eof={s.eof_seen} tail_after_eof={s.tail_after_eof}", file=file)
    print(f"final=({s.final_x}, {s.final_y})", file=file)


def run_interactive(data: bytes, canvas_w: int, canvas_h: int, invert_y: bool, palette: List[BGR]) -> None:
    """Minimal pygame playback: SPACE play/pause, RIGHT step ×500, R reset,
    ESC quit.  Replays the decoded command list onto a surface."""
    import pygame  # noqa: PLC0415

    from ..stream.decoder import COLOR, PEN, STEP  # noqa: PLC0415
    from ..stream.protocol import DIR_VECTORS, B_PEN_DOWN, B_PEN_UP, B_TAP  # noqa: PLC0415

    dec = StreamDecoder(data)
    pygame.init()
    W, Hpx = 1200, 900
    screen = pygame.display.set_mode((W, Hpx))
    pygame.display.set_caption("plotweave stream preview")
    scale = min(W / canvas_w, Hpx / canvas_h)

    def to_px(x, y):
        return int(x * scale), int((canvas_h - 1 - y) * scale) if invert_y else int(y * scale)

    surf = pygame.Surface((W, Hpx))
    surf.fill((255, 255, 255))
    x = y = 0
    pen = False
    color = palette[0]
    i = 0
    playing = False
    clock = pygame.time.Clock()

    def step_once():
        nonlocal x, y, pen, color, i
        kind, v = dec.commands[i]
        if kind == STEP:
            dx, dy = int(DIR_VECTORS[v][0]), int(DIR_VECTORS[v][1])
            nx, ny = x + dx, y + dy
            if pen:
                pygame.draw.line(surf, color, to_px(x, y), to_px(nx, ny), 1)
            x, y = nx, ny
        elif kind == PEN:
            if v == B_PEN_DOWN:
                pen = True
            elif v == B_PEN_UP:
                pen = False
            elif v == B_TAP:
                pygame.draw.circle(surf, color, to_px(x, y), 5)
                pen = False
        elif kind == COLOR:
            color = palette[min(v, len(palette) - 1)]
        i += 1

    running = True
    while running:
        for e in pygame.event.get():
            if e.type == pygame.QUIT:
                running = False
            elif e.type == pygame.KEYDOWN:
                if e.key == pygame.K_ESCAPE:
                    running = False
                elif e.key == pygame.K_SPACE:
                    playing = not playing
                elif e.key == pygame.K_RIGHT:
                    for _ in range(500):
                        if i < len(dec.commands):
                            step_once()
                elif e.key == pygame.K_r:
                    surf.fill((255, 255, 255))
                    x = y = 0
                    pen = False
                    i = 0
        if playing:
            for _ in range(5000):
                if i >= len(dec.commands):
                    playing = False
                    break
                step_once()
        screen.blit(surf, (0, 0))
        pygame.display.flip()
        clock.tick(60)
    pygame.quit()
    print_stats(dec)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="plotweave stream simulator")
    ap.add_argument("input")
    ap.add_argument("-o", "--output", help="render PNG headlessly instead of interactive playback")
    ap.add_argument("--canvas-w-steps", type=int, default=13210)
    ap.add_argument("--canvas-h-steps", type=int, default=13019)
    ap.add_argument("--invert-y", type=int, choices=[0, 1], default=1)
    ap.add_argument("--render-width", type=int, default=1200)
    ap.add_argument("--render-height", type=int, default=900)
    ap.add_argument("--render-taps", type=int, choices=[0, 1], default=1)
    ap.add_argument("--background-white", type=int, choices=[0, 1], default=1)
    ap.add_argument("--tick-freq", type=int, default=10000)
    ap.add_argument("--c0", default="R")
    ap.add_argument("--c1", default="G")
    ap.add_argument("--c2", default="B")
    ap.add_argument("--c3", default="K")
    args = ap.parse_args(argv)

    rgb = [parse_color(args.c0), parse_color(args.c1), parse_color(args.c2), parse_color(args.c3)]
    data = open(args.input, "rb").read()

    if args.output:
        bgr = [(b, g, r) for (r, g, b) in rgb]
        img, dec = render_stream(
            data,
            args.canvas_w_steps,
            args.canvas_h_steps,
            args.render_width,
            args.render_height,
            bool(args.invert_y),
            bgr,
            bool(args.render_taps),
            bool(args.background_white),
        )
        import cv2  # noqa: PLC0415

        cv2.imwrite(args.output, img)
        print(f"Image saved: {args.output}")
        print_stats(dec)
    else:
        run_interactive(data, args.canvas_w_steps, args.canvas_h_steps, bool(args.invert_y), rgb)


if __name__ == "__main__":
    main()
