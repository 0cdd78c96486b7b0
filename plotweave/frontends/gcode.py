"""G-code front-end: parse a plotter G-code subset and emit streams.

Dialect (reference svg_to_stream/gcode2stream.py:201-299): G0/G1 implicit
moves via bare X/Y words, G90/G91 absolute/relative, G20/G21 units,
M3/M4 = pen down, M5 = pen up, and Z ≤ 0 infers pen-down when no M-code is
present on the line.  Comments: ``;`` to end of line and non-nested ``(...)``.

The mm→step mapping applies mm-space scale/offset, then steps/mm, an
optional Y flip around the canvas, rounding and clamping; consecutive
duplicate step points are dropped (gcode2stream.py:79-110,317-339).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..stream import MotionProfile
from ..stream.emitter import StreamEmitter

INCH_TO_MM = 25.4
A4_W_MM = 210.0
A4_H_MM = 297.0
DEFAULT_STEPS_PER_MM = 40.0

Point = Tuple[int, int]
PointMM = Tuple[float, float]


def strip_comment(line: str) -> str:
    if ";" in line:
        line = line.split(";", 1)[0]
    out = []
    depth = False
    for ch in line:
        if ch == "(":
            depth = True
        elif ch == ")":
            depth = False
        elif not depth:
            out.append(ch)
    return "".join(out).strip()


@dataclass
class _State:
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    absolute: bool = True
    mm_units: bool = True
    pen_down: bool = False


def parse_polylines_mm(text: str) -> Tuple[List[List[PointMM]], int]:
    """All pen-down polylines in mm + the pen-down move count."""
    st = _State()
    paths: List[List[PointMM]] = []
    cur: List[PointMM] = []
    pen_moves = 0

    def flush():
        nonlocal cur
        if len(cur) >= 2:
            paths.append(cur)
        cur = []

    for raw in text.splitlines():
        line = strip_comment(raw)
        if not line:
            continue
        pen: Optional[bool] = None
        nx = ny = nz = None

        for tok in line.split():
            if len(tok) < 2:
                continue
            cmd, val = tok[0].upper(), tok[1:]
            if cmd == "G":
                try:
                    g = int(float(val))
                except ValueError:
                    continue
                if g == 90:
                    st.absolute = True
                elif g == 91:
                    st.absolute = False
                elif g == 21:
                    st.mm_units = True
                elif g == 20:
                    st.mm_units = False
            elif cmd == "M":
                try:
                    m = int(float(val))
                except ValueError:
                    continue
                if m in (3, 4):
                    pen = True
                elif m == 5:
                    pen = False
            elif cmd in ("X", "Y", "Z"):
                try:
                    v = float(val)
                except ValueError:
                    continue
                if not st.mm_units:
                    v *= INCH_TO_MM
                if cmd == "X":
                    nx = v
                elif cmd == "Y":
                    ny = v
                else:
                    nz = v

        if nz is not None:
            st.z = nz
            if pen is None:
                pen = st.z <= 0.0
        if pen is not None and pen != st.pen_down:
            if st.pen_down and not pen:
                flush()
            st.pen_down = pen

        if nx is not None or ny is not None:
            ox, oy = st.x, st.y
            if st.absolute:
                st.x = nx if nx is not None else st.x
                st.y = ny if ny is not None else st.y
            else:
                st.x += nx or 0.0
                st.y += ny or 0.0
            if st.pen_down:
                if not cur:
                    cur = [(ox, oy)]
                cur.append((st.x, st.y))
                pen_moves += 1

    flush()
    return paths, pen_moves


def mm_polylines_to_steps(
    paths_mm: List[List[PointMM]],
    steps_per_mm: float,
    canvas_w: int,
    canvas_h: int,
    invert_y: bool,
    offset_mm: Tuple[float, float] = (0.0, 0.0),
    scale: Tuple[float, float] = (1.0, 1.0),
) -> List[List[Point]]:
    out: List[List[Point]] = []
    for poly in paths_mm:
        if len(poly) < 2:
            continue
        steps: List[Point] = []
        last: Optional[Point] = None
        for x_mm, y_mm in poly:
            xf = (x_mm * scale[0] + offset_mm[0]) * steps_per_mm
            yf = (y_mm * scale[1] + offset_mm[1]) * steps_per_mm
            if invert_y:
                yf = (canvas_h - 1) - yf
            xi = min(max(int(round(xf)), 0), canvas_w - 1)
            yi = min(max(int(round(yf)), 0), canvas_h - 1)
            if last != (xi, yi):
                steps.append((xi, yi))
                last = (xi, yi)
        if len(steps) >= 2:
            out.append(steps)
    return out


def order_nearest_l1(paths: List[List[Point]], start: Point = (0, 0)) -> List[List[Point]]:
    """Greedy nearest-start ordering by L1 distance, no reversal
    (gcode2stream.py:151-172)."""
    remaining = [p for p in paths if len(p) >= 2]
    out: List[List[Point]] = []
    cur = start
    while remaining:
        best, bd = 0, 10**18
        for i, p in enumerate(remaining):
            d = abs(cur[0] - p[0][0]) + abs(cur[1] - p[0][1])
            if d < bd:
                bd, best = d, i
        chosen = remaining.pop(best)
        out.append(chosen)
        cur = chosen[-1]
    return out


def emit_stream(
    paths: List[List[Point]],
    prof: MotionProfile,
    color_index: int = 3,
) -> bytes:
    """Streams begin with pen_up + explicit initial speed + color select
    (unlike step 13; gcode2stream.py:399-423)."""
    sb = StreamEmitter()
    if not paths:
        return sb.finish()
    sb.pen_up()
    sb.speed(prof.div_start)
    sb.select_color(color_index)
    pos = (0, 0)
    for path in paths:
        if len(path) < 2:
            continue
        if pos != path[0]:
            sb.travel(pos[0], pos[1], path[0][0], path[0][1], prof)
        sb.pen_down()
        sb.polyline(path, prof)
        sb.pen_up()
        pos = path[-1]
    return sb.finish()


def scale_profile_speeds(prof: MotionProfile, speed_scale: float) -> MotionProfile:
    """Global feed-rate-style divider scaling with the reference's constraint
    clamps (gcode2stream.py:546-587)."""
    if speed_scale <= 0.0:
        raise ValueError("speed scale must be > 0")
    if abs(speed_scale - 1.0) < 1e-6:
        return prof

    def s(v: int) -> int:
        return max(1, int(round(v / speed_scale)))

    p = MotionProfile(**{**prof.__dict__})
    p.div_start = s(prof.div_start)
    p.div_fast = s(prof.div_fast)
    p.corner_div = s(prof.corner_div)
    p.short_div = s(prof.short_div)
    p.travel_div_fast = s(prof.travel_div_fast)
    p.travel_start_div = s(prof.travel_start_div)
    p.div_start = max(p.div_start, p.div_fast)
    p.corner_div = max(p.corner_div, p.div_fast)
    p.short_div = max(p.short_div, p.div_fast)
    p.travel_start_div = max(p.travel_start_div, p.travel_div_fast)
    p.div_start = max(p.div_start, p.travel_div_fast)
    return p


def gcode_to_stream(
    text: str,
    *,
    steps_per_mm: float = DEFAULT_STEPS_PER_MM,
    canvas_w: Optional[int] = None,
    canvas_h: Optional[int] = None,
    invert_y: bool = False,
    offset_mm: Tuple[float, float] = (0.0, 0.0),
    scale: Tuple[float, float] = (1.0, 1.0),
    color_index: int = 3,
    reorder: bool = True,
    profile: Optional[MotionProfile] = None,
    speed_scale: float = 1.0,
) -> Tuple[bytes, dict]:
    """Full G-code → stream conversion; returns (bytes, info dict)."""
    if canvas_w is None:
        canvas_w = int(round(A4_W_MM * steps_per_mm))
    if canvas_h is None:
        canvas_h = int(round(A4_H_MM * steps_per_mm))
    prof = profile or MotionProfile(steps_per_mm=steps_per_mm, invert_y=invert_y)
    prof = scale_profile_speeds(prof, speed_scale)

    paths_mm, pen_moves = parse_polylines_mm(text)
    paths = mm_polylines_to_steps(
        paths_mm, steps_per_mm, canvas_w, canvas_h, invert_y, offset_mm, scale
    )
    if reorder:
        paths = order_nearest_l1(paths, (0, 0))
    data = emit_stream(paths, prof, color_index)
    info = {
        "polylines_mm": len(paths_mm),
        "pen_down_moves": pen_moves,
        "polylines_steps": len(paths),
        "canvas_steps": [canvas_w, canvas_h],
        "bytes": len(data),
    }
    return data, info
