"""Protocol-level tests: Bresenham closed form, packing, ramps, round-trip,
and byte-equality against committed reference-generated goldens."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from plotweave.stream import (
    StreamBuilder,
    MotionProfile,
    StreamDecoder,
    dir_codes,
    emit_polyline,
    pack_dir_codes,
    travel_ramped,
)
from plotweave.stream.decoder import replay
from plotweave.stream.encoder import plan_accel, plan_decel, _ramp_level_counts
from plotweave.stream.protocol import DIR_VECTORS

GOLDEN = Path(__file__).parent / "golden"


# ---------------------------------------------------------------- bresenham


def _dir_codes_loop(x0, y0, x1, y1):
    """Scalar per-step Bresenham walk — the protocol-spec behavior the
    closed form must reproduce (one code per motor step, combined diagonal)."""
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx - dy
    x, y = x0, y0
    out = []
    while (x, y) != (x1, y1):
        e2 = 2 * err
        mx = my = False
        if e2 > -dy:
            err -= dy
            x += sx
            mx = True
        if e2 < dx:
            err += dx
            y += sy
            my = True
        if mx and my:
            out.append({(1, 1): 1, (1, -1): 3, (-1, -1): 5, (-1, 1): 7}[(sx, sy)])
        elif mx:
            out.append(2 if sx > 0 else 6)
        else:
            out.append(0 if sy > 0 else 4)
    return out


def test_dir_codes_exhaustive_small():
    for dx in range(0, 20):
        for dy in range(0, 20):
            for sx in (1, -1):
                for sy in (1, -1):
                    x1, y1 = 31 + sx * dx, 47 + sy * dy
                    got = dir_codes(31, 47, x1, y1).tolist()
                    want = _dir_codes_loop(31, 47, x1, y1)
                    assert got == want, (dx, dy, sx, sy)


def test_dir_codes_random_large():
    rng = np.random.default_rng(0)
    for _ in range(200):
        x0, y0, x1, y1 = rng.integers(-20000, 20000, 4)
        got = dir_codes(x0, y0, x1, y1).tolist()
        want = _dir_codes_loop(int(x0), int(y0), int(x1), int(y1))
        assert got == want


def test_dir_codes_lands_on_target():
    rng = np.random.default_rng(1)
    for _ in range(100):
        x0, y0, x1, y1 = (int(v) for v in rng.integers(-3000, 3000, 4))
        codes = dir_codes(x0, y0, x1, y1)
        moves = DIR_VECTORS[codes]
        assert x0 + moves[:, 0].sum() == x1
        assert y0 + moves[:, 1].sum() == y1


# ------------------------------------------------------------------ packing


def test_pack_even_odd():
    assert pack_dir_codes(np.array([], np.uint8)) == b""
    assert pack_dir_codes(np.array([3], np.uint8)) == bytes([0x80 | (3 << 3)])
    assert pack_dir_codes(np.array([1, 2], np.uint8)) == bytes([0xC0 | (1 << 3) | 2])
    assert pack_dir_codes(np.array([1, 2, 7], np.uint8)) == bytes(
        [0xC0 | (1 << 3) | 2, 0x80 | (7 << 3)]
    )


# -------------------------------------------------------------------- ramps


def test_triangle_counts_even_distribution():
    counts = _ramp_level_counts("triangle", 10, 15, 18)  # 4 levels
    assert counts.tolist() == [3, 3, 2, 2]
    assert counts.sum() == 10


def test_scurve_counts_match_pointwise_formula():
    length, fast, slow = 37, 12, 28
    counts = _ramp_level_counts("scurve", length, fast, slow)
    # independent recomputation with scalar smoothstep
    expect = np.zeros(slow - fast + 1, np.int64)
    for i in range(length):
        t = (i + 0.5) / length
        s = 3 * t * t - 2 * t * t * t
        div = round(slow - s * (slow - fast))
        div = max(fast, min(slow, div))
        expect[slow - div] += 1
    assert counts.tolist() == expect.tolist()


def test_accel_decel_order_and_coverage():
    codes = np.arange(100, dtype=np.uint8) & 7
    acc = plan_accel(codes, "triangle", 15, 25)
    divs = [d for d, _ in acc]
    assert divs == sorted(divs, reverse=True)  # slow → fast
    assert np.concatenate([c for _, c in acc]).tolist() == codes.tolist()
    dec = plan_decel(codes, "triangle", 15, 25)
    divs = [d for d, _ in dec]
    assert divs == sorted(divs)  # fast → slow
    assert np.concatenate([c for _, c in dec]).tolist() == codes.tolist()


# --------------------------------------------------------------- round-trip


def test_polyline_roundtrip_geometry():
    prof = MotionProfile()
    sb = StreamBuilder()
    pts = [(0, 0), (100, 40), (250, 40), (250, 300), (0, 0)]
    sb.pen_down()
    emit_polyline(sb, prof, pts)
    sb.pen_up()
    blob = sb.finish()
    assert len(blob) % 1024 == 0
    dec = StreamDecoder(blob)
    assert dec.stats.eof_seen
    res = replay(dec)
    assert res.final_pos == (0, 0)
    path = res.polylines[0]
    for v in pts:  # every vertex is visited in order
        assert (path == np.array(v)).all(axis=1).any()


def test_travel_roundtrip_endpoint():
    prof = MotionProfile()
    for dst in [(1, 0), (5, 3), (240, 9000), (13210, 13019)]:
        sb = StreamBuilder()
        travel_ramped(sb, 7, 11, dst[0], dst[1], prof)
        res = replay(StreamDecoder(sb.finish()))
        # replay starts at the origin; travel is a relative displacement
        assert res.final_pos == (dst[0] - 7, dst[1] - 11)


def test_speed_dedup_and_padding():
    sb = StreamBuilder()
    sb.speed(20)
    sb.speed(20)
    sb.speed(21)
    sb.speed(20)
    blob = sb.finish()
    assert blob[:3] == bytes([0x40 | 20, 0x40 | 21, 0x40 | 20])
    assert blob[3] == 0x3F
    assert len(blob) == 1024 and set(blob[4:]) == {0}


# ------------------------------------------------------- golden byte-equality


def _interpret(spec: dict) -> bytes:
    prof = MotionProfile(**spec["profile"])
    sb = StreamBuilder()
    for op in spec["ops"]:
        kind = op["op"]
        if kind == "polyline":
            emit_polyline(sb, prof, [tuple(p) for p in op["pts"]])
        elif kind == "travel":
            travel_ramped(sb, op["frm"][0], op["frm"][1], op["to"][0], op["to"][1], prof)
        elif kind == "pen_up":
            sb.pen_up()
        elif kind == "pen_down":
            sb.pen_down()
        elif kind == "tap":
            sb.tap()
        elif kind == "color":
            sb.select_color(op["index"])
    return sb.finish()


@pytest.mark.parametrize("idx", range(6))
def test_byte_equality_vs_reference_goldens(idx):
    program = json.loads((GOLDEN / "stream_program.json").read_text())
    golden = (GOLDEN / f"stream_{idx:02d}.bin").read_bytes()
    got = _interpret(program[idx])
    assert got == golden, (
        f"stream {idx}: first diff at "
        f"{next((i for i, (a, b) in enumerate(zip(got, golden)) if a != b), 'len')} "
        f"(lens {len(got)} vs {len(golden)})"
    )
