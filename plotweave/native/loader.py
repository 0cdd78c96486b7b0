"""Build + load the native library via ctypes."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "encoder.cpp")
_LIB = os.path.join(_HERE, "_libplotweave.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


class PwProfile(ctypes.Structure):
    _fields_ = [
        ("div_start", ctypes.c_int32),
        ("div_fast", ctypes.c_int32),
        ("profile_scurve", ctypes.c_int32),
        ("corner_deg", ctypes.c_double),
        ("corner_div", ctypes.c_int32),
        ("corner_window_steps", ctypes.c_int32),
        ("short_len_steps", ctypes.c_int32),
        ("short_div", ctypes.c_int32),
        ("travel_div_fast", ctypes.c_int32),
        ("travel_start_div", ctypes.c_int32),
        ("travel_window_steps", ctypes.c_int32),
        ("travel_quant_step", ctypes.c_int32),
    ]


def _build() -> bool:
    try:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return True
        # -ffp-contract=off: the encoder/greedy float math must match numpy
        # bit-for-bit; FMA contraction (default at -O3 on FMA-baseline
        # targets) would change last-ulp results and flip near-tie selections.
        # -march=native widens the auto-vectorized elementwise loops (the
        # library always builds on the machine that runs it); it cannot
        # change float results: contraction stays off, and GCC never
        # vectorizes FP reductions without -fassociative-math, so sequential
        # accumulation orders are preserved.  Falls back to the baseline ISA
        # if the compiler rejects the flag.
        cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
               "-fPIC", "-o", _LIB + ".tmp", _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except subprocess.CalledProcessError:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        print(f"[plotweave.native] build failed, using Python fallback: {e}", file=sys.stderr)
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.pw_writer_new.restype = ctypes.c_void_p
    lib.pw_writer_free.argtypes = [ctypes.c_void_p]
    for f in ("pw_pen_up", "pw_pen_down", "pw_tap"):
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.pw_color.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.pw_set_speed.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.pw_size.argtypes = [ctypes.c_void_p]
    lib.pw_size.restype = ctypes.c_int64
    lib.pw_finalize.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.pw_finalize.restype = ctypes.c_int64
    lib.pw_polyline.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(PwProfile),
    ]
    lib.pw_travel.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(PwProfile),
    ]
    lib.pw_trace.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.pw_trace.restype = ctypes.c_int64
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        if os.environ.get("PLOTWEAVE_NO_NATIVE"):
            return None
        if _build():
            try:
                _lib = _bind(ctypes.CDLL(_LIB))
            except OSError as e:
                print(f"[plotweave.native] load failed: {e}", file=sys.stderr)
    return _lib


def available() -> bool:
    return get_lib() is not None


def bind_virtual_draw(lib: ctypes.CDLL) -> None:
    if hasattr(lib, "_pw_vd_bound"):
        return
    lib.pw_virtual_draw.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.pw_virtual_draw.restype = ctypes.c_int64
    lib.pw_resample_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pw_resample_batch.restype = ctypes.c_int64
    lib.pw_virtual_draw_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pw_virtual_draw_batch.restype = ctypes.c_int64
    lib._pw_vd_bound = True


def bind_cv_kmeans(lib: ctypes.CDLL) -> None:
    if hasattr(lib, "_pw_km_bound"):
        return
    lib.pw_cv_kmeans.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pw_cv_kmeans.restype = ctypes.c_double
    lib.pw_km_assign.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib._pw_km_bound = True


def bind_skeleton_ops(lib: ctypes.CDLL) -> None:
    if hasattr(lib, "_pw_skel_bound"):
        return
    lib.pw_thin.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.pw_thin.restype = ctypes.c_int
    lib.pw_comp_path.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.pw_comp_path.restype = ctypes.c_int64
    lib.pw_comp_paths_all.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pw_comp_paths_all.restype = ctypes.c_int64
    lib.pw_degree.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pw_arc_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pw_arc_batch_ptrs.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pw_scale_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pw_greedy_order.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pw_gcode_tokens.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pw_gcode_tokens.restype = ctypes.c_int64
    lib.pw_gcode_text.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.pw_gcode_text.restype = ctypes.c_int64
    lib.pw_order_l1.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib._pw_skel_bound = True


def bind_find_period(lib: ctypes.CDLL) -> None:
    if hasattr(lib, "_pw_period_bound"):
        return
    lib.pw_find_period.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pw_find_period.restype = ctypes.c_int
    lib._pw_period_bound = True
