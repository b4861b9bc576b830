"""ctypes bindings for the native (C++) data layer.

Loads ``libbdf_native.so`` (building it with make on first use if a
toolchain is available); every caller must handle ``lib() is None`` and
fall back to the NumPy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbdf_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32
_p_i64 = ctypes.POINTER(ctypes.c_int64)
_p_i32 = ctypes.POINTER(ctypes.c_int32)
_p_f32 = ctypes.POINTER(ctypes.c_float)
_p_f64 = ctypes.POINTER(ctypes.c_double)
_pp_i32 = ctypes.POINTER(_p_i32)
_pp_f32 = ctypes.POINTER(_p_f32)


def lib() -> Optional[ctypes.CDLL]:
    """The native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    try:
        L = ctypes.CDLL(_SO)
    except OSError:
        return None
    try:
        _declare(L)
    except AttributeError:
        # a stale library mapped by an earlier dlopen of the same path
        # (dlopen caches per-process) — fall back to NumPy rather than
        # crash callers mid-build
        return None
    _lib = L
    return _lib


def _declare(L: ctypes.CDLL) -> None:
    L.bdf_plan_layout.restype = _i64
    L.bdf_plan_layout.argtypes = [_i64, _i32, _i32, _i64, _p_i32, _p_i64,
                                  _i32, _p_i64, _p_i64]
    L.bdf_fill_layout.restype = _i32
    L.bdf_fill_layout.argtypes = [_i64, _i32, _i32, _i64, _p_i32, _p_f64,
                                  ctypes.c_double, _p_i64, _i32, _p_i64,
                                  _pp_i32, _pp_i32, _pp_f32, _pp_f32]
    L.bdf_read_sbm_header.restype = _i64
    L.bdf_read_sbm_header.argtypes = [ctypes.c_char_p, _p_i64]
    L.bdf_read_sbm.restype = _i32
    L.bdf_read_sbm.argtypes = [ctypes.c_char_p, _i64, _p_i32, _p_i32]
    L.bdf_write_sbm.restype = _i32
    L.bdf_write_sbm.argtypes = [ctypes.c_char_p, _i64, _i64, _i64, _p_i32,
                                _p_i32]
    L.bdf_accum_dense_pair.restype = _i32
    L.bdf_accum_dense_pair.argtypes = [_i64, _p_i64, _p_f64, _i64, _p_f32,
                                       _p_f32]
    L.bdf_quantize_pair.restype = ctypes.c_double
    L.bdf_quantize_pair.argtypes = [_i64, _p_f32, _p_f32,
                                    ctypes.POINTER(ctypes.c_int8),
                                    ctypes.POINTER(ctypes.c_int8)]
