"""Native (C++) host kernels with lazy compilation and numpy fallback.

The hot host-side operations — AER materialization from count maps, event
histogramming, AREA_COUNT exposure scanning, AEDAT-2 packing — are
implemented in `aer_kernels.cpp` and compiled on first use with g++.  If no
compiler is available the callers fall back to vectorized numpy (same
semantics, implemented next to each call site).

This mirrors the role Numba JIT kernels play in the reference
(/root/reference/v2ecore/v2e_utils.py:474, renderer.py:238-267) with an
ahead-of-time native library instead of a JIT dependency.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "aer_kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "_aer_kernels.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning(f"native kernel build failed ({e}); using numpy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native kernel library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning(f"could not load native kernels: {e}")
            return None

        i64, f32, f64 = ctypes.c_int64, ctypes.c_float, ctypes.c_double
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.hist2d_accumulate.argtypes = [p_f64, i64, i64, i64, f32, p_f32]
        lib.hist2d_accumulate.restype = None
        lib.area_count_scan.argtypes = [p_f64, i64, i64, i64, i64, p_i64, i64, i64]
        lib.area_count_scan.restype = i64
        lib.materialize_frame.argtypes = [
            p_i16, p_i16, i64, i64, i64, f64, f64, f64,
            ctypes.c_void_p, ctypes.c_void_p, i64,
            p_f64, ctypes.c_void_p, i64,
        ]
        lib.materialize_frame.restype = i64
        lib.count_frame_events.argtypes = [p_i16, i64, ctypes.c_void_p, ctypes.c_void_p]
        lib.count_frame_events.restype = i64
        lib.materialize_sparse.argtypes = [
            p_i32, p_i16, p_i16, ctypes.c_void_p, i64,
            p_i64, p_i64, p_f64, p_f64, p_f64,
            i64, i64, i64,
            ctypes.c_void_p, p_f64, ctypes.c_void_p, p_i64,
        ]
        lib.materialize_sparse.restype = i64
        lib.pack_aedat2.argtypes = [
            p_f64, i64, i64, i64, i64, i64, i64, ctypes.c_int32,
            ctypes.c_void_p, p_i32,
        ]
        lib.pack_aedat2.restype = None
        _lib = lib
        logger.info("native AER kernels loaded")
        return _lib


def have_native() -> bool:
    return get_lib() is not None
