"""Native (C++) components, built on first use with the system toolchain.

ctypes bindings (no pybind11 in this image). Every native path has a pure
numpy fallback so the framework works without a compiler; tests pin
equality between the two.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "cocoeval_core.cpp")
    out = os.path.join(_HERE, "libcocoeval.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
            check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def get_cocoeval_lib() -> Optional[ctypes.CDLL]:
    """Build+load the matching core; None if no toolchain available."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.match_dets.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.match_dets.restype = None
        _LIB = lib
        return _LIB


def match_dets_native(iou_thrs: np.ndarray, ious: np.ndarray,
                      g_ig: np.ndarray, g_crowd: np.ndarray):
    """C++ greedy matching; returns (dtm (T,D), dt_ig (T,D)) or None when
    the native lib is unavailable."""
    lib = get_cocoeval_lib()
    if lib is None:
        return None
    T = len(iou_thrs)
    D, G = ious.shape
    dtm = np.empty((T, D), np.int64)
    dt_ig = np.empty((T, D), np.int64)
    lib.match_dets(T, np.ascontiguousarray(iou_thrs, np.float64),
                   D, G, np.ascontiguousarray(ious, np.float64),
                   np.ascontiguousarray(g_ig, np.int64),
                   np.ascontiguousarray(g_crowd, np.int64), dtm, dt_ig)
    return dtm, dt_ig
