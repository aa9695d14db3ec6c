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


def _src_tag(path: str) -> str:
    """Content hash of the source: the build artifact is named by it, so a
    stale binary can never shadow changed source (mtimes are not preserved
    by git checkouts)."""
    import hashlib
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:12]


def _compile(cmd_tail, out: str, timeout: int) -> Optional[str]:
    """Compile to a temp path and os.rename into place: a SIGKILLed or
    concurrent g++ must never leave a truncated .so at the final name
    (it would be trusted forever by the exists() check)."""
    if os.path.exists(out):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC"] + cmd_tail +
                       ["-o", tmp], check=True, capture_output=True,
                       timeout=timeout)
        os.replace(tmp, out)
        _prune_stale(out)
        return out
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _prune_stale(current: str) -> None:
    """After a successful build, drop sibling artifacts of the same stem
    with a different content hash (plus orphaned .tmp.<pid> files from
    SIGKILLed builds) so edits don't accumulate .so files forever.

    Only artifacts older than 10 minutes are touched: a CONCURRENT process
    at a different source revision may have just built (or be mid-build
    with a live .tmp) — deleting its fresh file would silently downgrade
    it to the Python fallback. A >10-min-old .so belonging to a live
    process is safe too: that process already dlopened it (the mapping
    survives unlink)."""
    import glob
    import time
    cutoff = time.time() - 600.0
    stem = os.path.basename(current).split("-", 1)[0]
    for p in glob.glob(os.path.join(_HERE, f"{stem}-*.so")) + \
            glob.glob(os.path.join(_HERE, f"{stem}-*.so.tmp.*")):
        if os.path.abspath(p) != os.path.abspath(current):
            try:
                if os.path.getmtime(p) < cutoff:
                    os.unlink(p)
            except OSError:
                pass  # in use elsewhere / already gone


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "cocoeval_core.cpp")
    out = os.path.join(_HERE, f"libcocoeval-{_src_tag(src)}.so")
    return _compile([src], out, 120)


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
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
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


# ---------------------------------------------------------------------------
# native data-loader core (loader_core.cpp): OpenCV/libjpeg pixel pipeline +
# C++ batch thread pool. See data/native_loader.py for the Python pipeline.

_LDR_LOCK = threading.Lock()
_LDR_LIB: Optional[ctypes.CDLL] = None
_LDR_TRIED = False


class HdPlan(ctypes.Structure):
    """Mirror of loader_core.cpp's hd_plan."""
    _fields_ = [
        ("src", ctypes.c_void_p * 4),
        ("sh", ctypes.c_int * 4),
        ("sw", ctypes.c_int * 4),
        ("jpeg", ctypes.c_void_p * 4),
        ("jlen", ctypes.c_longlong * 4),
        ("n_tiles", ctypes.c_int),
        ("mode", ctypes.c_int),
        ("S", ctypes.c_int),
        ("xc", ctypes.c_int),
        ("yc", ctypes.c_int),
        ("do_affine", ctypes.c_int),
        ("m", ctypes.c_double * 6),
        ("do_hsv", ctypes.c_int),
        ("r0", ctypes.c_double),
        ("r1", ctypes.c_double),
        ("r2", ctypes.c_double),
        ("do_flip", ctypes.c_int),
        ("pad_value", ctypes.c_int),
        ("out", ctypes.c_void_p),
        ("status", ctypes.c_int),
    ]


def _build_loader() -> Optional[str]:
    src = os.path.join(_HERE, "loader_core.cpp")
    out = os.path.join(_HERE, f"libloader-{_src_tag(src)}.so")
    return _compile(["-I/usr/include/opencv4", src, "-lopencv_core",
                     "-lopencv_imgproc", "-ljpeg", "-pthread"], out, 300)


def get_loader_lib() -> Optional[ctypes.CDLL]:
    """Build+load the loader core; None when the toolchain or OpenCV/libjpeg
    dev files are unavailable (callers fall back to the Python pipeline)."""
    global _LDR_LIB, _LDR_TRIED
    with _LDR_LOCK:
        if _LDR_TRIED:
            return _LDR_LIB
        _LDR_TRIED = True
        path = _build_loader()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.hd_pool_create.argtypes = [ctypes.c_int]
        lib.hd_pool_create.restype = ctypes.c_void_p
        lib.hd_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.hd_pool_destroy.restype = None
        lib.hd_pool_run.argtypes = [ctypes.c_void_p, ctypes.POINTER(HdPlan),
                                    ctypes.c_int]
        lib.hd_pool_run.restype = None
        lib.hd_run_plan.argtypes = [ctypes.POINTER(HdPlan)]
        lib.hd_run_plan.restype = None
        lib.hd_letterbox.argtypes = [u8, ctypes.c_int, ctypes.c_int, u8,
                                     ctypes.c_int, ctypes.c_int]
        lib.hd_letterbox.restype = None
        lib.hd_hsv_jitter.argtypes = [u8, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_double, ctypes.c_double,
                                      ctypes.c_double]
        lib.hd_hsv_jitter.restype = None
        lib.hd_flip_h.argtypes = [u8, ctypes.c_int, ctypes.c_int]
        lib.hd_flip_h.restype = None
        lib.hd_jpeg_dims.argtypes = [u8, ctypes.c_longlong,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.hd_jpeg_dims.restype = ctypes.c_int
        lib.hd_decode_jpeg.argtypes = [u8, ctypes.c_longlong, u8,
                                       ctypes.c_longlong,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.hd_decode_jpeg.restype = ctypes.c_int
        _LDR_LIB = lib
        return _LDR_LIB


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
