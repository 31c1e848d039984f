"""ctypes bridge to the native C++ host engine (native/clip.cc).

Reference: the reference's runtime is C++ end-to-end; in the TPU build the
device compute path is JAX/Pallas and the HOST-side geometric/bookkeeping
hot loops (offline exchange-grid construction, sparse accumulator
consolidation) are C++ (SURVEY.md section 2 "Exchange-grid generator
star-NATIVE").  pybind11 is not in the image, so the boundary is a plain C
ABI over ctypes.

The library builds lazily on first use (single translation unit, ~1 s with
g++); set ICEBIN_NO_NATIVE=1 to force the numpy fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

__all__ = ["available", "clip_areas_centroids_native", "coo_sum_sorted",
           "ensure_gcmce_lib", "zarray_encode_native",
           "zarray_decode_native"]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libicebin_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ICEBIN_NO_NATIVE"):
        return None
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["sh", str(_NATIVE_DIR / "build.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ib_clip_polys_rects.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.ib_coo_sum_sorted.restype = ctypes.c_int64
        lib.ib_coo_sum_sorted.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.ib_zarray_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64)]
        lib.ib_zarray_decode.restype = ctypes.c_int
        lib.ib_zarray_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def ensure_gcmce_lib(timeout: float = 180.0):
    """Build (on first use) and return the path of ``libicebin_gcmce.so``,
    the Fortran-GCM-facing gcmce_* C ABI (native/gcmce.cc; reference
    ``gcmce_couple_native`` etc. in ``GCMCoupler_ModelE.cpp`` [U]).
    Returns None if the toolchain cannot produce it."""
    path = _NATIVE_DIR / "libicebin_gcmce.so"
    if path.exists():
        return path
    if os.environ.get("ICEBIN_NO_NATIVE"):
        return None
    try:
        subprocess.run(["sh", str(_NATIVE_DIR / "build_gcmce.sh")],
                       check=True, capture_output=True, timeout=timeout)
    except Exception:
        return None
    return path if path.exists() else None


def _ptr(a, typ=ctypes.c_double):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def clip_areas_centroids_native(polys: np.ndarray, rects: np.ndarray):
    """f64 batched clip; same contract as oracle.clip (signed areas)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    polys = np.ascontiguousarray(polys, dtype=np.float64)
    rects = np.ascontiguousarray(rects, dtype=np.float64)
    n, v0 = polys.shape[0], polys.shape[1]
    if 16 * v0 > 1024:
        raise ValueError("subject polygons too large for the native engine")
    areas = np.empty(n, dtype=np.float64)
    cents = np.empty((n, 2), dtype=np.float64)
    lib.ib_clip_polys_rects(_ptr(polys), _ptr(rects), n, v0,
                            _ptr(areas), _ptr(cents))
    return areas, cents


def coo_sum_sorted(rows, cols, vals):
    """In-place duplicate-sum of (row,col)-sorted COO; returns views."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n = lib.ib_coo_sum_sorted(_ptr(rows, ctypes.c_int64),
                              _ptr(cols, ctypes.c_int64),
                              _ptr(vals), len(vals))
    return rows[:n], cols[:n], vals[:n]


def zarray_encode_native(rows: np.ndarray, cols: np.ndarray):
    """(varint(row deltas), varint(zigzag col deltas)) bytes -- the
    byte-identical native twin of io.zarray's numpy streams."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    n = len(rows)
    out_r = np.empty(10 * n + 1, dtype=np.uint8)
    out_c = np.empty(10 * n + 1, dtype=np.uint8)
    lr = ctypes.c_int64()
    lc = ctypes.c_int64()
    lib.ib_zarray_encode(_ptr(rows, ctypes.c_int64),
                         _ptr(cols, ctypes.c_int64), n,
                         _ptr(out_r, ctypes.c_uint8), ctypes.byref(lr),
                         _ptr(out_c, ctypes.c_uint8), ctypes.byref(lc))
    return out_r[:lr.value].tobytes(), out_c[:lc.value].tobytes()


def zarray_decode_native(br: bytes, bc: bytes, n: int):
    """(rows, cols) int64 arrays from the two varint streams."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    ar = np.frombuffer(br, dtype=np.uint8)
    ac = np.frombuffer(bc, dtype=np.uint8)
    rows = np.empty(n, dtype=np.int64)
    cols = np.empty(n, dtype=np.int64)
    rc = lib.ib_zarray_decode(_ptr(ar, ctypes.c_uint8), len(ar),
                              _ptr(ac, ctypes.c_uint8), len(ac), n,
                              _ptr(rows, ctypes.c_int64),
                              _ptr(cols, ctypes.c_int64))
    if rc != 0:
        raise ValueError(f"corrupt zarray varint stream (code {rc})")
    return rows, cols
