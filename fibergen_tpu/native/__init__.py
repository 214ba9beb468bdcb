"""ctypes bindings for the native host-side geometry kernels.

Builds libfibergen_native.so with g++ on first import if missing; all
callers fall back to pure numpy when the toolchain is unavailable or
FIBERGEN_TPU_NATIVE=0 is set.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfibergen_native.so")

_lib = None
_tried = False


def _build():
    src = os.path.join(_DIR, "fibergen_native.cpp")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, src]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("FIBERGEN_TPU_NATIVE", "1") == "0":
        return None
    try:
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO)
                < os.path.getmtime(os.path.join(_DIR, "fibergen_native.cpp"))):
            _build()
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None

    dptr = ctypes.POINTER(ctypes.c_double)
    lib.segseg_distance_batch.argtypes = [dptr, dptr, dptr, dptr,
                                          ctypes.c_int64, dptr]
    lib.segseg_distance_batch.restype = None
    lib.capsule_clearance_min.argtypes = [dptr, dptr, ctypes.c_double,
                                          dptr, dptr, dptr,
                                          ctypes.c_int64, ctypes.c_double]
    lib.capsule_clearance_min.restype = ctypes.c_double
    lib.halfspace_box_cut_fraction.argtypes = [ctypes.c_double] * 7
    lib.halfspace_box_cut_fraction.restype = ctypes.c_double
    lib.point_triangle_distance_batch.argtypes = [
        dptr, ctypes.c_int64, dptr, dptr, dptr, dptr]
    lib.point_triangle_distance_batch.restype = None
    _lib = lib
    return _lib


def _as_dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def segseg_distance_batch(p1, q1, P2, Q2):
    """Native batched segment-segment distances; None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p1 = np.ascontiguousarray(p1, dtype=np.float64)
    q1 = np.ascontiguousarray(q1, dtype=np.float64)
    P2 = np.ascontiguousarray(P2, dtype=np.float64)
    Q2 = np.ascontiguousarray(Q2, dtype=np.float64)
    n = P2.shape[0]
    out = np.empty(n, dtype=np.float64)
    lib.segseg_distance_batch(_as_dptr(p1), _as_dptr(q1), _as_dptr(P2),
                              _as_dptr(Q2), n, _as_dptr(out))
    return out


def capsule_clearance_min(p1, q1, r1, P2, Q2, R2, cutoff=-1e300):
    """Native min clearance with early exit; None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p1 = np.ascontiguousarray(p1, dtype=np.float64)
    q1 = np.ascontiguousarray(q1, dtype=np.float64)
    P2 = np.ascontiguousarray(P2, dtype=np.float64)
    Q2 = np.ascontiguousarray(Q2, dtype=np.float64)
    R2 = np.ascontiguousarray(R2, dtype=np.float64)
    return float(lib.capsule_clearance_min(
        _as_dptr(p1), _as_dptr(q1), float(r1), _as_dptr(P2), _as_dptr(Q2),
        _as_dptr(R2), P2.shape[0], float(cutoff)))


def halfspace_box_cut_fraction(n, d, h):
    """Long-double oracle for the device plane_cut_fraction."""
    lib = get_lib()
    if lib is None:
        return None
    return float(lib.halfspace_box_cut_fraction(
        float(n[0]), float(n[1]), float(n[2]), float(d),
        float(h[0]), float(h[1]), float(h[2])))
