"""ctypes bridge to the native assembly library (native/projector.cpp).

The online operators run in XLA on the TPU; the one-time host-side sparse
system-matrix assembly runs here in multithreaded C++ when the library is
built (`scripts/build_native.sh`), with transparent numpy fallbacks in
`geometry.py` / `cone_beam.py` otherwise."""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["load_library", "native_joseph_coo", "native_cone_slice_coo",
           "available"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libprojector.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64, f32, f64 = ctypes.c_int64, ctypes.c_float, ctypes.c_double
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.joseph_parallel_coo.restype = i64
    lib.joseph_parallel_coo.argtypes = [p_f64, i64, i64, i64, i64, f64,
                                        ctypes.c_int, p_i64, p_i64, p_f32, i64]
    lib.cone_slice_coo.restype = i64
    lib.cone_slice_coo.argtypes = [p_f64, p_f64, i64, i64, i64, i64, f64,
                                   i64, ctypes.c_int, p_i64, p_i64, p_f32, i64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def _nthreads() -> int:
    return max(1, (os.cpu_count() or 1) - 1)


def native_joseph_coo(angles: np.ndarray, H: int, W: int, D: int,
                      det_spacing: float):
    """Returns (rows, cols, vals) or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    angles = np.ascontiguousarray(angles, np.float64)
    cap = int(len(angles) * D * (2 * max(H, W) + 4))
    rows = np.empty(cap, np.int64)
    cols = np.empty(cap, np.int64)
    vals = np.empty(cap, np.float32)
    n = lib.joseph_parallel_coo(angles, len(angles), H, W, D,
                                float(det_spacing), _nthreads(),
                                rows, cols, vals, cap)
    assert n >= 0, "native COO capacity exceeded"
    return rows[:n], cols[:n], vals[:n]


def native_cone_slice_coo(src: np.ndarray, det: np.ndarray,
                          vol_shape, vox: float, n_steps: int,
                          nnz_cap_per_ray: Optional[int] = None):
    """Returns (rows, cols, vals) or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    nz, ny, nx = vol_shape
    src = np.ascontiguousarray(src, np.float64)
    det = np.ascontiguousarray(det, np.float64)
    n_rays = src.shape[0]
    # each ray footprint <= ~3 pixels per sample row; generous cap
    cap = int(n_rays * min(ny * nx, 6 * n_steps))
    rows = np.empty(cap, np.int64)
    cols = np.empty(cap, np.int64)
    vals = np.empty(cap, np.float32)
    n = lib.cone_slice_coo(src, det, n_rays, nz, ny, nx, float(vox),
                           int(n_steps), _nthreads(), rows, cols, vals, cap)
    assert n >= 0, "native COO capacity exceeded"
    return rows[:n], cols[:n], vals[:n]
