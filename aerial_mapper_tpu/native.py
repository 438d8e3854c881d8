"""ctypes bindings for the native CPU baseline library.

Auto-builds ``native/libambaseline.so`` on first use (plain g++, no deps).
Used by bench.py as the measured CPU denominator and by tests as an extra
parity oracle. Returns None gracefully when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libambaseline.so")

_lib = None


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the baseline library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.backward_grid_baseline.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.dsm_idw_baseline.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
    ]
    lib.hardware_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def backward_grid_cpu(cells, R_cw, t, images, fx, fy, cx, cy,
                      num_threads: int = 0):
    """Run the native reference backward-grid loop.

    cells [M, 3] f64; R_cw [N, 3, 3] f64 (world->camera); t [N, 3] f64;
    images [N, H, W] f32. Returns (ortho [M], angle [M], obs [M]) f32.
    """
    lib = load_native()
    if lib is None:
        raise RuntimeError("native baseline library unavailable")
    cells = np.ascontiguousarray(cells, np.float64)
    R_cw = np.ascontiguousarray(R_cw, np.float64)
    t = np.ascontiguousarray(t, np.float64)
    images = np.ascontiguousarray(images, np.float32)
    m = cells.shape[0]
    n, h, w = images.shape
    ortho = np.empty(m, np.float32)
    angle = np.empty(m, np.float32)
    obs = np.empty(m, np.float32)
    if num_threads <= 0:
        num_threads = lib.hardware_threads()
    lib.backward_grid_baseline(
        _ptr(cells, ctypes.c_double), m,
        _ptr(R_cw, ctypes.c_double), _ptr(t, ctypes.c_double), n,
        _ptr(images, ctypes.c_float), h, w,
        float(fx), float(fy), float(cx), float(cy),
        _ptr(ortho, ctypes.c_float), _ptr(angle, ctypes.c_float),
        _ptr(obs, ctypes.c_float), num_threads,
    )
    return ortho, angle, obs


def dsm_idw_cpu(points, qx, qy, radius_sq, adaptive, growth, max_radius_sq,
                num_threads: int = 0):
    """Run the native reference DSM IDW loop.

    points [N, 3] f64; qx/qy [M] f64 query cell centers.
    Returns (values [M] f32, hit [M] bool).
    """
    lib = load_native()
    if lib is None:
        raise RuntimeError("native baseline library unavailable")
    points = np.ascontiguousarray(points, np.float64)
    qx = np.ascontiguousarray(qx, np.float64)
    qy = np.ascontiguousarray(qy, np.float64)
    m = qx.shape[0]
    val = np.empty(m, np.float32)
    hit = np.empty(m, np.uint8)
    if num_threads <= 0:
        num_threads = lib.hardware_threads()
    lib.dsm_idw_baseline(
        _ptr(points, ctypes.c_double), points.shape[0],
        _ptr(qx, ctypes.c_double), _ptr(qy, ctypes.c_double), m,
        float(radius_sq), int(adaptive), float(growth), float(max_radius_sq),
        _ptr(val, ctypes.c_float), _ptr(hit, ctypes.c_uint8), num_threads,
    )
    return val, hit.astype(bool)
