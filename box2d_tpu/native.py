"""Loader for the native C++ scene-compiler core (native/scene_core.cpp).

Compiles on first use with g++ into the package directory and binds via
ctypes (the image has no pybind11). Every entry point has a NumPy fallback so
the engine works without a toolchain; the native paths turn O(n^2) Python
scene-construction loops (hulls, particle pair/triad building) into
grid-hashed linear C++ — the host-runtime analog of the reference's HPCSharp
sorts and hand-rolled spatial hashing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                    "scene_core.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_scene_core.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.abspath(_SRC)
        if not os.path.exists(src):
            return None
        try:
            if (not os.path.exists(_OUT)
                    or os.path.getmtime(_OUT) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", _OUT, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_OUT)
            lib.compute_hull.restype = ctypes.c_int
            lib.build_pairs.restype = ctypes.c_int
            lib.build_triads.restype = ctypes.c_int
            lib.fill_box.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _ptr(a, ty):
    return a.ctypes.data_as(ctypes.POINTER(ty))


def compute_hull_native(points: np.ndarray, linear_slop: float,
                        max_out: int = 8):
    """Returns hull points (k, 2) float32 or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64).reshape(-1, 2)
    out = np.zeros((max_out, 2), np.float64)
    k = lib.compute_hull(_ptr(pts, ctypes.c_double), len(pts),
                         ctypes.c_double(linear_slop),
                         _ptr(out, ctypes.c_double), max_out)
    return out[:k].astype(np.float32)


def build_pairs_native(pos: np.ndarray, max_dist: float,
                       max_pairs: int | None = None):
    """Returns (a, b, dist) int32/int32/float32 arrays, or None."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32).reshape(-1, 2)
    n = len(pos)
    cap = max_pairs or max(16, n * 8)
    a = np.zeros(cap, np.int32)
    b = np.zeros(cap, np.int32)
    d = np.zeros(cap, np.float32)
    k = lib.build_pairs(_ptr(pos, ctypes.c_float), n,
                        ctypes.c_float(max_dist),
                        _ptr(a, ctypes.c_int32), _ptr(b, ctypes.c_int32),
                        _ptr(d, ctypes.c_float), cap)
    return a[:k], b[:k], d[:k]


def build_triads_native(pos: np.ndarray, stride: float,
                        max_triads: int | None = None):
    """Returns (tri (k,3) i32, rest (k,3,2) f32) or None."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32).reshape(-1, 2)
    n = len(pos)
    cap = max_triads or max(16, n * 2)
    tri = np.zeros((cap, 3), np.int32)
    rest = np.zeros((cap, 3, 2), np.float32)
    k = lib.build_triads(_ptr(pos, ctypes.c_float), n,
                         ctypes.c_float(stride),
                         _ptr(tri, ctypes.c_int32),
                         _ptr(rest, ctypes.c_float), cap)
    return tri[:k], rest[:k]


def fill_box_native(center, half_w, half_h, stride, max_out=1 << 22):
    """Returns (k, 2) f32 grid positions or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((max_out, 2), np.float32)
    k = lib.fill_box(ctypes.c_float(center[0]), ctypes.c_float(center[1]),
                     ctypes.c_float(half_w), ctypes.c_float(half_h),
                     ctypes.c_float(stride), _ptr(out, ctypes.c_float),
                     max_out)
    return out[:k].copy()
