"""On-demand build + ctypes binding of the native fusion kernels.

Compiles native/fusion_kernels.cc with g++ (-O3, OpenMP) the first time it's
needed; the shared object is cached next to the package and rebuilt when the
source changes. Falls back to ``None`` (numpy backend) if no toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "fusion_kernels.cc")
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_native_build")

_lib = None
_lib_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"fusion_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = tempfile.mktemp(suffix=".so", dir=_CACHE_DIR)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def get_native_lib():
    """ctypes handle to the fusion kernels, or None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.geo_consistency.argtypes = [f32, f32, f32, f64, f64, f32, u8, f32,
                                    ctypes.c_int, ctypes.c_int]
    lib.geo_consistency.restype = None
    lib.backproject_points.argtypes = [f32, u8, f32, f64, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, f32, u8]
    lib.backproject_points.restype = ctypes.c_int
    _lib = lib
    return _lib
