"""ctypes bindings for the native C++ kernels (see knn.cc).

Builds the shared library on first use via the Makefile (g++ is in the
image); callers fall back to scipy/numpy implementations when the toolchain
is unavailable (core.gaussians.mean_sq_dist_to_3nn,
data.pointcloud.voxel_downsample).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libht3dgs_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.ht3dgs_mean_sq_dist_3nn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.ht3dgs_voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.ht3dgs_voxel_downsample.restype = ctypes.c_int64
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(len(pts), dtype=np.float32)
    lib.ht3dgs_mean_sq_dist_3nn(_fptr(pts), len(pts), _fptr(out))
    return out


def voxel_downsample(points: np.ndarray, colors: np.ndarray,
                     voxel: float) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    cols = np.ascontiguousarray(colors, dtype=np.float32)
    out_p = np.empty_like(pts)
    out_c = np.empty_like(cols)
    m = lib.ht3dgs_voxel_downsample(_fptr(pts), _fptr(cols), len(pts),
                                    voxel, _fptr(out_p), _fptr(out_c))
    return out_p[:m].copy(), out_c[:m].copy()
