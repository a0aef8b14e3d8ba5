"""ctypes bindings for the native host library (built on demand with g++).

The device-side searchsorted is the Pallas kernel; this package is the host
runtime piece (dataset preprocessing, ray-pool data loader) — the role the
reference's C++ CPU extension and Python loops played. Falls back to numpy
when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "searchsorted.cpp")
_LIB = os.path.join(_HERE, "libscnerf_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return True
    except Exception:
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.scnerf_searchsorted.argtypes = [f32p, i64, i64, f32p, i64, i64, i64p, ctypes.c_bool]
    lib.scnerf_permutation.argtypes = [i64, ctypes.c_uint64, i64p]
    lib.scnerf_gather_rows.argtypes = [f32p, i64, i64, i64p, i64, f32p]
    lib.scnerf_gather_pixels.argtypes = [f32p, i64, i64, i64, i64p, i64p, i64p, i64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def searchsorted_host(a: np.ndarray, v: np.ndarray, side: str = "left") -> np.ndarray:
    """Row-wise host searchsorted with the extension's broadcast rule."""
    a = np.ascontiguousarray(a, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    rows = max(a.shape[0], v.shape[0])
    lib = load()
    if lib is None:
        return np.stack(
            [
                np.searchsorted(a[i % a.shape[0]], v[i % v.shape[0]], side=side)
                for i in range(rows)
            ]
        )
    out = np.empty((rows, v.shape[1]), np.int64)
    lib.scnerf_searchsorted(
        a, a.shape[0], a.shape[1], v, v.shape[0], v.shape[1], out, side == "left"
    )
    return out


def permutation_host(n: int, seed: int) -> np.ndarray:
    lib = load()
    if lib is None:
        return np.random.RandomState(seed % (2**32)).permutation(n)
    out = np.empty(n, np.int64)
    lib.scnerf_permutation(n, seed, out)
    return out


def gather_rows_host(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    data = np.ascontiguousarray(data, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    lib = load()
    if lib is None:
        return data[idx]
    out = np.empty((idx.shape[0], data.shape[1]), np.float32)
    lib.scnerf_gather_rows(data, data.shape[0], data.shape[1], idx, idx.shape[0], out)
    return out


def gather_pixels_host(images: np.ndarray, img_idx, px, py) -> np.ndarray:
    images = np.ascontiguousarray(images, np.float32)
    img_idx = np.ascontiguousarray(np.broadcast_to(img_idx, np.shape(px)), np.int64)
    px = np.ascontiguousarray(px, np.int64)
    py = np.ascontiguousarray(py, np.int64)
    lib = load()
    if lib is None:
        return images[img_idx, py, px]
    n, H, W, C = images.shape
    out = np.empty((px.shape[0], C), np.float32)
    lib.scnerf_gather_pixels(images, H, W, C, img_idx, px, py, px.shape[0], out)
    return out
