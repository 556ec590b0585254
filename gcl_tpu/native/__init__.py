"""ctypes bindings for the native host geometry library, with numpy
fallbacks when the .so has not been built (run `make -C gcl_tpu/native`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgclnative.so")
_lib = None


def _ensure_built():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gcl_voxelize.restype = ctypes.c_int
    lib.gcl_voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64]
    lib.gcl_radius_knn.restype = None
    lib.gcl_radius_knn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8)]
    lib.gcl_kernel_map.restype = None
    lib.gcl_kernel_map.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def available() -> bool:
    return _ensure_built() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def voxelize(points: np.ndarray, voxel_size: float):
    """Unique voxels + representative point indices (first occurrence).
    Returns (coords int32[n,3], rep int32[n])."""
    pts = np.ascontiguousarray(points, np.float32)
    lib = _ensure_built()
    if lib is None:  # numpy fallback
        coords = np.floor(pts / voxel_size).astype(np.int32)
        _, sel = np.unique(coords, axis=0, return_index=True)
        sel = np.sort(sel)
        return coords[sel], sel.astype(np.int32)
    n = len(pts)
    out_c = np.empty((n, 3), np.int32)
    out_r = np.empty(n, np.int32)
    cnt = lib.gcl_voxelize(_fp(pts), n, voxel_size, _ip(out_c), _ip(out_r),
                           n)
    return out_c[:cnt].copy(), out_r[:cnt].copy()


def radius_knn(queries: np.ndarray, targets: np.ndarray, radius: float,
               k: int):
    """K nearest within radius (sorted). Returns (idx int32[nq,k],
    hit bool[nq,k])."""
    q = np.ascontiguousarray(queries, np.float32)
    t = np.ascontiguousarray(targets, np.float32)
    lib = _ensure_built()
    if lib is None:
        from scipy.spatial import cKDTree

        tree = cKDTree(t)
        d, idx = tree.query(q, k=k, distance_upper_bound=radius)
        if k == 1:
            d, idx = d[:, None], idx[:, None]
        hit = np.isfinite(d)
        idx = np.where(hit, idx, 0).astype(np.int32)
        return idx, hit
    nq = len(q)
    idx = np.empty((nq, k), np.int32)
    hit = np.empty((nq, k), np.uint8)
    lib.gcl_radius_knn(_fp(q), nq, _fp(t), len(t), radius, k, _ip(idx),
                       hit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return idx, hit.astype(bool)


def kernel_map(in_coords: np.ndarray, out_coords: np.ndarray,
               offsets: np.ndarray) -> np.ndarray:
    """Host kernel-map builder: kmap[o, i] = row of in_coords at
    out_coords[i] + offsets[o], or -1 (single batch item)."""
    ic = np.ascontiguousarray(in_coords, np.int32)
    oc = np.ascontiguousarray(out_coords, np.int32)
    off = np.ascontiguousarray(offsets, np.int32)
    lib = _ensure_built()
    if lib is None:
        table = {tuple(c): i for i, c in enumerate(map(tuple, ic))}
        km = np.full((len(off), len(oc)), -1, np.int32)
        for o, d in enumerate(off):
            for i, c in enumerate(oc):
                km[o, i] = table.get((c[0] + d[0], c[1] + d[1],
                                      c[2] + d[2]), -1)
        return km
    km = np.empty((len(off), len(oc)), np.int32)
    lib.gcl_kernel_map(_ip(ic), len(ic), _ip(oc), len(oc), _ip(off),
                       len(off), _ip(km))
    return km
