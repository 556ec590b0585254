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
    lib.gcl_reader_create.restype = ctypes.c_void_p
    lib.gcl_reader_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.gcl_reader_destroy.restype = None
    lib.gcl_reader_destroy.argtypes = [ctypes.c_void_p]
    lib.gcl_reader_submit.restype = None
    lib.gcl_reader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.gcl_reader_fetch.restype = ctypes.c_long
    lib.gcl_reader_fetch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long]
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


class ScanPrefetcher:
    """Asynchronous scan-file prefetcher over the native thread pool
    (scan_reader.cpp) — the IO role torch's native DataLoader core plays
    for the reference. Submit paths ahead of time; `fetch` returns the
    float payload, blocking only if the read is still in flight.
    Falls back to synchronous numpy reads without the .so.
    """

    def __init__(self, n_threads: int = 4, cache_entries: int = 64):
        self._lib = _ensure_built()
        self._h = None
        self._n_threads = n_threads
        self._cache_entries = cache_entries
        if self._lib is not None:
            self._h = self._lib.gcl_reader_create(n_threads,
                                                  cache_entries)
        self._pid = os.getpid()
        self._submitted: set = set()

    def __del__(self, _getpid=os.getpid):
        # never touch a handle inherited across fork: the worker threads
        # (and any locked mutex) do not survive into the child
        # (_getpid bound at class definition: os may be gone at shutdown)
        try:
            if (self._h is not None and self._lib is not None
                    and _getpid() == self._pid):
                self._lib.gcl_reader_destroy(self._h)
        except Exception:
            pass

    def _check_fork(self):
        if self._h is not None and os.getpid() != self._pid:
            # forked child: the inherited pool has no live threads —
            # abandon the handle (leaks the parent's table copy, but is
            # deadlock-safe) and build a fresh pool in this process
            self._h = self._lib.gcl_reader_create(self._n_threads,
                                                  self._cache_entries)
            self._pid = os.getpid()
            self._submitted = set()

    def submit(self, path: str):
        if self._h is None:
            return
        self._check_fork()
        if path not in self._submitted:
            self._submitted.add(path)
            self._lib.gcl_reader_submit(self._h, path.encode())

    def fetch(self, path: str, max_floats: int = 1 << 24) -> np.ndarray:
        """Raw float32 payload of `path` (consumes the cached entry);
        reads synchronously when not prefetched / no native lib."""
        self._check_fork()
        if self._h is not None and path in self._submitted:
            self._submitted.discard(path)
            buf = np.empty(max_floats, np.float32)
            n = self._lib.gcl_reader_fetch(self._h, path.encode(),
                                           _fp(buf), max_floats)
            if n >= 0:
                return buf[:n].copy()
        return np.fromfile(path, dtype=np.float32)


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
