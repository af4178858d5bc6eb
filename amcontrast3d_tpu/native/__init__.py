"""Native (C++) host-side point-cloud ops, loaded via ctypes.

↔ the reference's CPU extensions (``cpp/subsampling`` grid subsampling with
voxel barycenters + majority labels; the vendored-nanoflann KD-tree kNN under
``dataset/semantic_kitti/utils/nearest_neighbors``).  The shared library is
compiled on first use with g++ -O3 and cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "pointcloud_host.cpp")
_SO = os.path.join(os.path.dirname(__file__), "src", "libpointcloud_host.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.check_call(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", _SO])
        lib = ctypes.CDLL(_SO)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.grid_subsample.restype = ctypes.c_int64
        lib.grid_subsample.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, i32p, ctypes.c_int64,
            ctypes.c_float, f32p, f32p, i32p]
        lib.kdtree_knn.restype = None
        lib.kdtree_knn.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, i64p, f32p]
        _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grid_subsampling(points: np.ndarray, features: Optional[np.ndarray] = None,
                     labels: Optional[np.ndarray] = None,
                     sampleDl: float = 0.1):
    """Barycenter voxel-grid subsample (↔ cpp/subsampling wrapper.compute).

    points (n, 3) float32; features (n, f) float32; labels (n,) or (n, l)
    int32.  Returns subsampled arrays in the same shapes.
    """
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    feat = None
    if features is not None:
        feat = np.ascontiguousarray(features, np.float32)
        fdim = feat.shape[1]
    else:
        fdim = 0
    lab = None
    squeeze_labels = False
    if labels is not None:
        lab = np.asarray(labels)
        if lab.ndim == 1:
            lab = lab[:, None]
            squeeze_labels = True
        lab = np.ascontiguousarray(lab, np.int32)
        ldim = lab.shape[1]
    else:
        ldim = 0

    out_points = np.empty((n, 3), np.float32)
    out_feat = np.empty((n, max(fdim, 1)), np.float32)
    out_lab = np.empty((n, max(ldim, 1)), np.int32)
    m = lib.grid_subsample(
        _fptr(points), n,
        _fptr(feat) if feat is not None else None, fdim,
        _i32ptr(lab) if lab is not None else None, ldim,
        ctypes.c_float(sampleDl),
        _fptr(out_points),
        _fptr(out_feat), _i32ptr(out_lab))
    result = [out_points[:m].copy()]
    if features is not None:
        result.append(out_feat[:m, :fdim].copy())
    if labels is not None:
        ol = out_lab[:m, :ldim].copy()
        result.append(ol[:, 0] if squeeze_labels else ol)
    return result[0] if len(result) == 1 else tuple(result)


def kdtree_knn(support: np.ndarray, queries: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact CPU k-NN: (idx (m, k) int64, dist² (m, k) float32) ascending."""
    lib = _load()
    support = np.ascontiguousarray(support, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    n, dim = support.shape
    m = len(queries)
    out_idx = np.empty((m, k), np.int64)
    out_d2 = np.empty((m, k), np.float32)
    lib.kdtree_knn(_fptr(support), n, _fptr(queries), m, dim, k,
                   out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   _fptr(out_d2))
    return out_idx, out_d2
