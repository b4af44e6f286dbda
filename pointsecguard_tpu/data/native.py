"""ctypes bindings for the native host kernels (native/pointsec_native.cpp).

Provides the same two primitives the reference implemented natively
(nanoflann batched kNN, `knn_.cxx:21-271`; hash-grid subsampling,
`grid_subsampling.cpp:5-106`) with a pure-python fallback so the package
works without the build step. ``build()`` compiles the library with make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpointsec_native.so"))
_lib = None


def build(verbose: bool = False) -> bool:
    """Compile the native library (g++ -fopenmp). Returns success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=not verbose,
        )
        return _load() is not None
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.psg_knn_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_float),
    ]
    lib.psg_grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.psg_grid_subsample.restype = ctypes.c_int
    lib.psg_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def knn_batch(
    support: np.ndarray, query: np.ndarray, k: int, *, return_dist: bool = False
):
    """Exact batched kNN: support [B,N,3], query [B,M,3] → idx [B,M,k] int64
    (and squared distances if requested). Native KD-tree when built,
    scipy cKDTree fallback otherwise."""
    support = np.ascontiguousarray(support, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    B, N, _ = support.shape
    M = query.shape[1]
    if k > N:
        # scipy's query would silently fill missing neighbors with
        # index == N (out of range) and distance inf; the native path
        # has no defined behavior either — refuse loudly on both
        raise ValueError(f"k={k} exceeds the {N} support points")
    lib = _load()
    if lib is not None:
        idx = np.empty((B, M, k), np.int64)
        d2 = np.empty((B, M, k), np.float32) if return_dist else None
        lib.psg_knn_batch(
            _fptr(support), B, N, _fptr(query), M, k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            _fptr(d2) if return_dist else None,
        )
        return (idx, d2) if return_dist else idx
    # fallback: scipy per cloud
    from scipy.spatial import cKDTree

    idx = np.empty((B, M, k), np.int64)
    d2 = np.empty((B, M, k), np.float32)
    for b in range(B):
        d, i = cKDTree(support[b]).query(query[b], k=k)
        if k == 1:
            d, i = d[:, None], i[:, None]
        idx[b], d2[b] = i, (d * d).astype(np.float32)
    return (idx, d2) if return_dist else idx


def grid_subsample_native(
    points: np.ndarray,
    features: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    sample_dl: float = 0.1,
    num_classes: int = 0,
):
    """Native voxel-grid barycenter subsampling; falls back to the numpy
    implementation in ``pointsecguard_tpu.ops.subsample``."""
    lib = _load()
    if lib is None:
        from pointsecguard_tpu.ops.subsample import grid_subsample

        return grid_subsample(
            points, features, labels, sample_dl, num_classes or None
        )
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    fdim = 0 if features is None else features.shape[1]
    if features is not None:
        features = np.ascontiguousarray(features, np.float32)
    if labels is not None:
        labels = np.ascontiguousarray(labels, np.int32)
        if not num_classes:
            num_classes = int(labels.max()) + 1
    out_p = np.empty((n, 3), np.float32)
    out_f = np.empty((n, fdim), np.float32) if features is not None else None
    out_l = np.empty(n, np.int32) if labels is not None else None
    n_cells = lib.psg_grid_subsample(
        _fptr(points), n,
        _fptr(features) if features is not None else None, fdim,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)) if labels is not None else None,
        num_classes, sample_dl,
        _fptr(out_p),
        _fptr(out_f) if out_f is not None else None,
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int)) if out_l is not None else None,
    )
    result = [out_p[:n_cells]]
    if features is not None:
        result.append(out_f[:n_cells])
    if labels is not None:
        result.append(out_l[:n_cells])
    return tuple(result) if len(result) > 1 else result[0]
