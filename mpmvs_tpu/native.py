"""ctypes bindings for the native host-runtime library (native/).

Provides the exact-sequential fusion (bit-faithful to the reference's
pixel-serial consumed-mask ordering) and a native Delaunay triangulation.
Both have pure-Python/JAX fallbacks (mpmvs_tpu.fusion, scipy); the native
paths are used when the library has been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libmpmvs_native.so")
_lib = None


class _CameraParams(ctypes.Structure):
    _fields_ = [("K", ctypes.c_float * 9), ("R", ctypes.c_float * 9),
                ("t", ctypes.c_float * 3)]


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mpmvs_fuse_exact.restype = ctypes.c_int64
        lib.mpmvs_delaunay.restype = ctypes.c_int64
        _lib = lib
    return _lib


def build(force: bool = False) -> bool:
    """Compile the native library in-tree (idempotent)."""
    import subprocess
    if not force and os.path.exists(_LIB_PATH):
        return True
    src_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return os.path.exists(_LIB_PATH)


def _cams_array(cameras) -> "ctypes.Array":
    K = np.asarray(cameras.K, np.float32)
    R = np.asarray(cameras.R, np.float32)
    t = np.asarray(cameras.t, np.float32)
    V = K.shape[0]
    arr = (_CameraParams * V)()
    for i in range(V):
        arr[i].K[:] = K[i].reshape(-1).tolist()
        arr[i].R[:] = R[i].reshape(-1).tolist()
        arr[i].t[:] = t[i].tolist()
    return arr


def fuse_exact(depths, normals, colors, cameras, scenes,
               use_dynamic: bool = True, sky_masks=None):
    """Reference-ordered sequential fusion. Same interface/result contract
    as mpmvs_tpu.fusion.run_fusion, but with the within-view pixel-serial
    mask semantics of the reference (RunFusion, PatchMatch.cpp:352-499)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    depths = np.ascontiguousarray(depths, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    colors = np.ascontiguousarray(colors, np.float32)
    V, H, W = depths.shape

    est = [s for s in scenes if s.estimate]
    refs = np.asarray([s.ref_id for s in est], np.int32)
    src_lists = [np.asarray(s.src_ids[1:], np.int32) for s in est]
    off = np.zeros(len(est) + 1, np.int32)
    off[1:] = np.cumsum([len(s) for s in src_lists])
    src_flat = (np.concatenate(src_lists) if src_lists
                else np.zeros(0, np.int32)).astype(np.int32)

    cap = V * H * W
    out_pts = np.empty((cap, 3), np.float32)
    out_nrm = np.empty((cap, 3), np.float32)
    out_col = np.empty((cap, 3), np.float32)
    sky_arr = None
    sky_ptr = None
    if sky_masks is not None:
        sky_arr = np.ascontiguousarray(sky_masks, np.uint8)
        sky_ptr = sky_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    pi = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n = lib.mpmvs_fuse_exact(
        p(depths), p(normals), p(colors), _cams_array(cameras),
        ctypes.c_int32(V), ctypes.c_int32(H), ctypes.c_int32(W),
        pi(src_flat), pi(off), ctypes.c_int32(len(est)), pi(refs),
        sky_ptr, ctypes.c_int32(1 if use_dynamic else 0),
        p(out_pts), p(out_nrm), p(out_col), ctypes.c_int64(cap))
    if n < 0:
        raise RuntimeError("native fusion capacity exceeded")
    return out_pts[:n].copy(), out_nrm[:n].copy(), out_col[:n].copy()


def delaunay(points: np.ndarray) -> np.ndarray:
    """(N, 2) -> (T, 3) triangle vertex indices via the native
    Bowyer-Watson implementation."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    pts = np.ascontiguousarray(points, np.float64)
    n = len(pts)
    cap = max(4 * n, 64)
    out = np.empty((cap, 3), np.int32)
    cnt = lib.mpmvs_delaunay(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(cap))
    if cnt < 0:
        raise RuntimeError("native delaunay capacity exceeded")
    return out[:cnt].copy()
