"""Native (C++) host-side geometry kernels with ctypes bindings.

Compiled lazily on first use (g++ -O3 -shared); every entry point has a
NumPy fallback so the package works without a toolchain. See
geometry_kernels.cpp for provenance notes against the reference's C++
components.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import sys
import tempfile

import numpy as np

__all__ = ["get_lib", "orient3d", "orient3d_batch", "parse_stl_records",
           "tri_cell_overlap", "native_available"]

_LIB = None
_TRIED = False


def _build_library():
    # The output name is keyed to the source hash + host arch (never an
    # mtime check): a stale or foreign-machine binary can't be picked up,
    # and -march=native is avoided so the .so stays portable per-arch.
    src = os.path.join(os.path.dirname(__file__), "geometry_kernels.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    out = os.path.join(
        os.path.dirname(__file__),
        f"_geometry_kernels_{sys.implementation.cache_tag}"
        f"_{platform.machine()}_{digest}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        try:
            path = _build_library()
            lib = ctypes.CDLL(path)
            dp = ctypes.POINTER(ctypes.c_double)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.cutfemx_orient2d.restype = ctypes.c_double
            lib.cutfemx_orient2d.argtypes = [dp, dp, dp]
            lib.cutfemx_orient3d.restype = ctypes.c_double
            lib.cutfemx_orient3d.argtypes = [dp, dp, dp, dp]
            lib.cutfemx_orient3d_batch.restype = None
            lib.cutfemx_orient3d_batch.argtypes = [dp, dp, dp, dp,
                                                   ctypes.c_int64, dp]
            lib.cutfemx_parse_stl_records.restype = None
            lib.cutfemx_parse_stl_records.argtypes = [u8p, ctypes.c_int64,
                                                      dp, dp]
            lib.cutfemx_tri_cell_overlap.restype = None
            lib.cutfemx_tri_cell_overlap.argtypes = [dp, dp, ctypes.c_int64,
                                                     ctypes.c_int, u8p]
            lib.cutfemx_seg_tri_isect.restype = ctypes.c_int
            lib.cutfemx_seg_tri_isect.argtypes = [dp, dp, dp, dp, dp]
            lib.cutfemx_tri_tri_isect.restype = ctypes.c_int
            lib.cutfemx_tri_tri_isect.argtypes = [dp, dp]
            lib.cutfemx_seg_tri_isect_batch.restype = None
            lib.cutfemx_seg_tri_isect_batch.argtypes = [dp, dp,
                                                        ctypes.c_int64, u8p]
            lib.cutfemx_tri_tri_isect_batch.restype = None
            lib.cutfemx_tri_tri_isect_batch.argtypes = [dp, dp,
                                                        ctypes.c_int64, u8p]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def native_available():
    return get_lib() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def orient3d(a, b, c, d):
    """Robust orientation of point d against plane abc."""
    lib = get_lib()
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    c = np.ascontiguousarray(c, dtype=np.float64)
    d = np.ascontiguousarray(d, dtype=np.float64)
    if lib is not None:
        return float(lib.cutfemx_orient3d(_dp(a), _dp(b), _dp(c), _dp(d)))
    return float(np.linalg.det(np.stack([a - d, b - d, c - d])))


def orient3d_batch(pa, pb, pc, pd):
    lib = get_lib()
    pa = np.ascontiguousarray(pa, dtype=np.float64)
    pb = np.ascontiguousarray(pb, dtype=np.float64)
    pc = np.ascontiguousarray(pc, dtype=np.float64)
    pd = np.ascontiguousarray(pd, dtype=np.float64)
    n = pa.shape[0]
    if lib is not None:
        out = np.empty(n)
        lib.cutfemx_orient3d_batch(_dp(pa), _dp(pb), _dp(pc), _dp(pd),
                                   n, _dp(out))
        return out
    return np.linalg.det(np.stack([pa - pd, pb - pd, pc - pd], axis=1))


def parse_stl_records(raw):
    """(n*50,) uint8 records -> (normals (n,3), verts (n,3,3)) float64."""
    lib = get_lib()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    n = len(raw) // 50
    if lib is not None:
        normals = np.empty((n, 3))
        verts = np.empty((n, 3, 3))
        lib.cutfemx_parse_stl_records(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            _dp(normals), _dp(verts))
        return normals, verts
    rec = raw[:n * 50].reshape(n, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(n, 12)
    return (floats[:, :3].astype(np.float64),
            floats[:, 3:].reshape(n, 3, 3).astype(np.float64))


def tri_cell_overlap(cells, tris):
    """Separating-axis overlap flags. cells: (m, nv, 3); tris: (m, 3, 3)."""
    lib = get_lib()
    cells = np.ascontiguousarray(cells, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    m, nv = cells.shape[0], cells.shape[1]
    if lib is not None and m:
        out = np.empty(m, dtype=np.uint8)
        lib.cutfemx_tri_cell_overlap(
            _dp(cells), _dp(tris), m, nv,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)
    return None  # caller falls back to the NumPy path


def tri_tri_isect_batch(t1, t2):
    """Exact (predicate-only) closed triangle-triangle intersection flags.
    t1, t2: (m, 3, 3). Returns bool (m,) or None when the native library
    is unavailable (callers fall back to a conservative test)."""
    lib = get_lib()
    if lib is None:
        return None
    t1 = np.ascontiguousarray(t1, dtype=np.float64)
    t2 = np.ascontiguousarray(t2, dtype=np.float64)
    m = t1.shape[0]
    out = np.empty(max(m, 1), dtype=np.uint8)
    if m:
        lib.cutfemx_tri_tri_isect_batch(
            _dp(t1), _dp(t2), m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:m].astype(bool)


def seg_tri_isect_batch(segs, tris):
    """Exact closed segment-triangle intersection flags. segs: (m, 2, 3);
    tris: (m, 3, 3). Returns bool (m,) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    segs = np.ascontiguousarray(segs, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    m = segs.shape[0]
    out = np.empty(max(m, 1), dtype=np.uint8)
    if m:
        lib.cutfemx_seg_tri_isect_batch(
            _dp(segs), _dp(tris), m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:m].astype(bool)
