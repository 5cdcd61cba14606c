"""Native (C++) host-side runtime: kd-tree for eval metrics/preprocessing.

Auto-builds ``libnksr_native.so`` with make/g++ on first import (analog of
the reference's JIT extension loading, /root/reference/ext/__init__.py);
falls back to scipy cKDTree if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libnksr_native.so"
    srcs = list(_DIR.glob("*.cpp")) + [_DIR / "Makefile"]
    stale = so.exists() and any(
        s.stat().st_mtime > so.stat().st_mtime for s in srcs)
    if not so.exists() or stale:
        try:
            # make is dependency-checked: a fresh .so is a no-op
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not so.exists():
                return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_query.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.keysearch_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.sorted_join_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    lib.radix_argsort_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.radix_sort_unique_i64.restype = ctypes.c_int64
    lib.radix_sort_unique_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.merge_unique_i64.restype = ctypes.c_int64
    lib.merge_unique_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64)]
    lib.stencil_join_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.flat_cells_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    if hasattr(lib, "pack_floor_keys_f32"):
        lib.pack_floor_keys_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int64)]
        lib.half_keys_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.unpack_keys_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.minmax_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
    if hasattr(lib, "raycast_inside"):
        lib.raycast_inside.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32]
    _LIB = lib
    return _LIB


def sorted_join(sorted_keys: np.ndarray,
                sorted_queries: np.ndarray) -> np.ndarray:
    """Positions of sorted queries in sorted keys (-1 absent); O(n+m)."""
    lib = _load()
    keys = np.ascontiguousarray(sorted_keys, np.int64)
    q = np.ascontiguousarray(sorted_queries, np.int64)
    if lib is None:
        pos = np.searchsorted(keys, q)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        found = (len(keys) > 0) & (keys[pos_c] == q)
        return np.where(found, pos_c, -1).astype(np.int32)
    out = np.empty(q.shape[0], np.int32)
    lib.sorted_join_i64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), keys.shape[0],
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), q.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def stencil_join(sorted_keys: np.ndarray, sorted_base: np.ndarray,
                 deltas: np.ndarray, cap: Optional[int] = None
                 ) -> np.ndarray:
    """(len(base), K) positions of base+delta_k in sorted keys, -1 if
    absent or >= cap — K monotone merge cursors in one native pass."""
    lib = _load()
    keys = np.ascontiguousarray(sorted_keys, np.int64)
    base = np.ascontiguousarray(sorted_base, np.int64)
    d = np.ascontiguousarray(deltas, np.int64)
    capv = (1 << 31) - 1 if cap is None else int(cap)
    if lib is None:
        out = np.empty((base.shape[0], d.shape[0]), np.int32)
        for k in range(d.shape[0]):
            col = sorted_join(keys, base + d[k])
            out[:, k] = np.where(col < capv, col, -1)
        return out
    out = np.empty((base.shape[0], d.shape[0]), np.int32)
    lib.stencil_join_i64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), keys.shape[0],
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), base.shape[0],
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), d.shape[0],
        capv, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def keysearch(sorted_keys: np.ndarray, queries: np.ndarray,
              n_threads: int = 0) -> np.ndarray:
    """Parallel binary search: index of each query in sorted int64 keys
    (-1 if absent).  Falls back to numpy when the native lib is absent."""
    lib = _load()
    keys = np.ascontiguousarray(sorted_keys, np.int64)
    q = np.ascontiguousarray(queries, np.int64)
    if lib is None:
        pos = np.searchsorted(keys, q)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        found = (len(keys) > 0) & (keys[pos_c] == q)
        return np.where(found, pos_c, -1).astype(np.int32)
    out = np.empty(q.shape[0], np.int32)
    lib.keysearch_i64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), keys.shape[0],
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), q.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    return out


def radix_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable ascending argsort of int64 keys (radix; numpy fallback)."""
    lib = _load()
    k = np.ascontiguousarray(keys, np.int64)
    if lib is None:
        return np.argsort(k, kind="stable")
    out = np.empty(k.shape[0], np.int64)
    lib.radix_argsort_i64(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def sort_unique(keys: np.ndarray) -> np.ndarray:
    """Sorted unique int64 keys (radix; numpy fallback)."""
    lib = _load()
    k = np.ascontiguousarray(keys, np.int64).copy()
    if lib is None:
        return np.unique(k)
    m = lib.radix_sort_unique_i64(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k.shape[0])
    return k[:m]


def merge_unique(sorted_base: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """Sorted unique union of {sorted_base + d for d in deltas}.

    The k shifted copies of a sorted array are each sorted, so the union
    is a k-way merge — no sort (the corner/child-expansion hot path of
    core/host_build.py)."""
    lib = _load()
    base = np.ascontiguousarray(sorted_base, np.int64)
    d = np.ascontiguousarray(deltas, np.int64)
    if lib is None:
        return np.unique((base[:, None] + d[None]).ravel())
    out = np.empty(base.shape[0] * d.shape[0], np.int64)
    m = lib.merge_unique_i64(
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), base.shape[0],
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), d.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:m]


def pack_floor_keys(xyz: np.ndarray, voxel_size: float
                    ) -> "np.ndarray | None":
    """Fused ``pack64(floor(xyz / voxel_size))`` (one native pass;
    bit-identical to the numpy form — single-precision division +
    floorf).  Returns None when the native lib lacks the op."""
    lib = _load()
    if lib is None or not hasattr(lib, "pack_floor_keys_f32"):
        return None
    x = np.ascontiguousarray(xyz, np.float32)
    out = np.empty(x.shape[0], np.int64)
    lib.pack_floor_keys_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[0],
        ctypes.c_float(voxel_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def half_keys(keys: np.ndarray) -> "np.ndarray | None":
    """Fused per-component halving of packed keys (one native pass).
    Returns None when the native lib lacks the op."""
    lib = _load()
    if lib is None or not hasattr(lib, "half_keys_i64"):
        return None
    k = np.ascontiguousarray(keys, np.int64)
    out = np.empty(k.shape[0], np.int64)
    lib.half_keys_i64(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def unpack_keys(keys: np.ndarray) -> "np.ndarray | None":
    """Packed int64 keys -> (n, 3) int32 coords (one native pass).
    Returns None when the native lib lacks the op."""
    lib = _load()
    if lib is None or not hasattr(lib, "unpack_keys_i64"):
        return None
    k = np.ascontiguousarray(keys, np.int64)
    out = np.empty((k.shape[0], 3), np.int32)
    lib.unpack_keys_i64(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def coord_minmax(coords: np.ndarray) -> "tuple | None":
    """Componentwise (min, max) of (n, 3) int32 coords in one pass.
    Returns None when the native lib lacks the op or n == 0."""
    lib = _load()
    c = np.ascontiguousarray(coords, np.int32)
    if (lib is None or not hasattr(lib, "minmax_i32")
            or c.shape[0] == 0):
        return None
    out = np.empty(6, np.int32)
    lib.minmax_i32(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), c.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out[:3].copy(), out[3:].copy()


def flat_cells(coords: np.ndarray, shift: int, origin, dims,
               out: "np.ndarray | None" = None) -> np.ndarray:
    """Fused lattice flat-cell pass (plan_lattice's flat_cell): shift
    (n, 3) integer coords by ``shift`` (>=0: <<, <0: arithmetic >>),
    subtract ``origin``, bounds-check against ``dims`` and emit the
    row-major flat index (0 outside).  One native pass, no temporaries;
    ``out`` may be a preallocated int32 view to write into."""
    lib = _load()
    c = np.ascontiguousarray(coords, np.int64)
    n = c.shape[0]
    ox, oy, oz = (int(origin[i]) for i in range(3))
    X, Y, Z = (int(dims[i]) for i in range(3))
    if lib is None:
        cd = (c << shift) if shift >= 0 else (c >> -shift)
        loc = cd - np.array([ox, oy, oz], np.int64)
        ok = ((loc >= 0) & (loc < np.array([X, Y, Z]))).all(-1)
        f = (loc[:, 0] * Y + loc[:, 1]) * Z + loc[:, 2]
        r = np.where(ok, f, 0).astype(np.int32)
        if out is not None:
            out[:n] = r
            return out
        return r
    if out is None:
        out = np.empty(n, np.int32)
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.int32
    lib.flat_cells_i64(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, shift,
        ox, oy, oz, X, Y, Z,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


class KDTree:
    """CPU kd-tree (native if available, scipy fallback otherwise)."""

    def __init__(self, points: np.ndarray):
        self._pts = np.ascontiguousarray(points, np.float32)
        lib = _load()
        self._lib = lib
        self._scipy = None
        if lib is not None:
            self._h = lib.kdtree_build(
                self._pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._pts.shape[0])
        else:
            from scipy.spatial import cKDTree
            self._scipy = cKDTree(self._pts)
            self._h = None

    def query(self, q: np.ndarray, k: int = 1,
              n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (dist (m, k) float32, idx (m, k) int32); squeezed when
        k == 1 stays 2-D for predictability."""
        q = np.ascontiguousarray(q, np.float32)
        m = q.shape[0]
        if self._lib is not None:
            d2 = np.empty((m, k), np.float32)
            idx = np.empty((m, k), np.int32)
            self._lib.kdtree_query(
                self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                m, k, d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n_threads)
            return np.sqrt(d2), idx
        d, i = self._scipy.query(q, k=k)
        d = d.reshape(m, k).astype(np.float32)
        i = i.reshape(m, k).astype(np.int32)
        return d, i

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.kdtree_free(self._h)
            self._h = None


def raycast_inside(verts: np.ndarray, faces: np.ndarray,
                   queries: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Occupancy of query points in a (near-)watertight mesh via +z ray
    parity, grid-accelerated (native/raycast.cpp — counterpart of the
    reference's Open3D ray-cast IoU, /root/reference/metrics.py:159-188).
    Returns (n_q,) bool."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    q = np.ascontiguousarray(queries, np.float32)
    if lib is not None and hasattr(lib, "raycast_inside"):
        out = np.empty(q.shape[0], np.uint8)
        lib.raycast_inside(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), f.shape[0],
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), q.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
        return out.astype(bool)
    # numpy fallback: same +z parity, batched over queries, half-open
    # edge rule via strict-positive/strict-negative orientation classes
    if f.shape[0] == 0 or q.shape[0] == 0:
        return np.zeros(q.shape[0], bool)
    tri = v[f].astype(np.float64)              # (F, 3, 3)
    inside = np.zeros(q.shape[0], bool)
    step = max(1, int(2e7 // max(f.shape[0], 1)))
    for s in range(0, q.shape[0], step):
        qq = q[s:s + step].astype(np.float64)  # (B, 3)
        px = qq[:, None, 0]
        py = qq[:, None, 1]
        a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
        e0 = (b[:, 0] - a[:, 0]) * (py - a[:, 1]) \
            - (b[:, 1] - a[:, 1]) * (px - a[:, 0])
        e1 = (c[:, 0] - b[:, 0]) * (py - b[:, 1]) \
            - (c[:, 1] - b[:, 1]) * (px - b[:, 0])
        e2 = (a[:, 0] - c[:, 0]) * (py - c[:, 1]) \
            - (a[:, 1] - c[:, 1]) * (px - c[:, 0])
        hit = ((e0 > 0) & (e1 > 0) & (e2 > 0)) | \
              ((e0 < 0) & (e1 < 0) & (e2 < 0))
        area = e0 + e1 + e2
        safe = np.where(area == 0, 1.0, area)
        z = (e1 * a[:, 2] + e2 * b[:, 2] + e0 * c[:, 2]) / safe
        cross = hit & (area != 0) & (z > qq[:, 2:3])
        inside[s:s + step] = (cross.sum(1) & 1).astype(bool)
    return inside


def using_native() -> bool:
    return _load() is not None
