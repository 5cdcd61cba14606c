"""Host-side (numpy) construction of SVH structures and index tables.

Why this exists: the device pipeline is a static-shape XLA program, and
every *structure* operation (voxel dedup, membership lookup) is a sort —
but XLA:TPU sort compile time grows linearly with size and ~4x with
operand count (measured: a 1M-row 4-operand sort costs ~105 s of compile),
so graphs with multi-million-row sorts take many minutes to build.  The
host, meanwhile, dedups/searches int64 keys at memory speed via numpy.

So for inference we split the work by what each side is good at:
  * host: build the hierarchy + every index table (neighbor/child tables,
    basis-support indices for solve rows and query points) — all
    non-differentiable integer work;
  * device: one sort-free jit of pure dense math (convs, interpolator
    MLPs, PCG) that compiles in seconds and runs on the MXU.

The in-graph builders (core/svh.py) remain the path for fully-traced
training steps and CPU tests; results agree exactly (same convention).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from . import coords as C
from .grid import SparseGrid
from .svh import SparseFeatureHierarchy

_OFFS2 = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                  -1).reshape(8, 3).astype(np.int64)


def pack64(coords: np.ndarray) -> np.ndarray:
    c = coords.astype(np.int64) + (1 << 20)
    return (c[..., 0] << 42) | (c[..., 1] << 21) | c[..., 2]


def unpack64(keys: np.ndarray) -> np.ndarray:
    if keys.ndim == 1:
        from ..native import unpack_keys
        out = unpack_keys(keys)
        if out is not None:
            return out
    i = (keys >> 42) - (1 << 20)
    j = ((keys >> 21) & ((1 << 21) - 1)) - (1 << 20)
    k = (keys & ((1 << 21) - 1)) - (1 << 20)
    return np.stack([i, j, k], -1).astype(np.int32)


def pack_floor64(xyz: np.ndarray, voxel_size: float) -> np.ndarray:
    """``pack64(floor(xyz / voxel_size))`` — fused native pass when
    available (bit-identical: f32 division + floor either way)."""
    from ..native import pack_floor_keys
    out = pack_floor_keys(xyz, voxel_size)
    if out is not None:
        return out
    return pack64(np.floor(xyz / voxel_size).astype(np.int64))


class HostGrid(NamedTuple):
    coords: np.ndarray   # (n, 3) int32, sorted by our 2-word key order
    keys: np.ndarray     # (n,) int64 sorted
    voxel_size: float


def _sorted_unique(coords: np.ndarray) -> HostGrid:
    keys = np.unique(pack64(coords))
    return HostGrid(coords=unpack64(keys), keys=keys, voxel_size=0.0)


def lookup(grid: HostGrid, coords: np.ndarray) -> np.ndarray:
    """Index of each coord in the sorted grid, -1 if absent.

    Uses the multithreaded native key search when available (numpy's
    searchsorted is single-threaded and dominates table builds at
    multi-million-point scale)."""
    from ..native import keysearch
    return keysearch(grid.keys, pack64(coords))


def build_splat_grids(xyz: np.ndarray, voxel_size: float,
                      depth: int) -> List[HostGrid]:
    """Point-splat hierarchy (same convention as SVH.build_point_splatting:
    the 8 voxel centers around each point, per level)."""
    return build_splat_grids_ex(xyz, voxel_size, depth)[0]


def _half_keys(keys: np.ndarray) -> np.ndarray:
    """pack64(c) -> pack64(c >> 1) per component (arithmetic shift =
    floor for negatives).  NOT order-preserving in general — halving a
    sorted array yields a merge of 8 sorted runs (one per parity class
    of (i&1, j&1, k&1)), so callers re-sort with a stable nearly-sorted
    pass, which is ~3x cheaper than a fresh radix_argsort."""
    from ..native import half_keys
    out = half_keys(keys)
    if out is not None:
        return out
    b = np.int64(1 << 20)
    m = np.int64((1 << 21) - 1)
    i = (keys >> 42) - b
    j = ((keys >> 21) & m) - b
    k = (keys & m) - b
    return (((i >> 1) + b) << 42) | (((j >> 1) + b) << 21) | ((k >> 1) + b)


def build_splat_grids_ex(xyz: np.ndarray, voxel_size: float, depth: int):
    """Splat hierarchy + per-level sorted point-base keys.

    ONE radix sort total: the N point-base keys are sorted at the
    finest level; every coarser level's keys are derived by the
    per-component halving ``_half_keys`` (cell_d = cell_0 >> d — the
    same exact-nesting convention plan_lattice relies on), re-sorted by
    a cheap stable pass over the 8 near-sorted parity runs, then
    deduped and corner-expanded by the 8-way linear merge.  The
    per-level sorted base keys + per-level point order are returned
    for reuse by ``support_indices``.
    """
    from ..native import merge_unique, radix_argsort

    grids, orders = [], []
    deltas = np.array([_offset_delta(o) for o in _OFFS2], np.int64)
    base = pack_floor64(xyz, voxel_size)
    order = radix_argsort(base)
    sb = base[order]
    for d in range(depth):
        vs = voxel_size * (2.0 ** d)
        if d > 0:
            h = _half_keys(sb)
            rep = np.argsort(h, kind="stable")
            sb = h[rep]
            order = order[rep]
        if len(sb):
            first = np.concatenate([[True], sb[1:] != sb[:-1]])
            ub = sb[first]
        else:
            ub = sb
        # corner keys by linear packing: pack64(c + off) = key + delta,
        # and each shifted copy of the sorted bases is sorted -> the
        # corner set is an 8-way merge, no sort
        keys = merge_unique(ub, deltas)
        grids.append(HostGrid(coords=unpack64(keys), keys=keys,
                              voxel_size=vs))
        orders.append((sb, order))
    return grids, orders


def build_adaptive_grids(xyz: np.ndarray, normal: np.ndarray,
                         voxel_size: float, depth: int, tau: float = 0.1,
                         adaptive_depth: int = 1,
                         splat=None) -> List[HostGrid]:
    """Host counterpart of SVH.build_adaptive_normal_variation
    (core/svh.py; reference contract models/nksr_net.py:175-179):
    levels >= adaptive_depth-1 are full point splats; finer levels keep a
    voxel only where its parent's normal variation
    ``max_p (1 - n_p . nbar)`` exceeds tau.
    """
    from ..native import merge_unique

    grids: List[Optional[HostGrid]] = [None] * depth
    if splat is None:
        splat = build_splat_grids_ex(xyz, voxel_size, depth)
    splat, orders = splat
    for d in range(max(adaptive_depth - 1, 0), depth):
        grids[d] = splat[d]
    deltas = np.array([_offset_delta(o) for o in _OFFS2], np.int64)
    for d in range(adaptive_depth - 2, -1, -1):
        parent = grids[d + 1]
        pvs = parent.voxel_size
        # nearest parent voxel center per point (round = node-centered)
        pcell = pack64(np.round(xyz / pvs).astype(np.int64))
        pidx = keys_lookup(parent, pcell)
        ok = pidx >= 0
        seg = pidx[ok]
        npar = len(parent.keys)
        nn = normal[ok]
        nsum = np.stack([np.bincount(seg, weights=nn[:, c],
                                     minlength=npar) for c in range(3)], 1)
        nbar = nsum / (np.linalg.norm(nsum, axis=1, keepdims=True) + 1e-6)
        dev = 1.0 - np.sum(nn * nbar[seg], axis=1)
        sigma = np.zeros(npar, np.float64)
        np.maximum.at(sigma, seg, dev)
        cnt = np.bincount(seg, minlength=npar)
        refine = (sigma > tau) & (cnt > 0)
        # candidate voxels at level d: splat corners whose parent refines
        vs = voxel_size * (2.0 ** d)
        sb, order = orders[d]
        ub = sb[np.concatenate([[True], sb[1:] != sb[:-1]])] if len(sb) \
            else sb
        corners = merge_unique(ub, deltas)
        cpar = pack64(np.floor_divide(unpack64(corners).astype(np.int64),
                                      2))
        cpi = keys_lookup(parent, cpar)
        keep = (cpi >= 0) & np.take(refine, np.clip(cpi, 0, None))
        keys = corners[keep]
        grids[d] = HostGrid(coords=unpack64(keys), keys=keys,
                            voxel_size=vs)
    return grids


def to_device_grid(g: HostGrid, cap: int) -> SparseGrid:
    """Upload one host grid as a capacity-padded device grid."""
    import jax.numpy as jnp
    n = min(len(g.keys), cap)
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = g.coords[:n]
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    ci = g.coords[:n].astype(np.int64) + (1 << 15)
    hi[:n] = ((ci[:, 0] << 16) | ci[:, 1]).astype(np.uint32)
    lo[:n] = ci[:, 2].astype(np.uint32)
    return SparseGrid(
        key_hi=jnp.asarray(hi), key_lo=jnp.asarray(lo),
        coords=jnp.asarray(coords),
        num_voxels=jnp.asarray(n, jnp.int32),
        voxel_size=jnp.asarray(g.voxel_size, jnp.float32),
        origin=jnp.zeros((3,), jnp.float32))


def to_device_svh(grids: Sequence[HostGrid], capacities: Sequence[int],
                  voxel_size: float) -> SparseFeatureHierarchy:
    """Upload host grids as a capacity-padded device hierarchy."""
    import jax.numpy as jnp
    return SparseFeatureHierarchy(
        grids=tuple(to_device_grid(g, cap)
                    for g, cap in zip(grids, capacities)),
        voxel_size=jnp.asarray(voxel_size, jnp.float32))


def prune(grid: HostGrid, keep: np.ndarray) -> HostGrid:
    """Subset of a host grid's (sorted) rows — order is preserved."""
    return HostGrid(coords=grid.coords[keep], keys=grid.keys[keep],
                    voxel_size=grid.voxel_size)


def children_of(grid: HostGrid, refined_rows: np.ndarray
                ) -> Tuple[HostGrid, np.ndarray, np.ndarray]:
    """Children (2x finer) of the given rows of a host grid.

    Returns (child grid sorted by key, parent row per child (M,),
    octant id per child (M,)) — the host counterpart of the UNet's
    in-graph upsampling grid build (models/network.py SparseUNet).
    Children of distinct parents never collide, so no dedup is needed.
    """
    from ..native import radix_argsort
    pk = grid.keys[refined_rows]
    doubled = 2 * pk - pack64(np.zeros((1, 3), np.int64))
    deltas = np.array([_offset_delta(o) for o in _OFFS2], np.int64)
    ckeys = (doubled[:, None] + deltas[None]).ravel()
    parent = np.repeat(refined_rows, 8)
    order = radix_argsort(ckeys)
    ckeys = ckeys[order]
    coords = unpack64(ckeys)
    oct_ = coords - 2 * np.floor_divide(coords, 2)
    oct_id = (oct_[:, 0] * 4 + oct_[:, 1] * 2 + oct_[:, 2]).astype(np.int32)
    return (HostGrid(coords=coords, keys=ckeys,
                     voxel_size=grid.voxel_size * 0.5),
            parent[order].astype(np.int32), oct_id)


def nbr_table(grid: HostGrid, cap: int, stencil: np.ndarray) -> np.ndarray:
    """(cap, K) padded stencil table for one host grid."""
    n = min(len(grid.keys), cap)
    t = np.full((cap, stencil.shape[0]), -1, np.int32)
    if n:
        t[:n] = _stencil_tables(grid.keys, stencil.astype(np.int64),
                                base_keys=grid.keys[:n], cap=cap)
    return t


def keys_lookup(grid: HostGrid, keys: np.ndarray) -> np.ndarray:
    """Index of each packed key in the sorted grid, -1 if absent."""
    from ..native import keysearch
    return keysearch(grid.keys, keys)


class UNetTables(NamedTuple):
    """Index tables consumed by SparseUNet (all device arrays)."""
    nbr: Tuple          # per level: (cap, 27) int32
    child: Tuple        # per level d: (cap_{d+1}, 8) indices into level d


def _offset_delta(off: np.ndarray) -> int:
    """pack64(c + off) - pack64(c): packing is linear in the coords."""
    return int((int(off[0]) << 42) | 0) + (int(off[1]) << 21) + int(off[2])


def _stencil_tables(keys: np.ndarray, offsets: np.ndarray,
                    base_keys: Optional[np.ndarray] = None,
                    cap: Optional[int] = None) -> np.ndarray:
    """(len(base), K) indices of base+offset in the sorted key set
    (-1 absent; with ``cap``, indices >= cap also fold to -1).

    The shifted query keys stay sorted per offset (linear packing), so
    the table is K monotone merge-join cursors written row-major in ONE
    native pass (``stencil_join``) — no per-offset temp arrays, no
    separate mask pass.
    """
    from ..native import stencil_join
    base = keys if base_keys is None else base_keys
    deltas = np.array([_offset_delta(o) for o in offsets], np.int64)
    return stencil_join(keys, base, deltas, cap=cap)


def build_unet_tables(grids: Sequence[HostGrid],
                      capacities: Sequence[int],
                      stencil: np.ndarray) -> UNetTables:
    import jax.numpy as jnp
    nbr, child = [], []
    for d, g in enumerate(grids):
        cap = capacities[d]
        n = min(len(g.keys), cap)
        t = np.full((cap, stencil.shape[0]), -1, np.int32)
        t[:n] = _stencil_tables(g.keys, stencil.astype(np.int64),
                                base_keys=g.keys[:n], cap=cap)
        nbr.append(jnp.asarray(t))
    for d in range(len(grids) - 1):
        fine, coarse = grids[d], grids[d + 1]
        cap_c, cap_f = capacities[d + 1], capacities[d]
        n = min(len(coarse.keys), cap_c)
        # child keys = pack64(2c + off) = 2*pack64(c) - pack64(0) + delta
        doubled = 2 * coarse.keys[:n] - pack64(np.zeros((1, 3), np.int64))
        t = np.full((cap_c, 8), -1, np.int32)
        t[:n] = _stencil_tables(fine.keys, _OFFS2, base_keys=doubled,
                                cap=cap_f)
        child.append(jnp.asarray(t))
    return UNetTables(nbr=tuple(nbr), child=tuple(child))


def support_indices(grids: Sequence[HostGrid], capacities: Sequence[int],
                    x: np.ndarray, presorted=None) -> Tuple:
    """Per-depth (Q, 8) indices of each query's 8 surrounding voxel
    centers (the field's basis support) — host counterpart of the lookup
    inside fields.support.depth_support.

    Queries are sorted once per depth so the 8 offset columns become
    native merge joins; results scatter back to input order.
    """
    import jax.numpy as jnp
    out = []
    for i, (g, cap) in enumerate(zip(grids, capacities)):
        if len(g.keys) == 0:   # empty level: no joins, all absent
            out.append(np.full((x.shape[0], 8), -1, np.int32))
            continue
        if presorted is not None:
            sorted_base, order = presorted[i]
        else:
            from ..native import radix_argsort
            base = pack64(np.floor(x / g.voxel_size).astype(np.int64))
            order = radix_argsort(base)
            sorted_base = base[order]
        idx_sorted = _stencil_tables(g.keys, _OFFS2,
                                     base_keys=sorted_base, cap=cap)
        # plain numpy: jit converts at the call boundary, and host-side
        # consumers (mask tests) avoid a device round-trip
        idx = np.empty_like(idx_sorted)
        idx[order] = idx_sorted
        out.append(idx)
    return tuple(out)
