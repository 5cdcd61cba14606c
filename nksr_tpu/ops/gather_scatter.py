"""Gather/scatter building blocks for sparse voxel convolutions.

TPU-native replacement for the sparse-conv primitives inside the reference's
``nksr`` wheel (used by ``NKSRNetwork.unet`` — contract at
/root/reference/models/nksr_net.py:74-78).  Instead of CUDA hash-map kernels
with atomics, we precompute per-grid *neighbor tables* (vectorized binary
searches over the sorted voxel set) and express convolution as
gather + matmul, which XLA fuses and tiles onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import SparseGrid


def stencil_offsets(size: int = 3) -> np.ndarray:
    """(size^3, 3) int32 offsets, e.g. the 27-point cube for size=3."""
    r = np.arange(size) - (size - 1) // 2
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1)
    return offs.reshape(-1, 3).astype(np.int32)


def child_offsets() -> np.ndarray:
    """(8, 3) int32 offsets of the 2x2x2 children of a parent voxel."""
    r = np.arange(2)
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1)
    return offs.reshape(-1, 3).astype(np.int32)


def neighbor_table(grid: SparseGrid, offsets: np.ndarray) -> jnp.ndarray:
    """(capacity, K) indices of each active voxel's stencil neighbors.

    -1 where the neighbor is inactive (or the row itself is padding).
    Computed once per grid and reused by every conv at that level.
    """
    offs = jnp.asarray(offsets, jnp.int32)
    nbr_coords = grid.coords[:, None, :] + offs[None, :, :]
    idx = grid.lookup(nbr_coords.reshape(-1, 3)).reshape(
        grid.capacity, offs.shape[0])
    return jnp.where(grid.active_mask()[:, None], idx, -1)


def svh_tables(grids, offsets: np.ndarray):
    """All UNet lookup tables for a hierarchy in ONE segmented sort-join.

    Returns (nbr, child): ``nbr[d]`` is the (C_d, K) stencil table of level
    d, ``child[d]`` the (C_{d+1}, 8) children table of level d+1 -> d.
    Folding every per-level lookup into one ``multi_search_sorted`` keeps
    the number of big sort programs (each minutes of TPU compile) constant
    instead of linear in depth.
    """
    from ..core import coords as C

    offs = jnp.asarray(offsets, jnp.int32)
    ch = jnp.asarray(child_offsets())
    sets, queries, shapes = [], [], []
    for g in grids:
        q = g.coords[:, None, :] + offs[None]
        sets.append((g.key_hi, g.key_lo, g.num_voxels))
        queries.append(C.pack(q.reshape(-1, 3)))
        shapes.append(("nbr", g.capacity, offs.shape[0]))
    for d in range(len(grids) - 1):
        fine, coarse = grids[d], grids[d + 1]
        cc = coarse.coords[:, None, :] * 2 + ch[None]
        sets.append((fine.key_hi, fine.key_lo, fine.num_voxels))
        queries.append(C.pack(cc.reshape(-1, 3)))
        shapes.append(("child", coarse.capacity, 8))
    res = C.multi_search_sorted(sets, queries)
    nbr, child = [], []
    for g, (kind, rows, k), idx in zip(
            list(grids) + list(grids[1:]), shapes, res):
        t = idx.reshape(rows, k)
        if kind == "nbr":
            nbr.append(jnp.where(g.active_mask()[:, None], t, -1))
    for (kind, rows, k), idx, coarse in zip(
            shapes[len(grids):], res[len(grids):], grids[1:]):
        t = idx.reshape(rows, k)
        child.append(jnp.where(coarse.active_mask()[:, None], t, -1))
    return nbr, child


def parent_table(fine: SparseGrid, coarse: SparseGrid) -> jnp.ndarray:
    """(capacity_fine,) index of each fine voxel's parent in the coarse grid."""
    parents = jnp.floor_divide(fine.coords, 2)
    idx = coarse.lookup(parents)
    return jnp.where(fine.active_mask(), idx, -1)


def child_table(coarse: SparseGrid, fine: SparseGrid) -> jnp.ndarray:
    """(capacity_coarse, 8) indices of each coarse voxel's children."""
    offs = jnp.asarray(child_offsets())
    cc = coarse.coords[:, None, :] * 2 + offs[None]
    idx = fine.lookup(cc.reshape(-1, 3)).reshape(coarse.capacity, 8)
    return jnp.where(coarse.active_mask()[:, None], idx, -1)


def octant_id(coords: jnp.ndarray) -> jnp.ndarray:
    """Which of the 8 children slots a voxel occupies within its parent."""
    o = coords - jnp.floor_divide(coords, 2) * 2  # proper mod for negatives
    return o[..., 0] * 4 + o[..., 1] * 2 + o[..., 2]


def take_rows(feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``feat`` at ``idx``; idx<0 (or OOB) yields zeros."""
    safe = jnp.clip(idx, 0, feat.shape[0] - 1)
    out = jnp.take(feat, safe, axis=0)
    return jnp.where((idx >= 0)[..., None], out, 0.0)


def gather_conv(feat: jnp.ndarray, nbr: jnp.ndarray,
                weights: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sparse submanifold convolution: out[i] = sum_o W[o] @ feat[nbr[i,o]].

    feat: (N, Cin); nbr: (N, K) with -1 for missing; weights: (K, Cin, Cout).
    Loops over the K stencil taps (accumulating (N,Cin)@(Cin,Cout) matmuls)
    rather than materializing the (N, K*Cin) gather — O(N*Cin) live memory,
    MXU-shaped matmuls, and XLA fuses the gather into each matmul.
    """
    k = nbr.shape[1]
    # accumulate across taps in f32 regardless of the compute dtype
    out = jnp.zeros((nbr.shape[0], weights.shape[-1]), jnp.float32)
    for o in range(k):
        g = take_rows(feat, nbr[:, o])
        out = out + jnp.dot(g, weights[o],
                            preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(feat.dtype)


def scatter_mean(values: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray,
                 num_segments: int, eps: float = 1e-8):
    """Masked segment mean: scatter rows of ``values`` into ``num_segments``.

    Returns (mean (num_segments, C), count (num_segments,)).
    """
    seg = jnp.where(mask & (idx >= 0), idx, num_segments)
    acc = jnp.zeros((num_segments + 1, values.shape[-1]), values.dtype
                    ).at[seg].add(values)
    cnt = jnp.zeros((num_segments + 1,), values.dtype).at[seg].add(1.0)
    mean = acc[:-1] / (cnt[:-1, None] + eps)
    return mean, cnt[:-1]


def masked_mean_var(x: jnp.ndarray, mask: jnp.ndarray, axis=0):
    """Mean/var over rows where mask is True (for masked normalization)."""
    m = mask[:, None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    mean = jnp.sum(x * m, axis=axis) / n
    var = jnp.sum(((x - mean) ** 2) * m, axis=axis) / n
    return mean, var
