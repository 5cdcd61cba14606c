"""Grid-bucket k-nearest-neighbor search + PCA normal estimation.

TPU-native replacement for the reference's CUDA kd-tree
(/root/reference/ext/common/kdtree_cuda.cu) and the normal-estimation
preprocess ``get_estimate_normal_preprocess_fn(knn, max_angle)`` whose exact
algorithm is spelled out in the CPU path
(/root/reference/examples/recons_waymo_cpu.py:21-41): kNN-PCA normals,
flipped toward the sensor, dropping grazing (> max_angle) points.

Design: no trees, no recursion — a bucketing grid with a fixed per-cell
slot table.  Each query gathers the 27 surrounding cells' candidates and
top-k's by distance: pure gathers + a VPU top-k, one static shape.
Points beyond the 3x3x3 cell neighborhood or past the per-cell cap are
ignored (cap/cell-size are chosen from the data so this is rare).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import SparseGrid


class BucketTable(NamedTuple):
    grid: SparseGrid
    slots: jnp.ndarray   # (capacity, max_per_cell) point indices, -1 empty


def build_buckets(xyz: jnp.ndarray, mask: jnp.ndarray, cell_size,
                  capacity: int, max_per_cell: int) -> BucketTable:
    n = xyz.shape[0]
    ijk = jnp.round(xyz / cell_size).astype(jnp.int32)
    grid = SparseGrid.from_coords(ijk, mask, capacity, cell_size)
    cid = grid.lookup(ijk)
    cid = jnp.where(mask, cid, -1)
    # stable sort points by cell id; rank within cell = position - first
    order = jnp.argsort(jnp.where(cid >= 0, cid, jnp.iinfo(jnp.int32).max),
                        stable=True)
    cid_sorted = jnp.take(cid, order)
    valid = cid_sorted >= 0
    first = jnp.concatenate([jnp.ones((1,), bool),
                             cid_sorted[1:] != cid_sorted[:-1]])
    pos = jnp.arange(n, dtype=jnp.int32)
    first_pos = jnp.where(first, pos, 0)
    start = jax.lax.associative_scan(jnp.maximum, first_pos)
    rank = pos - start
    ok = valid & (rank < max_per_cell)
    dest = jnp.where(ok, cid_sorted * max_per_cell + rank,
                     capacity * max_per_cell)
    slots = jnp.full((capacity * max_per_cell + 1,), -1, jnp.int32
                     ).at[dest].set(order.astype(jnp.int32), mode="drop")
    return BucketTable(grid=grid,
                       slots=slots[:-1].reshape(capacity, max_per_cell))


def knn_search(table: BucketTable, xyz_ref: jnp.ndarray,
               queries: jnp.ndarray, k: int) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """k nearest reference points for each query.

    Returns (idx (Q, k) int32 with -1 padding, dist2 (Q, k) with inf)."""
    offs = jnp.asarray(
        np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"),
                 -1).reshape(-1, 3), jnp.int32)
    cell = jnp.round(queries / table.grid.voxel_size).astype(jnp.int32)
    cells = cell[:, None, :] + offs[None]                    # (Q, 27, 3)
    cidx = table.grid.lookup(cells.reshape(-1, 3)).reshape(
        queries.shape[0], -1)                                # (Q, 27)
    m = table.slots.shape[1]
    cand = jnp.where(cidx[:, :, None] >= 0,
                     jnp.take(table.slots, jnp.clip(cidx, 0), axis=0),
                     -1).reshape(queries.shape[0], -1)       # (Q, 27*m)
    p = jnp.take(xyz_ref, jnp.clip(cand, 0), axis=0)
    d2 = jnp.sum((p - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand >= 0, d2, jnp.inf)
    neg, top_i = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand, top_i, axis=1)
    d2k = -neg
    idx = jnp.where(jnp.isfinite(d2k), idx, -1)
    return idx, d2k


def estimate_cell_size(xyz: np.ndarray, k: int) -> float:
    """Pick a bucket cell size so ~k candidates fall in the 27-cell hood.

    Point clouds are usually surface-like (locally 2-D), so estimate from
    the two largest bbox extents; degenerate (flat/linear) data stays
    well-conditioned.
    """
    n = max(xyz.shape[0], 1)
    ext = np.sort(np.maximum(np.ptp(xyz, axis=0), 1e-9))[::-1]
    if ext[2] < 0.05 * ext[0]:  # essentially planar
        area = ext[0] * ext[1]
        return float(np.sqrt(k * area / n))
    vol = float(np.prod(ext))
    return float((k * vol / n) ** (1.0 / 3.0))


def pca_normals(xyz: jnp.ndarray, nbr_idx: jnp.ndarray) -> jnp.ndarray:
    """Smallest-eigenvector normal of each point's neighbor covariance."""
    valid = (nbr_idx >= 0)[..., None]
    p = jnp.take(xyz, jnp.clip(nbr_idx, 0), axis=0)          # (Q, k, 3)
    w = valid.astype(xyz.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(p * w, axis=1) / cnt
    d = (p - mean[:, None, :]) * w
    cov = jnp.einsum("qki,qkj->qij", d, d) / cnt[:, None]
    # batched symmetric 3x3 eigendecomposition
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., 0]  # eigenvector of smallest eigenvalue


def estimate_normals(xyz: jnp.ndarray, mask: jnp.ndarray, k: int,
                     cell_size, capacity: int, max_per_cell: int,
                     sensor: Optional[jnp.ndarray] = None,
                     max_angle_deg: float = 85.0):
    """Full normal-estimation preprocess (reference algorithm at
    /root/reference/examples/recons_waymo_cpu.py:21-41).

    Returns (normal (N, 3), keep_mask (N,)): normals oriented toward the
    sensor; grazing points (angle > max_angle) dropped from the mask.
    When ``sensor`` is None, orientation is left as PCA produces it and no
    grazing filter is applied.
    """
    table = build_buckets(xyz, mask, cell_size, capacity, max_per_cell)
    idx, _ = knn_search(table, xyz, xyz, k)
    normal = pca_normals(xyz, idx)
    keep = mask
    if sensor is not None:
        view = sensor - xyz
        view = view / (jnp.linalg.norm(view, axis=-1, keepdims=True) + 1e-6)
        cos = jnp.sum(view * normal, axis=-1)
        normal = jnp.where(cos[:, None] < 0.0, -normal, normal)
        keep = keep & (jnp.abs(cos) > jnp.cos(jnp.deg2rad(max_angle_deg)))
    return normal, keep
