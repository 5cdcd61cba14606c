"""Signed distance from an oriented point cloud (GT supervision queries).

TPU-native replacement for the reference's CUDA ``sdfgen`` extension
(/root/reference/ext/sdfgen/sdf_from_points.cu): kNN over a bucketing grid
(ops/knn.py) followed by either IMLS (implicit moving least squares, the
reference's ``imls`` mode, citing arXiv 2203.09167 at
ext/sdfgen/sdf_from_points.cu:31) or a distance-weighted plane-side
estimate with per-point adaptive bandwidth from self-kNN (the reference's
adaptive-knn mode).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import knn as K


def sdf_from_points(queries: jnp.ndarray, ref_xyz: jnp.ndarray,
                    ref_normal: jnp.ndarray, ref_mask: jnp.ndarray,
                    table: Optional[K.BucketTable] = None,
                    nb_points: int = 8, stdv: float = 0.02,
                    adaptive_knn: Optional[int] = 8,
                    cell_size: Optional[float] = None,
                    capacity: Optional[int] = None,
                    max_per_cell: int = 16) -> jnp.ndarray:
    """Signed distance (positive OUTSIDE, matching the reference extension,
    which callers negate — /root/reference/models/loss.py:85).

    sdf(q) = sum_i w_i (q - p_i) . n_i / sum_i w_i,
    w_i = exp(-|q - p_i|^2 / (2 sigma_i^2)),  sigma_i adaptive per query
    from the kNN spread (or the fixed ``stdv``).
    """
    if table is None:
        assert cell_size is not None and capacity is not None
        table = K.build_buckets(ref_xyz, ref_mask, cell_size, capacity,
                                max_per_cell)
    idx, d2 = K.knn_search(table, ref_xyz, queries, nb_points)
    valid = idx >= 0
    p = jnp.take(ref_xyz, jnp.clip(idx, 0), axis=0)       # (Q, k, 3)
    n = jnp.take(ref_normal, jnp.clip(idx, 0), axis=0)
    diff = queries[:, None, :] - p
    plane = jnp.sum(diff * n, axis=-1)                    # signed offsets
    d2 = jnp.where(valid, d2, jnp.inf)
    if adaptive_knn:
        sigma2 = jnp.maximum(
            jnp.mean(jnp.where(valid, d2, 0.0), axis=1)
            / jnp.maximum(jnp.sum(valid, axis=1), 1), stdv ** 2)
    else:
        sigma2 = jnp.full(queries.shape[0], stdv ** 2)
    w = jnp.exp(-d2 / (2.0 * sigma2[:, None]))
    w = jnp.where(valid, w, 0.0)
    wsum = jnp.sum(w, axis=1)
    sdf = jnp.sum(w * plane, axis=1) / (wsum + 1e-12)
    # queries with no neighbors in reach: fall back to far positive
    far = jnp.sqrt(jnp.min(jnp.where(valid, d2, jnp.inf), axis=1))
    return jnp.where(wsum > 1e-10, sdf,
                     jnp.where(jnp.isfinite(far), far, 1e3))
