"""Signed distance from an oriented point cloud (GT supervision queries).

TPU-native replacement for the reference's CUDA ``sdfgen`` extension
(/root/reference/ext/sdfgen/sdf_from_points.cu, pybind surface
ext/sdfgen/bind.cpp:9-15): kNN over a bucketing grid (ops/knn.py)
followed by one of the reference's two estimators:

* ``imls=True`` — implicit moving least squares (``ComputeIMLSKernel``,
  sdf_from_points.cu:32-88, citing arXiv 2203.09167): Gaussian weights
  ``exp(-|q-p|^2/stdv^2)`` (max-exponent subtracted for stability, like
  the CUDA kernel's ``min_exp_val``), value ``sum w * (q-p).n / sum w``,
  optional gradient ``sum w * n / sum w``.
* ``imls=False`` — majority-vote SDF with adaptive radius
  (``ComputeSDFKernel``, sdf_from_points.cu:90-147): magnitude from the
  NEAREST neighbor — plane distance ``|n.(q-p)|`` when the query is
  within ``stdv * ref_std[nearest]`` of it, euclidean distance
  otherwise — and sign from a majority vote of the plane sides over all
  k neighbors.  ``ref_std`` is the mean self-kNN distance of each
  reference point when ``adaptive_knn > 0`` (sdf_from_points.cu:177-184),
  else 1.

Sign convention matches the reference extension: positive OUTSIDE
(callers negate — /root/reference/models/loss.py:85,
dataset/av_gt_geometry.py:72).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from . import knn as K


def _imls(queries, p, n, d2, valid, stdv, adaptive_sigma, compute_grad):
    diff = queries[:, None, :] - p
    plane = jnp.sum(diff * n, axis=-1)                    # signed offsets
    d2 = jnp.where(valid, d2, jnp.inf)
    if adaptive_sigma:
        # per-query bandwidth from the kNN spread — an extension over the
        # reference's fixed stdv, useful when sampling density varies;
        # reference-exact behavior is adaptive_sigma=False
        sigma2 = jnp.maximum(
            jnp.mean(jnp.where(valid, d2, 0.0), axis=1)
            / jnp.maximum(jnp.sum(valid, axis=1), 1), stdv ** 2)
    else:
        sigma2 = jnp.full(queries.shape[0], stdv ** 2, queries.dtype)
    # subtract the min exponent before exp, exactly like the CUDA kernel
    # (sdf_from_points.cu:53-62) — weights stay finite for far queries
    e = d2 / sigma2[:, None]
    e_min = jnp.min(jnp.where(valid, e, jnp.inf), axis=1, keepdims=True)
    w = jnp.where(valid, jnp.exp(-(e - jnp.where(jnp.isfinite(e_min),
                                                 e_min, 0.0))), 0.0)
    wsum = jnp.sum(w, axis=1)
    sdf = jnp.sum(w * plane, axis=1) / (wsum + 1e-12)
    # queries with no neighbors in reach: fall back to far positive
    far = jnp.sqrt(jnp.min(d2, axis=1))
    sdf = jnp.where(wsum > 1e-10, sdf,
                    jnp.where(jnp.isfinite(far), far, 1e3))
    if not compute_grad:
        return sdf
    grad = jnp.sum(w[..., None] * n, axis=1) / (wsum[:, None] + 1e-12)
    return sdf, grad


def _vote(queries, p, n, d2, valid, stdv, ref_std_nn, compute_grad):
    """Majority-vote SDF (ComputeSDFKernel semantics).

    ``p``/``n``/``d2`` are sorted ascending by distance (knn_search), so
    lane 0 is the nearest neighbor — the reference kernel's vote_i == 0.
    """
    diff = queries[:, None, :] - p
    plane = jnp.sum(diff * n, axis=-1)                    # (Q, k)
    d0 = jnp.sqrt(jnp.maximum(d2[:, 0], 0.0))             # nearest dist
    near = d0 < stdv * ref_std_nn
    mag = jnp.where(near, jnp.abs(plane[:, 0]), d0)
    # majority vote over VALID neighbors: inside when positive sides are
    # not a strict majority (num_pos <= k/2, sdf_from_points.cu:131)
    pos = jnp.sum((plane > 0) & valid, axis=1)
    kv = jnp.maximum(jnp.sum(valid, axis=1), 1)
    inside = pos <= kv // 2
    sdf = jnp.where(inside, -mag, mag)
    # no neighbors at all -> far positive
    any_valid = valid[:, 0]
    sdf = jnp.where(any_valid, sdf, 1e3)
    if not compute_grad:
        return sdf
    g_plane = jnp.where(plane[:, 0:1] > 0, n[:, 0], -n[:, 0])
    g_ray = diff[:, 0] / jnp.maximum(d0, 1e-12)[:, None]
    grad = jnp.where(near[:, None], g_plane, g_ray)
    grad = jnp.where(inside[:, None], -grad, grad)
    grad = jnp.where(any_valid[:, None], grad, 0.0)
    return sdf, grad


def reference_self_std(table: K.BucketTable, ref_xyz: jnp.ndarray,
                       adaptive_knn: int) -> jnp.ndarray:
    """Per-reference-point adaptive radius: mean distance to its
    ``adaptive_knn`` nearest reference points (self included, exactly like
    the reference's self-kNN at sdf_from_points.cu:177-184)."""
    _, d2 = K.knn_search(table, ref_xyz, ref_xyz, adaptive_knn)
    d = jnp.sqrt(jnp.maximum(jnp.where(jnp.isfinite(d2), d2, 0.0), 0.0))
    cnt = jnp.maximum(jnp.sum(jnp.isfinite(d2), axis=1), 1)
    return jnp.sum(d, axis=1) / cnt


def sdf_from_points(queries: jnp.ndarray, ref_xyz: jnp.ndarray,
                    ref_normal: jnp.ndarray, ref_mask: jnp.ndarray,
                    table: Optional[K.BucketTable] = None,
                    nb_points: int = 8, stdv: float = 0.02,
                    compute_grad: bool = False, imls: bool = True,
                    adaptive_knn: Optional[int] = 8,
                    ref_std: Optional[jnp.ndarray] = None,
                    cell_size: Optional[float] = None,
                    capacity: Optional[int] = None,
                    max_per_cell: int = 16
                    ) -> Union[jnp.ndarray,
                               Tuple[jnp.ndarray, jnp.ndarray]]:
    """Signed distance (positive OUTSIDE); optionally also the unit-ish
    gradient when ``compute_grad`` (two-tensor return, mirroring the
    reference's ``{sdf, grad_sdf}``).

    ``imls`` selects the estimator (see module docstring).  In IMLS mode
    ``adaptive_knn`` enables the per-query adaptive bandwidth extension
    (None/0 = reference-exact fixed ``stdv``).  In vote mode it sets the
    self-kNN count for the per-point adaptive radius ``ref_std`` (which
    can also be passed in precomputed, e.g. cached by GT geometry).
    """
    if table is None:
        assert cell_size is not None and capacity is not None
        table = K.build_buckets(ref_xyz, ref_mask, cell_size, capacity,
                                max_per_cell)
    idx, d2 = K.knn_search(table, ref_xyz, queries, nb_points)
    valid = idx >= 0
    p = jnp.take(ref_xyz, jnp.clip(idx, 0), axis=0)       # (Q, k, 3)
    n = jnp.take(ref_normal, jnp.clip(idx, 0), axis=0)
    if imls:
        return _imls(queries, p, n, d2, valid, stdv,
                     adaptive_sigma=bool(adaptive_knn), compute_grad=compute_grad)
    if ref_std is None:
        if adaptive_knn:
            ref_std = reference_self_std(table, ref_xyz, adaptive_knn)
        else:
            ref_std = jnp.ones(ref_xyz.shape[0], queries.dtype)
    ref_std_nn = jnp.take(ref_std, jnp.clip(idx[:, 0], 0))
    return _vote(queries, p, n, d2, valid, stdv, ref_std_nn, compute_grad)
