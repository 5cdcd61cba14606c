"""Training losses & metrics (kitchen-sink supervision).

Reimplements the semantics of the reference loss module
(/root/reference/models/loss.py) functionally and static-shape:

  * SVH-uniform + surface-band samplers (loss.py:23-67)
  * soft/hard TSDF truncation transform (loss.py:69-81)
  * SpatialLoss: near-surface L1 + exponential empty-space + RegSDF
    (loss.py:201-255)
  * GTSurfaceLoss: on-surface value L1 + normal alignment (loss.py:163-198)
  * StructureLoss: per-depth voxel-status cross-entropy + accuracy
    (loss.py:143-160)
  * UDFLoss: truncated-UDF L1 on the mask field (loss.py:106-140)
  * ShapeNetIoUMetric: occupancy IoU via evaluate_f_bar (loss.py:89-103)

GT signed distances come from the oriented reference cloud through the
IMLS op (ops/sdf.py), the TPU-native stand-in for the reference's CUDA
``sdfgen`` (loss.py:85).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.svh import SparseFeatureHierarchy
from ..models.pipeline import ForwardOutput, PipelineConfig
from ..ops import knn as K
from ..ops import sdf as SDF


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    type: str = "uniform"       # 'uniform' | 'band'
    n_samples: int = 50000
    expand: int = 1
    expand_top: int = 3
    eps: float = 0.5            # band width, times voxel size


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Mirrors configs/default/train.yaml:49-90 of the reference."""
    structure_weight: float = 20.0
    gt_surface_value: float = 200.0
    gt_surface_normal: float = 100.0
    gt_surface_subsample: int = 50000
    spatial_weight: float = 300.0
    reg_sdf_weight: float = 0.0
    spatial_samplers: Tuple[SamplerConfig, ...] = (
        SamplerConfig("uniform", 50000, 1, 3),
        SamplerConfig("band", 50000),
    )
    udf_weight: float = 150.0
    udf_samplers: Tuple[SamplerConfig, ...] = (
        SamplerConfig("uniform", 80000, 1, 5),
        SamplerConfig("band", 20000),
    )
    gt_soft: bool = True
    gt_band: float = 1.0        # truncation, times voxel size
    sdf_knn: int = 8


# ------------------------------------------------------------------ samplers
def _expand_coords(coords, mask, expand: int):
    if expand < 3:
        return coords, mask
    # note: floor division on the negative side, matching the reference's
    # offset range (-e//2+1 .. e//2) at loss.py:39
    r = np.arange((-expand) // 2 + 1, expand // 2 + 1)
    offs = jnp.asarray(np.stack(np.meshgrid(r, r, r, indexing="ij"),
                                -1).reshape(-1, 3), jnp.int32)
    cc = coords[:, None, :] + offs[None]
    mm = jnp.broadcast_to(mask[:, None], cc.shape[:2])
    return cc.reshape(-1, 3), mm.reshape(-1)


def svh_uniform_samples(rng, svh: SparseFeatureHierarchy, n: int,
                        expand: int = 0, expand_top: int = 0):
    """Uniform samples inside (expanded) active voxels across all depths
    (reference _get_svh_samples, loss.py:23-51)."""
    coords_l, scale_l, mask_l = [], [], []
    for d in range(svh.depth):
        g = svh.grids[d]
        e = expand if d != svh.depth - 1 else expand_top
        cc, mm = _expand_coords(g.coords, g.active_mask(), e)
        coords_l.append(g.grid_to_world(cc))
        scale_l.append(jnp.full((cc.shape[0],), g.voxel_size))
        mask_l.append(mm)
    base = jnp.concatenate(coords_l, 0)
    scales = jnp.concatenate(scale_l, 0)
    mask = jnp.concatenate(mask_l, 0)

    # draw uniformly over *valid* rows: compact valid indices to a prefix
    vcount = jnp.cumsum(mask.astype(jnp.int32)) - 1
    total = jnp.maximum(vcount[-1] + 1, 1)
    dest = jnp.where(mask, vcount, base.shape[0])
    valid_idx = jnp.zeros((base.shape[0] + 1,), jnp.int32).at[dest].set(
        jnp.arange(base.shape[0], dtype=jnp.int32), mode="drop")[:-1]
    k1, k2 = jax.random.split(rng)
    u = jnp.floor(jax.random.uniform(k1, (n,)) *
                  total.astype(jnp.float32)).astype(jnp.int32)
    pick = jnp.take(valid_idx, jnp.clip(u, 0, base.shape[0] - 1))
    local = (jax.random.uniform(k2, (n, 3)) - 0.5) * \
        jnp.take(scales, pick)[:, None]
    return jnp.take(base, pick, axis=0) + local


def band_samples(rng, ref_xyz, ref_normal, ref_mask, n: int, eps: float):
    """Gaussian band around the GT surface (loss.py:61-66)."""
    vcount = jnp.cumsum(ref_mask.astype(jnp.int32)) - 1
    total = jnp.maximum(vcount[-1] + 1, 1)
    dest = jnp.where(ref_mask, vcount, ref_xyz.shape[0])
    valid_idx = jnp.zeros((ref_xyz.shape[0] + 1,), jnp.int32).at[dest].set(
        jnp.arange(ref_xyz.shape[0], dtype=jnp.int32), mode="drop")[:-1]
    k1, k2 = jax.random.split(rng)
    u = jnp.floor(jax.random.uniform(k1, (n,)) *
                  total.astype(jnp.float32)).astype(jnp.int32)
    pick = jnp.take(valid_idx, jnp.clip(u, 0, ref_xyz.shape[0] - 1))
    offs = jax.random.normal(k2, (n, 1)) * eps
    return jnp.take(ref_xyz, pick, axis=0) + \
        jnp.take(ref_normal, pick, axis=0) * offs


def get_samples(rng, cfg: PipelineConfig, samplers: Sequence[SamplerConfig],
                svh, ref_xyz, ref_normal, ref_mask):
    parts = []
    for i, sc in enumerate(samplers):
        key = jax.random.fold_in(rng, i)
        if sc.type == "uniform":
            parts.append(svh_uniform_samples(key, svh, sc.n_samples,
                                             sc.expand, sc.expand_top))
        elif sc.type == "band":
            parts.append(band_samples(key, ref_xyz, ref_normal, ref_mask,
                                      sc.n_samples,
                                      sc.eps * cfg.voxel_size))
        else:
            raise ValueError(sc.type)
    return jnp.concatenate(parts, 0)


# ------------------------------------------------------------- field helpers
def transform_field(cfg: PipelineConfig, lcfg: LossConfig, field_vals):
    """Soft/hard TSDF truncation (loss.py:69-81)."""
    ts = lcfg.gt_band * cfg.voxel_size
    if lcfg.gt_soft:
        return jnp.tanh(field_vals / ts) * ts
    return jnp.clip(field_vals, -ts, ts)


def gt_tsdf_from_points(cfg, lcfg, table, query, ref_xyz, ref_normal):
    """- sdf_from_points, truncated (loss.py:84-86; sign at loss.py:85)."""
    sdf = SDF.sdf_from_points(query, ref_xyz, ref_normal,
                              None, table=table, nb_points=lcfg.sdf_knn,
                              stdv=0.02)
    return transform_field(cfg, lcfg, -sdf)


# ------------------------------------------------------------------- losses
def compute_losses(rng, cfg: PipelineConfig, lcfg: LossConfig,
                   out: ForwardOutput, batch: Dict,
                   compute_metric: bool = False):
    """Returns (loss_dict, metric_dict); total = sum(loss_dict.values())."""
    losses: Dict[str, jnp.ndarray] = {}
    metrics: Dict[str, jnp.ndarray] = {}
    field = out.field
    ref_xyz = batch["gt_xyz"]
    ref_normal = batch["gt_normal"]
    ref_mask = batch["gt_mask"]

    # shared kNN bucket table over the GT cloud
    table = K.build_buckets(ref_xyz, ref_mask, 4.0 * cfg.voxel_size,
                            _bucket_cap(ref_xyz.shape[0]), 32)

    # ---------------- SpatialLoss (loss.py:201-255)
    if lcfg.spatial_weight > 0:
        k = jax.random.fold_in(rng, 1)
        chi = get_samples(k, cfg, lcfg.spatial_samplers, field.svh,
                          ref_xyz, ref_normal, ref_mask)
        pd_chi = field.evaluate_f(chi).value
        gt_tsdf = gt_tsdf_from_points(cfg, lcfg, table, chi, ref_xyz,
                                      ref_normal)
        pd_tsdf = transform_field(cfg, lcfg, pd_chi)
        near_l1 = jnp.abs(pd_tsdf - gt_tsdf) / cfg.voxel_size
        losses["spatial"] = lcfg.spatial_weight * jnp.mean(near_l1)
        if lcfg.reg_sdf_weight > 0:
            eps = 0.5
            losses["msa"] = lcfg.reg_sdf_weight * jnp.mean(
                eps / (pd_chi ** 2 + eps ** 2))

    # ---------------- GTSurfaceLoss (loss.py:163-198)
    if lcfg.gt_surface_value > 0 or lcfg.gt_surface_normal > 0:
        k = jax.random.fold_in(rng, 2)
        nsub = lcfg.gt_surface_subsample
        pick = _masked_choice(k, ref_mask, nsub)
        sx = jnp.take(ref_xyz, pick, axis=0)
        sn = jnp.take(ref_normal, pick, axis=0)
        ev = field.evaluate_f(sx, grad=lcfg.gt_surface_normal > 0)
        if lcfg.gt_surface_normal > 0:
            g = ev.gradient
            g = -g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-6)
            losses["gt-surface-normal"] = lcfg.gt_surface_normal * (
                1.0 - jnp.mean(jnp.sum(g * sn, axis=-1)))
        losses["gt-surface-value"] = lcfg.gt_surface_value * jnp.mean(
            jnp.abs(ev.value))

    # ---------------- StructureLoss (loss.py:143-160)
    if lcfg.structure_weight > 0 and "gt_svh" in batch:
        gt_svh: SparseFeatureHierarchy = batch["gt_svh"]
        for d, logits in enumerate(out.structure_features):
            grid = out.udf_svh.grids[d]
            m = grid.active_mask()
            status = gt_svh.evaluate_voxel_status(grid.coords, d)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, status[:, None], axis=1)[:, 0]
            denom = jnp.maximum(jnp.sum(m), 1)
            losses[f"struct-{d}"] = lcfg.structure_weight * \
                jnp.sum(jnp.where(m, ce, 0.0)) / denom
            if compute_metric:
                acc = jnp.sum(jnp.where(
                    m, (jnp.argmax(logits, -1) == status), False)) / denom
                metrics[f"struct-acc-{d}"] = acc

    # ---------------- UDFLoss (loss.py:106-140)
    if cfg.udf_enabled and lcfg.udf_weight > 0:
        k = jax.random.fold_in(rng, 3)
        chi = get_samples(k, cfg, lcfg.udf_samplers, field.svh,
                          ref_xyz, ref_normal, ref_mask)
        pd = field.mask_field.evaluate_f(chi).value
        gt_tudf = jnp.abs(gt_tsdf_from_points(cfg, lcfg, table, chi,
                                              ref_xyz, ref_normal))
        pd_tudf = transform_field(cfg, lcfg, pd)
        losses["udf"] = lcfg.udf_weight * jnp.mean(
            jnp.abs(pd_tudf - gt_tudf) / cfg.voxel_size)

    # ---------------- ShapeNetIoUMetric (loss.py:89-103)
    if compute_metric and "onet_xyz" in batch:
        pd_in = field.evaluate_f_bar(batch["onet_xyz"]) > 0
        gt_in = batch["onet_occ"] > 0
        m = batch.get("onet_mask", jnp.ones(pd_in.shape[0], bool))
        inter = jnp.sum(jnp.where(m, pd_in & gt_in, False))
        union = jnp.sum(jnp.where(m, pd_in | gt_in, False))
        metrics["iou"] = inter / (union + 1e-6)

    return losses, metrics


def _bucket_cap(n: int) -> int:
    import math
    return 1 << max(8, int(math.ceil(math.log2(max(n, 1)))))


def _masked_choice(rng, mask, n):
    count = jnp.cumsum(mask.astype(jnp.int32)) - 1
    total = jnp.maximum(count[-1] + 1, 1)
    dest = jnp.where(mask, count, mask.shape[0])
    valid_idx = jnp.zeros((mask.shape[0] + 1,), jnp.int32).at[dest].set(
        jnp.arange(mask.shape[0], dtype=jnp.int32), mode="drop")[:-1]
    u = jnp.floor(jax.random.uniform(rng, (n,)) *
                  total.astype(jnp.float32)).astype(jnp.int32)
    return jnp.take(valid_idx, jnp.clip(u, 0, mask.shape[0] - 1))
