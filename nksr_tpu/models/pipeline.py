"""End-to-end NKSR forward pass: points -> SVH -> network -> kernel solve
-> implicit field.

This is the TPU-native counterpart of the reference ``Model.forward``
(/root/reference/models/nksr_net.py:41-141): one jittable, static-shape
function from a (masked, capacity-padded) point cloud to a solved field,
shared by training, evaluation and the user-facing ``Reconstructor``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.svh import SparseFeatureHierarchy
from ..fields import (DecoderFn, InterpolatorFn, KernelField, LayerField,
                      NeuralField)
from .network import Interpolators, MLP, NKSRNetwork


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static hyperparameters (mirrors
    /root/reference/configs/default/train.yaml:8-30)."""
    voxel_size: float = 0.1
    tree_depth: int = 4
    adaptive_depth: int = 1
    kernel_dim: int = 4
    f_maps: int = 32
    basis_dim: int = 16
    udf_dim: int = 16
    interp_hidden: int = 16
    interp_layers: int = 2
    feature: str = "normal"          # 'normal' | 'sensor' | 'none'
    geometry: str = "kernel"         # 'kernel' | 'neural'
    udf_enabled: bool = False
    pos_weight: float = 1e4
    normal_weight: float = 1e4
    reg_weight: float = 1.0
    solver_tol: float = 1e-5
    solver_max_iters: int = 128
    approx_kernel_grad: bool = False
    capacities: Tuple[int, ...] = (65536, 32768, 16384, 8192)
    adaptive_tau: float = 0.1
    # decoder hierarchy source at inference: 'predicted' (structure head,
    # the reference behavior) or 'splat' (input splat hierarchy — robust
    # fallback and the representative full-shell benchmark workload)
    structure_mode: str = "predicted"

    def network(self) -> NKSRNetwork:
        return NKSRNetwork(
            tree_depth=self.tree_depth, f_maps=self.f_maps,
            adaptive_depth=self.adaptive_depth,
            kernel_dim=self.kernel_dim, basis_dim=self.basis_dim,
            udf_dim=self.udf_dim, interp_hidden=self.interp_hidden,
            interp_layers=self.interp_layers)

    def with_capacity_scale(self, scale: float) -> "PipelineConfig":
        caps = tuple(max(256, int(c * scale)) for c in self.capacities)
        return dataclasses.replace(self, capacities=caps)


@struct.dataclass
class ForwardOutput:
    field: Any
    enc_svh: SparseFeatureHierarchy
    dec_svh: SparseFeatureHierarchy
    udf_svh: SparseFeatureHierarchy
    structure_features: Tuple[jnp.ndarray, ...]
    normal_features: Tuple[jnp.ndarray, ...]
    basis_features: Tuple[jnp.ndarray, ...]


def init_params(cfg: PipelineConfig, rng) -> Any:
    """Initialize network parameters on a tiny synthetic cloud."""
    net = cfg.network()
    small = cfg.with_capacity_scale(256.0 / cfg.capacities[0])
    xyz = jax.random.normal(rng, (32, 3)) * 0.2
    mask = jnp.ones((32,), bool)
    feat = xyz if cfg.feature != "none" else None
    svh = SparseFeatureHierarchy.build_point_splatting(
        xyz, mask, cfg.voxel_size, cfg.tree_depth, small.capacities)
    return net.init(rng, xyz, feat, mask, svh, svh, True, small.capacities)


def point_features(cfg: PipelineConfig, xyz, normal=None, sensor=None):
    """Input feature selection (reference
    /root/reference/models/nksr_net.py:45-54)."""
    if cfg.feature == "normal":
        assert normal is not None, "config expects normals as input feature"
        return normal
    if cfg.feature == "sensor":
        assert sensor is not None, "config expects sensor positions"
        view = sensor - xyz
        return view / (jnp.linalg.norm(view, axis=-1, keepdims=True) + 1e-6)
    return None


def forward(cfg: PipelineConfig, params: Any, xyz: jnp.ndarray,
            mask: jnp.ndarray, feat: Optional[jnp.ndarray],
            gt_svh: Optional[SparseFeatureHierarchy] = None,
            use_gt_structure: bool = False) -> ForwardOutput:
    """The hot path.  All shapes static; jit me."""
    net = cfg.network()
    enc_svh = SparseFeatureHierarchy.build_point_splatting(
        xyz, mask, cfg.voxel_size, cfg.tree_depth, cfg.capacities)

    if cfg.structure_mode == "splat" and gt_svh is None:
        gt_svh, use_gt_structure = enc_svh, True

    out, dec_svh, udf_svh = net.apply(
        params, xyz, feat, mask, enc_svh, gt_svh, use_gt_structure,
        cfg.capacities)

    interp = InterpolatorFn(
        params={"params": params["params"]["interpolators"]},
        module=Interpolators(depth=cfg.tree_depth,
                             kernel_dim=cfg.kernel_dim,
                             n_hidden=cfg.interp_layers,
                             hidden_dim=cfg.interp_hidden))

    if cfg.geometry == "kernel":
        field = KernelField(
            svh=dec_svh, features=out.basis_features, interp=interp,
            kernel_dim=cfg.kernel_dim,
            approx_kernel_grad=cfg.approx_kernel_grad)

        # solve rows (reference weighting /root/reference/models/nksr_net.py:100-112)
        n_pts = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        centers, cmask, nvals = [], [], []
        for d in range(cfg.adaptive_depth):
            centers.append(dec_svh.get_voxel_centers(d))
            cmask.append(dec_svh.grids[d].active_mask())
            nvals.append(out.normal_features[d])
        centers = jnp.concatenate(centers, 0)
        cmask = jnp.concatenate(cmask, 0)
        nvals = jnp.concatenate(nvals, 0)
        m_vox = jnp.maximum(jnp.sum(cmask.astype(jnp.float32)), 1.0)

        pos_w = jnp.where(mask, cfg.pos_weight / n_pts, 0.0)
        normal_w = jnp.where(
            cmask, cfg.normal_weight / m_vox * cfg.voxel_size ** 2, 0.0)
        field = field.solve_non_fused(
            xyz, pos_w, centers, normal_w, -nvals,
            reg_weight=cfg.reg_weight, solver_tol=cfg.solver_tol,
            max_iters=cfg.solver_max_iters)
    elif cfg.geometry == "neural":
        sdf_dec = DecoderFn(
            params={"params": params["params"]["sdf_decoder"]},
            module=MLP(hidden=(2 * cfg.basis_dim,) * 2, out=1))
        field = NeuralField(svh=dec_svh, features=out.basis_features,
                            decoder=sdf_dec)
    else:
        raise NotImplementedError(cfg.geometry)

    if cfg.udf_enabled:
        udf_dec = DecoderFn(
            params={"params": params["params"]["udf_decoder"]},
            module=MLP(hidden=(2 * cfg.udf_dim,) * 2, out=1))
        mask_field = NeuralField(svh=udf_svh, features=out.udf_features,
                                 decoder=udf_dec)
        mask_field = mask_field.set_level_set(2.0 * cfg.voxel_size)
    else:
        mask_field = LayerField(dec_svh, cfg.adaptive_depth)
    field = field.set_mask_field(mask_field)

    return ForwardOutput(
        field=field, enc_svh=enc_svh, dec_svh=dec_svh, udf_svh=udf_svh,
        structure_features=out.structure_features,
        normal_features=out.normal_features,
        basis_features=out.basis_features)


def build_gt_svh(cfg: PipelineConfig, ref_xyz, ref_mask, ref_normal):
    """GT hierarchy for supervision (reference compute_gt_svh,
    /root/reference/models/nksr_net.py:158-185)."""
    return SparseFeatureHierarchy.build_adaptive_normal_variation(
        ref_xyz, ref_normal, ref_mask, cfg.voxel_size, cfg.tree_depth,
        cfg.capacities, tau=cfg.adaptive_tau,
        adaptive_depth=cfg.adaptive_depth)
