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
import numpy as np
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
    fused_mode: bool = False         # recompute supports inside CG matvecs
    conv_dtype: str = "float32"      # 'bfloat16' = MXU-native UNet convs
    # dtype of the lattice CG matvec's streamed row blocks / support
    # buffer (f32 accumulation regardless).  'auto' = bf16 on TPU
    # backends, f32 on CPU — resolved by the Reconstructor.
    solver_compute_dtype: str = "auto"
    # 'primal' solves the coefficient-space normal equations (default);
    # 'dual' the row-space Gram system (the reference's formulation) —
    # mathematically identical at convergence, but EXPERIMENTAL here:
    # Jacobi on the Gram (near-uniform row norms) preconditions far
    # worse than Jacobi on the primal (measured: dual rel-res 0.78 after
    # 400 iters where primal reaches 7e-3 — scripts/debug_dual.py); the
    # dual only pays off once it has a real preconditioner.
    solver_formulation: str = "primal"
    # fused-AV0 cascade engine inside the CG matvec: 'xla' (dense
    # shift/upsample chain) or 'pallas' (one-pass tiled kernel —
    # fields/lattice_pallas.py; exact on the reachable subspace).
    # 'auto' = pallas on TPU backends, xla on CPU (no Mosaic there).
    cascade_engine: str = "auto"
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
            interp_layers=self.interp_layers,
            compute_dtype=self.conv_dtype)

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
    """Initialize network parameters WITHOUT compiling the model.

    ``jax.eval_shape`` gives the exact parameter tree abstractly (no XLA
    compile — important on backends where compiling the full network graph
    takes minutes), then leaves are initialized by rule: kernels get
    glorot-uniform fan-in/fan-out, scales 1, everything else 0.  This
    matches the module initializers (network.py uses glorot/zeros/ones).
    """
    net = cfg.network()
    small = cfg.with_capacity_scale(256.0 / cfg.capacities[0])
    xyz = jnp.zeros((32, 3), jnp.float32)
    mask = jnp.ones((32,), bool)
    feat = xyz if cfg.feature != "none" else None

    def build(r):
        svh = SparseFeatureHierarchy.build_point_splatting(
            xyz, mask, cfg.voxel_size, cfg.tree_depth, small.capacities)
        return net.init(r, xyz, feat, mask, svh, svh, True,
                        small.capacities)

    shapes = jax.eval_shape(build, rng)
    flat, _ = jax.tree_util.tree_flatten_with_path(shapes)

    import zlib

    def make_leaves(r):  # one fused program: avoids per-leaf dispatches
        leaves = []
        for path, leaf in flat:
            name = str(path[-1].key) if hasattr(path[-1], "key") else ""
            pathstr = jax.tree_util.keystr(path)
            # deterministic across processes (python's hash() is salted)
            key = jax.random.fold_in(r, zlib.crc32(
                pathstr.encode()) & 0x7FFFFFFF)
            if "normal_" in pathstr:
                # zero-init residual normal head (see network.SparseUNet)
                leaves.append(jnp.zeros(leaf.shape, leaf.dtype))
            elif name == "kernel" and len(leaf.shape) >= 2:
                fan_in = int(np.prod(leaf.shape[:-1]))
                fan_out = int(leaf.shape[-1])
                lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
                leaves.append(jax.random.uniform(
                    key, leaf.shape, leaf.dtype, -lim, lim))
            elif name == "scale":
                leaves.append(jnp.ones(leaf.shape, leaf.dtype))
            else:
                leaves.append(jnp.zeros(leaf.shape, leaf.dtype))
        return leaves
    leaves = jax.jit(make_leaves)(rng)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(shapes), leaves)


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


@struct.dataclass
class Precomputed:
    """Host-built structures + index tables (core/host_build.py): with
    these, the device program contains no sorts at all."""
    enc_svh: SparseFeatureHierarchy
    unet_tables: Any
    point_splat_idx: jnp.ndarray          # (N, 8)
    pos_sup_idx: Tuple[jnp.ndarray, ...]  # per depth (N, 8)
    grad_sup_idx: Tuple[jnp.ndarray, ...]  # per depth (M, 8)


def splat_normals_to_grid(grid, xyz, normal, mask, splat_idx=None):
    """Per-voxel unit normals from trilinear-splatted input normals."""
    from ..core.grid import point_splat_coords
    corner, w = point_splat_coords(grid, xyz)
    if splat_idx is None:
        splat_idx = grid.lookup(corner.reshape(-1, 3)).reshape(
            xyz.shape[0], 8)
    w = jnp.where(mask[:, None] & (splat_idx >= 0), w, 0.0)
    seg = jnp.where(splat_idx >= 0, splat_idx, grid.capacity).reshape(-1)
    acc = jnp.zeros((grid.capacity + 1, 3)).at[seg].add(
        (normal[:, None, :] * w[..., None]).reshape(-1, 3))
    n = acc[:-1]
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-6)


def solve_kernel_field(cfg: PipelineConfig, params: Any, xyz: jnp.ndarray,
                       mask: jnp.ndarray,
                       input_normal: Optional[jnp.ndarray],
                       dec_svh: SparseFeatureHierarchy,
                       basis_features: Tuple[jnp.ndarray, ...],
                       normal_features: Tuple[jnp.ndarray, ...],
                       pos_sup_idx=None, grad_sup_idx=None,
                       prior_splat_idx=None) -> KernelField:
    """Assemble solve rows and fit the kernel field (reference weighting
    /root/reference/models/nksr_net.py:100-112).  Shared by the in-graph
    forward and the host-orchestrated phase jits (recon/host_predicted.py).

    ``prior_splat_idx``: optional per-adaptive-depth (N, 8) splat indices of
    the input points into the decoder grids (host-precomputed); None entries
    fall back to an in-graph lookup.
    """
    interp = InterpolatorFn(
        params={"params": params["params"]["interpolators"]},
        module=Interpolators(depth=cfg.tree_depth,
                             kernel_dim=cfg.kernel_dim,
                             n_hidden=cfg.interp_layers,
                             hidden_dim=cfg.interp_hidden))
    field = KernelField(
        svh=dec_svh, features=basis_features, interp=interp,
        kernel_dim=cfg.kernel_dim,
        approx_kernel_grad=cfg.approx_kernel_grad)

    n_pts = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    centers, cmask, nvals = [], [], []
    for d in range(cfg.adaptive_depth):
        centers.append(dec_svh.get_voxel_centers(d))
        cmask.append(dec_svh.grids[d].active_mask())
        nv = normal_features[d]
        if input_normal is not None:
            # residual normal head: network corrects the trilinearly
            # splatted input normals (sane from init, easier to train)
            sidx = None if prior_splat_idx is None else prior_splat_idx[d]
            prior = splat_normals_to_grid(dec_svh.grids[d], xyz,
                                          input_normal, mask,
                                          splat_idx=sidx)
            nv = prior + nv
        nvals.append(nv)
    centers = jnp.concatenate(centers, 0)
    cmask = jnp.concatenate(cmask, 0)
    nvals = jnp.concatenate(nvals, 0)
    m_vox = jnp.maximum(jnp.sum(cmask.astype(jnp.float32)), 1.0)

    pos_w = jnp.where(mask, cfg.pos_weight / n_pts, 0.0)
    normal_w = jnp.where(
        cmask, cfg.normal_weight / m_vox * cfg.voxel_size ** 2, 0.0)
    return field.solve(
        xyz, pos_w, centers, normal_w, -nvals,
        reg_weight=cfg.reg_weight, solver_tol=cfg.solver_tol,
        max_iters=cfg.solver_max_iters,
        pos_sup_idx=pos_sup_idx, normal_sup_idx=grad_sup_idx,
        fused=cfg.fused_mode)


def forward(cfg: PipelineConfig, params: Any, xyz: jnp.ndarray,
            mask: jnp.ndarray, feat: Optional[jnp.ndarray],
            gt_svh: Optional[SparseFeatureHierarchy] = None,
            use_gt_structure: bool = False,
            pre: Optional[Precomputed] = None,
            input_normal: Optional[jnp.ndarray] = None) -> ForwardOutput:
    """The hot path.  All shapes static; jit me."""
    net = cfg.network()
    if pre is not None:
        enc_svh = pre.enc_svh
    else:
        enc_svh = SparseFeatureHierarchy.build_point_splatting(
            xyz, mask, cfg.voxel_size, cfg.tree_depth, cfg.capacities)

    if cfg.structure_mode == "splat" and gt_svh is None:
        gt_svh, use_gt_structure = enc_svh, True

    out, dec_svh, udf_svh = net.apply(
        params, xyz, feat, mask, enc_svh, gt_svh, use_gt_structure,
        cfg.capacities,
        tables=None if pre is None else pre.unet_tables,
        point_splat_idx=None if pre is None else pre.point_splat_idx)

    if cfg.geometry == "kernel":
        if cfg.feature == "normal" and input_normal is None:
            input_normal = feat
        prior_idx = None
        if pre is not None:
            # pos_sup_idx[d] == the points' splat support at depth d,
            # valid as the prior-splat table whenever the decoder grid IS
            # the encoder grid (teacher forcing with the splat hierarchy)
            prior_idx = tuple(
                pre.pos_sup_idx[d]
                if dec_svh.grids[d].key_hi is enc_svh.grids[d].key_hi
                else None
                for d in range(cfg.adaptive_depth))
        field = solve_kernel_field(
            cfg, params, xyz, mask, input_normal, dec_svh,
            out.basis_features, out.normal_features,
            pos_sup_idx=None if pre is None else pre.pos_sup_idx,
            grad_sup_idx=None if pre is None else pre.grad_sup_idx,
            prior_splat_idx=prior_idx)
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
