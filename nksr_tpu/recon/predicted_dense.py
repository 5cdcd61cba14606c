"""Dense-lattice predicted-structure reconstruction (default engine for
the reference's default inference route).

One device jit runs the ENTIRE structure-predicting forward (encoder +
UNet decode with in-graph mask-based pruning/refinement —
models/dense_predicted.py), the host reads back one int8 status lattice
per level to build the decoder voxel lists, and the final solve + meshing
ride the same dense-lattice engine as the splat path.  Replaces the
per-level host round-trips of recon/host_predicted.py (which measured
~200 s at 250k points where the splat path does 1M points in ~15 s).

Grid/field parity with the host-orchestrated route (and through it the
in-graph reference forward) is pinned by tests/test_predicted_dense.py.

Reference contract: the default predicted-structure behavior of
``Reconstructor.reconstruct`` (/root/reference/models/nksr_net.py:74-78,
examples/recons_waymo.py:30-37).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import host_build as HB
from ..models import dense_predicted as DP
from ..models import pipeline as P
from .host_field import HostField


def _next_pow2(n: int) -> int:
    return 1 << max(8, int(math.ceil(math.log2(max(n, 1)))))


class PredictedParts:
    """Everything the structure-predicting forward produces before the
    final solve: decoder/candidate grids + head features.  Shared by the
    single-device tail (`reconstruct_predicted_dense`) and the sharded
    tail (`reconstruct_predicted_sharded`)."""
    __slots__ = ("cfg", "grids", "orders", "caps", "dec_host", "dec_caps",
                 "cand_host", "cand_caps", "dec_cells", "cand_cells",
                 "basis_f", "normal_f", "udf_f", "tm")


def predicted_structures(params, cfg: P.PipelineConfig, xyz: np.ndarray,
                         xyz_p: np.ndarray, mask: np.ndarray, feat
                         ) -> Optional[PredictedParts]:
    """Run the in-graph structure-predicting forward + head dispatch;
    None when the dense route does not apply (lattice budget exceeded /
    empty hierarchy / fully pruned prediction)."""
    from .host_predicted import _Timer
    from .reconstructor import resolve_solver_dtype

    cfg = dataclasses.replace(cfg, solver_compute_dtype=resolve_solver_dtype(
        cfg.solver_compute_dtype))
    D = cfg.tree_depth
    n, cap_pts = xyz.shape[0], xyz_p.shape[0]
    tm = _Timer()

    grids, orders = HB.build_splat_grids_ex(xyz, cfg.voxel_size, D)
    caps = tuple(_next_pow2(len(g.keys)) for g in grids)
    cfg = dataclasses.replace(cfg, capacities=caps)
    planu = DP.plan_unet_lattice(grids, D, f_maps=cfg.f_maps)
    if planu is None:
        return None
    dims, origins = planu
    enc_cell, enc_active = DP.enc_cell_tables(grids, caps, dims, origins)
    tm.lap("splat grids + unet lattice")

    # depth-0-cell-sorted points: every encoder splat scatter is sorted
    # (pack64 key order == flat-id order); pad rows map past the lattice
    # end so sortedness holds through the tail
    perm = orders[0][1]
    base0_s = np.empty((cap_pts, 3), np.int32)
    base0_s[:n] = HB.unpack64(orders[0][0])
    base0_s[n:] = origins[0] + np.asarray(dims[0]) + 8
    xyz_s = np.zeros((cap_pts, 3), np.float32)
    xyz_s[:n] = xyz[perm]
    perm_p = np.concatenate([perm, np.arange(n, cap_pts)]).astype(np.int32)
    feat_s = jnp.take(feat, jnp.asarray(perm_p), axis=0) \
        if feat is not None else None

    gs, sts = DP._forward_fn(cfg, dims)(
        params, jnp.asarray(origins.astype(np.int32)), enc_cell,
        enc_active, jnp.asarray(xyz_s), jnp.asarray(base0_s), feat_s,
        jnp.asarray(mask))
    tm.lap("dispatch network")

    # one int8 lattice per level D2H; everything else stays in HBM
    dec_host, cand_host = [], []
    dec_cells_np, cand_cells_np = [], []
    for d in range(D):
        st = np.asarray(sts[d])
        _, Y, Z = dims[d]

        def lists(sel):
            ids = np.flatnonzero(sel).astype(np.int64)
            c = np.stack([ids // (Y * Z), (ids // Z) % Y, ids % Z],
                         -1) + origins[d]
            # flatnonzero order == row-major local order == pack64 key
            # order (monotone per axis), so the grid is sorted
            return HostGrid_sorted(c, cfg.voxel_size * (2.0 ** d)), ids

        g_dec, ids_dec = lists(st > 1)          # status > 0 (keep)
        g_cand, ids_cand = lists(st > 0)        # all candidates
        dec_host.append(g_dec)
        cand_host.append(g_cand)
        dec_cells_np.append(ids_dec)
        cand_cells_np.append(ids_cand)
    tm.lap("status readback")

    if all(len(g.keys) == 0 for g in dec_host):
        return None                 # host route owns the empty warning

    dec_caps = tuple(_next_pow2(len(g.keys)) for g in dec_host)
    cand_caps = tuple(_next_pow2(len(g.keys)) for g in cand_host)

    def padded(ids_list, caps_):
        cells, actives = [], []
        for d, ids in enumerate(ids_list):
            cap = caps_[d]
            c = np.zeros(cap, np.int32)
            c[:len(ids)] = ids
            a = np.zeros(cap, bool)
            a[:len(ids)] = True
            cells.append(jnp.asarray(c))
            actives.append(jnp.asarray(a))
        return tuple(cells), tuple(actives)

    dc, da = padded(dec_cells_np, dec_caps)
    cc, ca = padded(cand_cells_np, cand_caps)
    basis_f, normal_f, udf_f = DP._heads_fn(cfg, cfg.udf_enabled)(
        params, gs, dc, da, cc, ca)
    tm.lap("dispatch heads")

    parts = PredictedParts()
    parts.cfg = cfg
    parts.grids, parts.orders, parts.caps = grids, orders, caps
    parts.dec_host, parts.dec_caps = dec_host, dec_caps
    parts.cand_host, parts.cand_caps = cand_host, cand_caps
    parts.dec_cells, parts.cand_cells = dec_cells_np, cand_cells_np
    parts.basis_f, parts.normal_f, parts.udf_f = basis_f, normal_f, udf_f
    parts.tm = tm
    return parts


def reconstruct_predicted_dense(params, cfg: P.PipelineConfig,
                                xyz: np.ndarray, xyz_p: np.ndarray,
                                mask: np.ndarray, feat
                                ) -> Optional[HostField]:
    """Returns the reconstructed HostField, or None when the dense route
    does not apply (lattice budget exceeded / empty hierarchy / fully
    pruned prediction) — callers fall back to the host-orchestrated
    route, which owns the warning/empty-field semantics."""
    from ..fields.lattice import plan_lattice
    from ..fields.lattice_eval import LatticeEvalContext
    from .reconstructor import _compiled_lattice_solve

    parts = predicted_structures(params, cfg, xyz, xyz_p, mask, feat)
    if parts is None:
        return None
    cfg, tm = parts.cfg, parts.tm
    D = cfg.tree_depth
    n, cap_pts = xyz.shape[0], xyz_p.shape[0]
    grids, orders, caps = parts.grids, parts.orders, parts.caps
    dec_host, dec_caps = parts.dec_host, parts.dec_caps
    cand_host, cand_caps = parts.cand_host, parts.cand_caps
    basis_f, normal_f, udf_f = parts.basis_f, parts.normal_f, parts.udf_f

    plan = plan_lattice(grids, caps, xyz, orders[0][0], orders[0][1],
                        cfg.voxel_size, D, cfg.adaptive_depth,
                        k=cfg.kernel_dim, dec_grids=dec_host,
                        dec_caps=dec_caps)
    if plan is None:
        return None
    spec = plan.spec
    tm.lap("lattice plan")

    dec_svh = HB.to_device_svh(dec_host, dec_caps, cfg.voxel_size)
    udf_svh = HB.to_device_svh(cand_host, cand_caps, cfg.voxel_size) \
        if cfg.udf_enabled else None
    input_normal = feat if cfg.feature == "normal" else None

    ncap = spec.n_pts_cap
    xs = np.zeros((ncap, 3), np.float32)
    xs[:n] = xyz[plan.pt_perm]
    ms = np.zeros(ncap, bool)
    ms[:n] = True
    c0 = np.zeros((ncap, 3), np.int32)
    c0[:n] = plan.pt_cell0
    dest = np.full(ncap, spec.p_rows * spec.s_pt, np.int32)
    dest[:n] = plan.pt_dest
    phase_key = tuple(map(tuple, plan.phase.tolist()))
    import jax as _jax
    # ONE batched device_put for all plan arrays: per-call transfer
    # overhead on the tunneled platform makes ~17 separate uploads
    # measurably slower than one (reconstructor.py "solve upload")
    (xs_d, ms_d, c0_d, dest_d, scp_d, scg_d, sc0p_d, sc0g_d, grp_d,
     grc_d, grd_d, gra_d, vc_d, va_d, xyzp_d, mask_d,
     prior_idx) = _jax.device_put(
        (xs, ms, c0, dest, plan.slot_cell_pt, plan.slot_cell_gr,
         plan.slot_cell0_pt, plan.slot_cell0_gr, plan.gr_perm,
         plan.gr_coords, plan.gr_depth, plan.gr_active,
         tuple(plan.vox_cell), tuple(plan.vox_active), xyz_p, mask,
         plan.origins.astype(np.int32)))
    field, dxs, cg_stats = _compiled_lattice_solve(cfg, spec, phase_key,
                                                   dense_prior=True)(
        params, xs_d, ms_d, c0_d, dest_d, scp_d, scg_d, sc0p_d, sc0g_d,
        grp_d, grc_d, grd_d, gra_d, vc_d, va_d,
        xyzp_d, mask_d, input_normal,
        dec_svh, udf_svh, basis_f, normal_f,
        udf_f if cfg.udf_enabled else None, prior_idx)
    if tm.on:
        from ..utils.profiling import drain
        drain(field.alpha)
    tm.lap("final solve (lattice)")

    ctx = LatticeEvalContext(
        spec, plan.origins, params["params"]["interpolators"],
        basis_f, field.alpha, vc_d, va_d,
        cfg.voxel_size, cfg.approx_kernel_grad,
        compute_dtype=cfg.solver_compute_dtype,
        dense_xs=dxs)
    from .reconstructor import _check_solver_stats
    return HostField(field, cfg, dec_host, dec_caps, cfg.adaptive_depth,
                     udf_host=cand_host if cfg.udf_enabled else None,
                     udf_caps=tuple(cand_caps), lattice_ctx=ctx,
                     solver_stats=_check_solver_stats(cg_stats, cfg))


def reconstruct_predicted_sharded(params, cfg: P.PipelineConfig,
                                  xyz: np.ndarray, xyz_p: np.ndarray,
                                  mask: np.ndarray, feat, mesh
                                  ) -> Optional[HostField]:
    """Predicted-structure reconstruction with the FINAL SOLVE sharded
    in x-slabs over ``mesh`` (parallel/lattice_shard.py) — the predicted
    plan rides the same sharded lattice engine as the splat plan.  The
    structure-predicting forward runs replicated (it is one dense jit at
    UNet scale; the solve is what dominates and what shards).  Returns
    None when the dense route or the sharded plan does not apply —
    callers fall back to the single-device predicted path."""
    from ..fields import LayerField, NeuralField, DecoderFn
    from ..fields.kernel_field import KernelField
    from ..fields.lattice_eval import LatticeEvalContext
    from ..fields.support import InterpolatorFn
    from ..models.network import Interpolators, MLP
    from ..parallel import lattice_shard as LS
    from .reconstructor import _compiled_gr_targets

    parts = predicted_structures(params, cfg, xyz, xyz_p, mask, feat)
    if parts is None:
        return None
    cfg, tm = parts.cfg, parts.tm
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    out = LS.plan_sharded(parts.grids, parts.caps, xyz,
                          parts.orders[0][0], parts.orders[0][1],
                          cfg.voxel_size, cfg.tree_depth,
                          cfg.adaptive_depth, n_dev, k=cfg.kernel_dim,
                          dec_grids=parts.dec_host,
                          dec_caps=parts.dec_caps)
    if out is None:
        return None
    plan, splan = out
    spec = plan.spec
    tm.lap("sharded plan")

    input_normal = feat if cfg.feature == "normal" else None
    vox_cell = tuple(jnp.asarray(v) for v in plan.vox_cell)
    vox_active = tuple(jnp.asarray(v) for v in plan.vox_active)
    gr_t = _compiled_gr_targets(cfg, spec)(
        parts.normal_f, jnp.asarray(xyz_p), jnp.asarray(mask),
        input_normal, jnp.asarray(plan.origins.astype(np.int32)),
        vox_cell, vox_active)
    tm.lap("gr targets")

    with mesh:
        alpha_parts = LS.sharded_lattice_solve(
            mesh, splan, params["params"]["interpolators"],
            parts.basis_f, gr_t,
            voxel_size=cfg.voxel_size, pos_weight=cfg.pos_weight,
            normal_weight=cfg.normal_weight, reg_weight=cfg.reg_weight,
            tol=cfg.solver_tol, max_iters=cfg.solver_max_iters,
            approx_grad=cfg.approx_kernel_grad)
    alphas = LS.gather_alphas(plan, splan, alpha_parts)
    tm.lap("sharded solve + gather")

    dec_svh = HB.to_device_svh(parts.dec_host, parts.dec_caps,
                               cfg.voxel_size)
    interp = InterpolatorFn(
        params={"params": params["params"]["interpolators"]},
        module=Interpolators(depth=cfg.tree_depth,
                             kernel_dim=cfg.kernel_dim,
                             n_hidden=cfg.interp_layers,
                             hidden_dim=cfg.interp_hidden))
    field = KernelField(
        svh=dec_svh, features=parts.basis_f, interp=interp,
        alpha=tuple(jnp.asarray(a) for a in alphas),
        kernel_dim=cfg.kernel_dim,
        approx_kernel_grad=cfg.approx_kernel_grad)
    if cfg.udf_enabled:
        udf_svh = HB.to_device_svh(parts.cand_host, parts.cand_caps,
                                   cfg.voxel_size)
        udf_dec = DecoderFn(
            params={"params": params["params"]["udf_decoder"]},
            module=MLP(hidden=(2 * cfg.udf_dim,) * 2, out=1))
        mf = NeuralField(svh=udf_svh, features=parts.udf_f,
                         decoder=udf_dec)
        mf = mf.set_level_set(2.0 * cfg.voxel_size)
    else:
        mf = LayerField(dec_svh, cfg.adaptive_depth)
    field = field.set_mask_field(mf)
    ctx = LatticeEvalContext(
        spec, plan.origins, params["params"]["interpolators"],
        parts.basis_f, field.alpha, vox_cell, vox_active,
        cfg.voxel_size, cfg.approx_kernel_grad,
        compute_dtype=cfg.solver_compute_dtype)
    return HostField(field, cfg, parts.dec_host, parts.dec_caps,
                     cfg.adaptive_depth,
                     udf_host=parts.cand_host if cfg.udf_enabled else None,
                     udf_caps=tuple(parts.cand_caps),
                     lattice_ctx=ctx)


def HostGrid_sorted(coords: np.ndarray, voxel_size: float) -> HB.HostGrid:
    """HostGrid from coords already in pack64 key order (no sort)."""
    return HB.HostGrid(coords=coords.astype(np.int32),
                       keys=HB.pack64(coords), voxel_size=voxel_size)
