"""Host-orchestrated *predicted-structure* inference (the reference's
default behavior: the UNet prunes/refines the decoder hierarchy itself,
/root/reference/models/nksr_net.py:74-78).

Why a separate path: the structure-predicting UNet changes grid topology
mid-forward, and every in-graph grid build is a device sort — XLA:TPU sort
compile time scales linearly with array size, so the fully-traced program
costs minutes of compile at scene scale (see core/host_build.py).  Here the
forward is cut at each topology change into small *sort-free* jits, with
the host doing the integer work in between:

  phase 1 (device)   encoder + UNet encoder path + bottom decoder conv
                     -> per-voxel structure logits at the coarsest level
  per level (host)   argmax statuses -> prune to the decoder grid, expand
                     children of REFINED voxels, build neighbor/parent/skip
                     index tables (numpy + native merge-joins)
  per level (device) transposed conv up + skip + decoder conv -> logits
  final (device)     basis/normal heads on the pruned grids + kernel solve

Device work stays batched dense math (MXU matmuls, gathers); each jit
compiles in seconds.  D2H traffic is one int32 status vector per level;
H2D is the index tables.  Numerically identical to the in-graph predicted
path (tests/test_predicted_host.py checks grid and field parity).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import host_build as HB
from ..core.svh import VOXEL_REFINED
from ..models import pipeline as P
from ..models.network import ConvBlock, PointEncoder
from ..ops import gather_scatter as gs
from .host_field import HostField


def _next_pow2(n: int) -> int:
    return 1 << max(8, int(math.ceil(math.log2(max(n, 1)))))


class _Timer:
    """Step timing, printed when NKSR_TIMING=1 (perf triage aid)."""

    def __init__(self):
        import os
        import time
        self.on = os.environ.get("NKSR_TIMING", "0") == "1"
        self.t = time.perf_counter if self.on else None
        self.last = self.t() if self.on else 0.0

    def lap(self, label: str):
        if self.on:
            now = self.t()
            print(f"[timing] {label}: {now - self.last:.3f}s", flush=True)
            self.last = now


# --------------------------------------------------------------- device jits
@functools.lru_cache(maxsize=16)
def _phase1_fn(cfg: P.PipelineConfig):
    """Encoder path + bottom decoder conv + bottom structure logits."""
    D = cfg.tree_depth

    def fn(params, xyz, mask, feat, enc_svh, tables, splat_idx):
        up = params["params"]["unet"]
        feat0 = PointEncoder(cfg.f_maps).apply(
            {"params": params["params"]["encoder"]}, xyz, feat, mask,
            enc_svh.grids[0], splat_idx=splat_idx)
        enc_feats = []
        f = feat0
        for d in range(D):
            f = ConvBlock(cfg.f_maps, compute_dtype=cfg.conv_dtype).apply(
                {"params": up[f"enc_{d}"]}, f, tables.nbr[d],
                enc_svh.grids[d].active_mask())
            enc_feats.append(f)
            if d < D - 1:
                f = gs.gather_conv(f, tables.child[d], up[f"down_{d}"],
                                   up[f"down_b_{d}"])
                f = jnp.where(enc_svh.grids[d + 1].active_mask()[:, None],
                              f, 0.0)
        amask = enc_svh.grids[D - 1].active_mask()
        g = ConvBlock(cfg.f_maps, compute_dtype=cfg.conv_dtype).apply(
            {"params": up[f"dec_{D - 1}"]}, enc_feats[D - 1],
            tables.nbr[D - 1], amask)
        logits = nn.Dense(3).apply({"params": up[f"struct_{D - 1}"]}, g)
        status = jnp.where(amask, jnp.argmax(logits, -1).astype(jnp.int32),
                           0)
        return tuple(enc_feats), g, status

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _level_fn(cfg: P.PipelineConfig, d: int):
    """Build level-d decoder features: transposed conv from the parent
    level (octant-specific weights), encoder skip, decoder conv, logits.
    Mirrors the in-graph loop body (models/network.py SparseUNet)."""

    def fn(params, g_parent, enc_feat, pidx, oct_id, eidx, nbr, amask):
        up = params["params"]["unet"]
        pfeat = gs.take_rows(g_parent, pidx)
        w_up = up[f"up_{d + 1}"]   # created while processing level d+1
        h = 0.0
        for o in range(8):
            yo = jnp.dot(pfeat, w_up[o],
                         preferred_element_type=jnp.float32)
            h = h + jnp.where((oct_id == o)[:, None], yo, 0.0)
        skip = gs.take_rows(enc_feat, eidx)
        g = jnp.where(amask[:, None], h + skip, 0.0)
        g = ConvBlock(cfg.f_maps, compute_dtype=cfg.conv_dtype).apply(
            {"params": up[f"dec_{d}"]}, g, nbr, amask)
        logits = nn.Dense(3).apply({"params": up[f"struct_{d}"]}, g)
        status = jnp.where(amask, jnp.argmax(logits, -1).astype(jnp.int32),
                           0)
        return g, status

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _heads_fn(cfg: P.PipelineConfig):
    """Basis/normal/udf heads on the pruned decoder rows — the feature
    tuples the dense-lattice solve consumes (same row layouts as the
    dense/sparse UNet outputs)."""

    def fn(params, g_convs, head_idx):
        up = params["params"]["unet"]
        basis, normals, udf = [], [], []
        for d in range(cfg.tree_depth):
            am = head_idx[d] >= 0
            gd = gs.take_rows(g_convs[d], head_idx[d])
            gd = jnp.where(am[:, None], gd, 0.0)
            basis.append(nn.Dense(cfg.basis_dim).apply(
                {"params": up[f"basis_{d}"]}, gd))
            nf = nn.Dense(3).apply({"params": up[f"normal_{d}"]}, gd)
            normals.append(jnp.where(am[:, None], nf, 0.0))
            if cfg.udf_enabled:
                udf.append(nn.Dense(cfg.udf_dim).apply(
                    {"params": up[f"udf_{d}"]}, g_convs[d]))
        return tuple(basis), tuple(normals), tuple(udf)

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _final_fn(cfg: P.PipelineConfig):
    """Heads on the pruned decoder grids + kernel solve (sort-free)."""
    from ..fields import DecoderFn, LayerField, NeuralField
    from ..models.network import MLP

    def fn(params, xyz, mask, input_normal, dec_svh, g_convs, head_idx,
           pos_sup, grad_sup, prior_idx, udf_svh):
        up = params["params"]["unet"]
        basis, normals = [], []
        for d in range(cfg.tree_depth):
            am = dec_svh.grids[d].active_mask()
            gd = gs.take_rows(g_convs[d], head_idx[d])
            gd = jnp.where(am[:, None], gd, 0.0)
            basis.append(nn.Dense(cfg.basis_dim).apply(
                {"params": up[f"basis_{d}"]}, gd))
            nf = nn.Dense(3).apply({"params": up[f"normal_{d}"]}, gd)
            normals.append(jnp.where(am[:, None], nf, 0.0))
        field = P.solve_kernel_field(
            cfg, params, xyz, mask, input_normal, dec_svh,
            tuple(basis), tuple(normals),
            pos_sup_idx=pos_sup, grad_sup_idx=grad_sup,
            prior_splat_idx=prior_idx)
        if cfg.udf_enabled:
            # UDF mask head lives on the *candidate* grids (pipeline.py
            # udf_svh semantics, reference models/nksr_net.py:116-130)
            udf_feats = tuple(
                nn.Dense(cfg.udf_dim).apply({"params": up[f"udf_{d}"]},
                                            g_convs[d])
                for d in range(cfg.tree_depth))
            udf_dec = DecoderFn(
                params={"params": params["params"]["udf_decoder"]},
                module=MLP(hidden=(2 * cfg.udf_dim,) * 2, out=1))
            mask_field = NeuralField(svh=udf_svh, features=udf_feats,
                                     decoder=udf_dec)
            mask_field = mask_field.set_level_set(2.0 * cfg.voxel_size)
        else:
            mask_field = LayerField(dec_svh, cfg.adaptive_depth)
        return field.set_mask_field(mask_field)

    return jax.jit(fn)


# ------------------------------------------------------------- orchestrator
def reconstruct_predicted_host(params, cfg: P.PipelineConfig,
                               xyz: np.ndarray, xyz_p: np.ndarray,
                               mask: np.ndarray, feat) -> HostField:
    """Predicted-structure reconstruction with host-built grids/tables.

    ``xyz``: (N, 3) raw points; ``xyz_p``/``mask``: capacity-padded; ``feat``
    the padded per-point input features (= normals for feature='normal').
    """
    # direct callers (tests, chunking) may pass an unresolved 'auto'
    # compute dtype — the public Reconstructor resolves it in
    # _runtime_config, but the lattice branch below needs a concrete
    # dtype either way (fields/lattice.py consumes it via jnp.dtype)
    from .reconstructor import resolve_solver_dtype
    cfg = dataclasses.replace(cfg, solver_compute_dtype=resolve_solver_dtype(
        cfg.solver_compute_dtype))

    # default engine: the whole structure-predicting forward as ONE dense
    # jit (models/dense_predicted.py) — no per-level host round-trips.
    # Falls back here (the per-level orchestration below) when the dense
    # lattice would exceed its budget or the prediction prunes everything.
    if os.environ.get("NKSR_PRED_DENSE", "1") == "1" \
            and os.environ.get("NKSR_LATTICE", "1") == "1":
        from .predicted_dense import reconstruct_predicted_dense
        hf = reconstruct_predicted_dense(params, cfg, xyz, xyz_p, mask,
                                         feat)
        if hf is not None:
            return hf
        from ..utils.profiling import log_engine_demotion
        log_engine_demotion(
            "predicted-dense", "host-per-level",
            "lattice budget exceeded or empty prediction")

    D = cfg.tree_depth
    stencil = gs.stencil_offsets(3)
    n, cap_pts = xyz.shape[0], xyz_p.shape[0]
    tm = _Timer()

    # encoder hierarchy: full point splat, exact capacities
    grids, orders = HB.build_splat_grids_ex(xyz, cfg.voxel_size, D)
    caps = tuple(_next_pow2(len(g.keys)) for g in grids)
    cfg = dataclasses.replace(cfg, capacities=caps)
    enc_svh = HB.to_device_svh(grids, caps, cfg.voxel_size)
    tm.lap("splat grids")
    tables = HB.build_unet_tables(grids, caps, stencil)
    tm.lap("unet tables")
    # only the finest level's splat table is needed by the encoder
    splat0 = HB.support_indices(grids[:1], caps[:1], xyz,
                                presorted=orders[:1])[0]
    splat_idx = np.concatenate(
        [splat0, np.full((cap_pts - n, 8), -1, np.int32)])
    tm.lap("splat support")

    enc_feats, g, status_dev = _phase1_fn(cfg)(
        params, jnp.asarray(xyz_p), jnp.asarray(mask), feat, enc_svh,
        tables, jnp.asarray(splat_idx))
    from ..utils.profiling import drain
    drain(status_dev)  # status is consumed on host right below
    tm.lap("phase1 device")

    # level loop: host prunes/refines, device runs the next level's convs
    cand = grids[D - 1]
    cand_cap = caps[D - 1]
    g_convs = [None] * D
    g_convs[D - 1] = g
    dec_host = [None] * D
    head_rows = [None] * D
    cand_host = [None] * D
    cand_caps = [0] * D
    for d in range(D - 1, -1, -1):
        cand_host[d], cand_caps[d] = cand, cand_cap
        nvox = min(len(cand.keys), cand_cap)
        st = np.asarray(status_dev)[:nvox]
        keep = st > 0
        dec_host[d] = HB.prune(cand, keep)
        head_rows[d] = np.nonzero(keep)[0].astype(np.int32)
        if d == 0:
            break
        child, pidx, oct_id = HB.children_of(
            cand, np.nonzero(st == VOXEL_REFINED)[0])
        ccap = _next_pow2(len(child.keys))
        cn = len(child.keys)
        nbr = HB.nbr_table(child, ccap, stencil)
        eidx = np.full(ccap, -1, np.int32)
        eidx[:cn] = np.where(
            (e := HB.keys_lookup(grids[d - 1], child.keys)) < caps[d - 1],
            e, -1)
        pidx_p = np.full(ccap, -1, np.int32)
        pidx_p[:cn] = pidx
        oct_p = np.zeros(ccap, np.int32)
        oct_p[:cn] = oct_id
        amask = np.arange(ccap) < cn
        g, status_dev = _level_fn(cfg, d - 1)(
            params, g_convs[d], enc_feats[d - 1], jnp.asarray(pidx_p),
            jnp.asarray(oct_p), jnp.asarray(eidx), jnp.asarray(nbr),
            jnp.asarray(amask))
        g_convs[d - 1] = g
        cand, cand_cap = child, ccap
    tm.lap("level loop")

    # empty-prediction guard (reference parity:
    # /root/reference/models/nksr_net.py:80-84) — an untrained or
    # mismatched network can prune every voxel; warn instead of silently
    # returning an empty field
    if n > 0 and all(len(g_.keys) == 0 for g_ in dec_host):
        import warnings
        warnings.warn(
            "predicted structure is empty (no decoder voxels survived "
            "pruning) — the network is untrained or unsuited to this "
            "input; pass structure='splat' for a weight-independent "
            "hierarchy", RuntimeWarning)

    # final: heads + solve on the pruned hierarchy
    dec_caps = tuple(_next_pow2(len(g_.keys)) for g_ in dec_host)
    dec_svh = HB.to_device_svh(dec_host, dec_caps, cfg.voxel_size)
    head_idx = tuple(
        jnp.asarray(np.concatenate(
            [r, np.full(dec_caps[d] - len(r), -1, np.int32)]))
        for d, r in enumerate(head_rows))

    tm.lap("dec upload")

    # ---- dense-lattice final solve (default): same engine + device
    # dual-MC as the splat path — the sparse final solve measured
    # ~1.2 s/CG-iteration and host meshing ~150 s at 250k pts where the
    # lattice path does 1M pts end-to-end in ~17 s (BASELINE.md round-2
    # predicted-route split).  Planned FIRST so the sparse-only support
    # tables below are skipped on the default route.
    plan = None
    if os.environ.get("NKSR_PRED_LATTICE", "1") == "1" \
            and os.environ.get("NKSR_LATTICE", "1") == "1" \
            and any(len(g_.keys) for g_ in dec_host):
        from ..fields.lattice import plan_lattice
        plan = plan_lattice(grids, caps, xyz, orders[0][0], orders[0][1],
                            cfg.voxel_size, D, cfg.adaptive_depth,
                            k=cfg.kernel_dim, dec_grids=dec_host,
                            dec_caps=dec_caps)
        tm.lap("lattice plan (pre)")

    pos_sup_n = HB.support_indices(dec_host, dec_caps, xyz,
                                   presorted=orders)
    tm.lap("dec support")
    pos_sup = tuple(
        np.concatenate([s, np.full((cap_pts - n, 8), -1, np.int32)])
        for s in pos_sup_n)
    grad_sup = None
    if plan is None:
        # voxel-center support tables feed only the sparse final solve
        centers_parts = []
        for d in range(cfg.adaptive_depth):
            cpad = np.zeros((dec_caps[d], 3), np.float32)
            nn_ = min(len(dec_host[d].keys), dec_caps[d])
            cpad[:nn_] = dec_host[d].coords[:nn_] * dec_host[d].voxel_size
            centers_parts.append(cpad)
        grad_sup = HB.support_indices(dec_host, dec_caps,
                                      np.concatenate(centers_parts, 0))
    prior_idx = tuple(jnp.asarray(pos_sup[d])
                      for d in range(cfg.adaptive_depth))

    input_normal = feat if cfg.feature == "normal" else None
    udf_svh = HB.to_device_svh(cand_host, cand_caps, cfg.voxel_size) \
        if cfg.udf_enabled else None
    if plan is not None:
        from ..fields.lattice_eval import LatticeEvalContext
        from .reconstructor import _compiled_lattice_solve
        spec = plan.spec
        basis_f, normal_f, udf_f = _heads_fn(cfg)(
            params, tuple(g_convs), head_idx)
        ncap = spec.n_pts_cap
        xs = np.zeros((ncap, 3), np.float32)
        xs[:n] = xyz[plan.pt_perm]
        ms = np.zeros(ncap, bool)
        ms[:n] = True
        c0 = np.zeros((ncap, 3), np.int32)
        c0[:n] = plan.pt_cell0
        dest = np.full(ncap, spec.p_rows * spec.s_pt, np.int32)
        dest[:n] = plan.pt_dest
        tm.lap("lattice plan")
        phase_key = tuple(map(tuple, plan.phase.tolist()))
        field, _dxs, _cg_stats = _compiled_lattice_solve(
            cfg, spec, phase_key)(
            params, jnp.asarray(xs), jnp.asarray(ms),
            jnp.asarray(c0), jnp.asarray(dest),
            jnp.asarray(plan.slot_cell_pt),
            jnp.asarray(plan.slot_cell_gr),
            jnp.asarray(plan.slot_cell0_pt),
            jnp.asarray(plan.slot_cell0_gr),
            jnp.asarray(plan.gr_perm),
            jnp.asarray(plan.gr_coords), jnp.asarray(plan.gr_depth),
            jnp.asarray(plan.gr_active),
            tuple(jnp.asarray(v) for v in plan.vox_cell),
            tuple(jnp.asarray(v) for v in plan.vox_active),
            jnp.asarray(xyz_p), jnp.asarray(mask), input_normal,
            dec_svh, udf_svh, basis_f, normal_f,
            udf_f if cfg.udf_enabled else None, prior_idx)
        if tm.on:
            from ..utils.profiling import drain
            drain(field.alpha)
        tm.lap("final solve (lattice)")
        ctx = LatticeEvalContext(
            spec, plan.origins, params["params"]["interpolators"],
            basis_f, field.alpha,
            tuple(jnp.asarray(v) for v in plan.vox_cell),
            tuple(jnp.asarray(v) for v in plan.vox_active),
            cfg.voxel_size, cfg.approx_kernel_grad,
            compute_dtype=cfg.solver_compute_dtype)
        from .reconstructor import _check_solver_stats
        return HostField(field, cfg, dec_host, dec_caps,
                         cfg.adaptive_depth,
                         udf_host=cand_host if cfg.udf_enabled else None,
                         udf_caps=tuple(cand_caps), lattice_ctx=ctx,
                         solver_stats=_check_solver_stats(_cg_stats, cfg))

    field = _final_fn(cfg)(
        params, jnp.asarray(xyz_p), jnp.asarray(mask), input_normal,
        dec_svh, tuple(g_convs), head_idx,
        tuple(jnp.asarray(s) for s in pos_sup),
        tuple(jnp.asarray(s) for s in grad_sup), prior_idx, udf_svh)
    if tm.on:
        from ..utils.profiling import drain
        drain(field.alpha)
    tm.lap("final solve")
    return HostField(field, cfg, dec_host, dec_caps, cfg.adaptive_depth,
                     udf_host=cand_host if cfg.udf_enabled else None,
                     udf_caps=tuple(cand_caps))
