"""Public reconstruction API: ``Reconstructor(...).reconstruct(...)``.

Mirrors the reference's end-user contract
(/root/reference/examples/recons_simple.py:25-27,
/root/reference/examples/recons_waymo.py:30-37, NKSR-USAGE.md:128-137):

    recon = Reconstructor()
    field = recon.reconstruct(xyz, normal, detail_level=1.0)
    mesh  = field.extract_dual_mesh(mise_iter=1)   # mesh.v / mesh.f / mesh.c

Host-side orchestration only — capacity bucketing, detail-level heuristics,
preprocessing and chunk scheduling; every hot op runs inside the jitted
pipeline (models/pipeline.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import pipeline as P
from ..ops import knn as K


def _next_pow2(n: int) -> int:
    return 1 << max(8, int(math.ceil(math.log2(max(n, 1)))))


def resolve_solver_dtype(dt: str) -> str:
    """'auto' -> bf16 on TPU-class backends (half the HBM traffic on the
    CG matvec's dominant streams; accumulation stays f32), f32 on CPU."""
    if dt != "auto":
        return dt
    return "float32" if jax.default_backend() == "cpu" else "bfloat16"


def _probe_spec():
    from ..fields import lattice as LAT
    # non-nested dims on purpose: real plans carry coarse margins
    # (bench: dims (408,...)/(208,...)), so the probe must exercise the
    # window-padding path, not just power-of-two nesting
    return LAT.LatticeSpec(
        dims=((24, 24, 16), (14, 14, 8)), k=4, depth=2,
        adaptive_depth=1, s_pt=8, p_rows=4, s_gr=8, n_pts_cap=8)


def _probe_once(fn) -> Exception | None:
    """Run one probe attempt; None on success, the exception on failure.
    Retried once by the cached wrappers: a transient platform hiccup
    (compile-RPC timeout on the tunneled TPU, host-CPU starvation) must
    not silently demote the engine for the whole process.

    The probe MUST run outside any jit trace (callers resolve engines
    eagerly, at factory time): probing while tracing stages the probe's
    ops into the enclosing trace and fails spuriously — which is how the
    cascade silently demoted to XLA on exactly the path the probe exists
    to accelerate."""
    try:
        from jax._src import core as _core
        tr = getattr(_core.trace_ctx, "trace", None)
        # tr is None when the private API drifted (.trace renamed):
        # treat as eager and let the probe itself decide, rather than
        # permanently reporting in-trace
        in_trace = tr is not None and not isinstance(tr, _core.EvalTrace)
    except Exception:   # trace_ctx itself renamed — same policy
        in_trace = False
    if in_trace:
        return RuntimeError(
            "engine probe reached inside a jit trace — resolve engines "
            "eagerly before tracing")
    try:
        fn()
        return None
    except Exception as e:   # noqa: BLE001 — probe must never raise
        return e


@functools.lru_cache(maxsize=1)
def _pallas_fwd_ok() -> bool:
    """One-time tiny on-device probe: does Mosaic compile+run the
    forward cascade kernel here?  Keeps 'auto' safe on platforms where
    the Pallas path is unavailable or regresses."""
    from ..fields import lattice_pallas as LP
    spec = _probe_spec()

    def run():
        xs = tuple(jnp.zeros((spec.n_cells(d) * 4 // 128, 128))
                   for d in range(2))
        np.asarray(LP.av0_cascade_pallas(spec, xs, jnp.float32,
                                         interpret=False))

    err = _probe_once(run)
    if err is not None:
        err = _probe_once(run)   # one retry for transient failures
    if err is not None:
        _pallas_fwd_ok.last_error = f"{type(err).__name__}: {err}"[:300]
        return False
    return True


@functools.lru_cache(maxsize=1)
def _pallas_adj_ok() -> bool:
    """Same one-time probe for the adjoint cascade kernel (probed
    separately: the two kernels stress different Mosaic features, and a
    hybrid Pallas-forward/XLA-adjoint matvec is still a win)."""
    from ..fields import lattice_pallas as LP
    spec = _probe_spec()

    def run():
        out = LP.av0_adjoint_cascade_pallas(
            spec, jnp.zeros((spec.n_cells(0), spec.lanes)),
            interpret=False)
        np.asarray(out[0])

    err = _probe_once(run)
    if err is not None:
        err = _probe_once(run)
    if err is not None:
        _pallas_adj_ok.last_error = f"{type(err).__name__}: {err}"[:300]
        return False
    return True


def resolve_cascade_engine(eng: str) -> str:
    """'auto' -> the XLA shift/upsample cascade everywhere.

    The Pallas cascade stays OPT-IN (``NKSR_CASCADE=pallas`` /
    ``pallas-fwd`` / ``auto-probe``): on this sandbox's remote-compiled
    Mosaic backend, round-4 measurements (DESIGN.md "Mosaic compile
    helper") showed the first Mosaic compile of a process blocks for an
    UNBOUNDED 3-35+ minutes of helper warmup, and the cascade kernels'
    narrow-tile pack relayouts ((256,32)->(64,128)) crash the compile
    helper deterministically after it — so probing Mosaic from 'auto'
    would hang a ``Reconstructor()`` user's first reconstruct for up to
    half an hour before demoting.  ``auto-probe`` restores the probing
    behavior for platforms with a working local Mosaic."""
    eng = os.environ.get("NKSR_CASCADE", eng)
    if eng == "auto":
        return "xla"
    if eng != "auto-probe":
        return eng
    if jax.default_backend() == "cpu":
        return "xla"
    from ..utils.profiling import log_engine_demotion
    if _pallas_fwd_ok():
        if _pallas_adj_ok():
            return "pallas"
        log_engine_demotion(
            "pallas-cascade", "pallas-fwd+xla-adjoint",
            "Mosaic probe failed on the adjoint kernel: "
            + getattr(_pallas_adj_ok, "last_error", "?"))
        return "pallas-fwd"
    log_engine_demotion("pallas-cascade", "xla-cascade",
                        "Mosaic probe failed on this backend: "
                        + getattr(_pallas_fwd_ok, "last_error", "?"))
    return "xla"


# total dense cells (all depths) x f_maps the conv3d UNet may hold; it
# keeps ~3-4 feature lattices of that size live (measured ~3 GB at the
# 1M-pt bench: 6.2M cells x 32 maps) — beyond this, demote to the
# gather-conv UNet rather than risk HBM exhaustion
DENSE_UNET_CELLMAP_BUDGET = 400_000_000


def use_dense_unet(spec, cfg) -> bool:
    """Default-on dense conv3d UNet wherever the lattice plan exists and
    the feature lattices fit the budget.  NKSR_DENSE_UNET=0/1 overrides."""
    env = os.environ.get("NKSR_DENSE_UNET", "auto")
    if env in ("0", "1"):
        return env == "1"
    total = sum(spec.n_cells(d) for d in range(spec.depth))
    if total * cfg.f_maps <= DENSE_UNET_CELLMAP_BUDGET:
        return True
    from ..utils.profiling import log_engine_demotion
    log_engine_demotion(
        "dense-unet", "gather-conv-unet",
        f"{total} cells x {cfg.f_maps} maps exceeds the HBM budget")
    return False


@functools.lru_cache(maxsize=32)
def _compiled_forward(cfg: P.PipelineConfig):
    def fn(params, xyz, mask, feat):
        out = P.forward(cfg, params, xyz, mask, feat,
                        gt_svh=None, use_gt_structure=False)
        return out.field
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _compiled_structure(cfg: P.PipelineConfig):
    """Sort-free network pass (encoder + UNet + heads) over host tables.

    Split from the solve so the host can build the solve's support tables
    WHILE the device runs the network (dispatch is async)."""
    def fn(params, xyz, mask, feat, enc_svh, gt_svh, tables, splat_idx):
        net = cfg.network()
        out, dec_svh, udf_svh = net.apply(
            params, xyz, feat, mask, enc_svh, gt_svh, True,
            cfg.capacities, tables=tables, point_splat_idx=splat_idx)
        return out, dec_svh, udf_svh
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _compiled_dense_unet(cfg: P.PipelineConfig, spec,
                         splat_sorted: bool = False):
    """Dense conv3d UNet over the solve lattice (models/dense_unet.py):
    zero gathers in the convolutions — replaces _compiled_structure on
    the lattice path when NKSR_DENSE_UNET=1.  ``splat_sorted``: caller
    guarantees points are depth-0-cell-sorted with the pad tail mapped
    past the lattice end (sorted encoder splat scatters)."""
    from ..models import dense_unet as DU

    def fn(params, origins, tables, xyz, feat, mask, base0=None):
        return DU.dense_unet_apply(cfg, params, spec, origins, tables,
                                   xyz, feat, mask,
                                   splat_sorted=splat_sorted, base0=base0)
    return jax.jit(fn)


def _splat_normals_dense(spec, origins, d, voxel_size, xyz, normal, mask,
                         vox_cell, vox_active):
    """Normal prior on the dense lattice: trilinear scatter + one gather
    at the voxel cells — identical rows to splat_normals_to_grid (the
    sparse scatter drops inactive corners; here they land in inactive
    cells that the gather never reads)."""
    from ..models.dense_unet import packed_corner_splat
    vs_d = voxel_size * (2.0 ** d)
    g = xyz / vs_d
    base = jnp.floor(g).astype(jnp.int32)
    frac = g - base.astype(jnp.float32)
    offs = jnp.asarray(np.stack(np.meshgrid(*([np.arange(2)] * 3),
                                            indexing="ij"),
                                -1).reshape(8, 3), jnp.int32)
    w = jnp.prod(jnp.where(offs[None].astype(bool), frac[:, None, :],
                           1.0 - frac[:, None, :]), axis=-1)
    wm = jnp.where(mask[:, None], w, 0.0)
    # one wide-row scatter + dense shifts instead of 8N narrow scatter
    # rows (see packed_corner_splat; was the 8-corner scalar scatter)
    blocks = normal[:, None, :] * wm[..., None]            # (N, 8, 3)
    acc = packed_corner_splat(spec.dims[d], base - origins[d][None, :],
                              blocks, False)
    rows = jnp.take(acc, vox_cell, axis=0)
    rows = jnp.where(vox_active[:, None], rows, 0.0)
    return rows / (jnp.linalg.norm(rows, axis=-1, keepdims=True) + 1e-6)


def _check_solver_stats(cg_stats, cfg):
    """Wrap raw (iters, rel_res) device scalars as lazy SolverStats.

    In timing mode (NKSR_TIMING=1, where the pipeline already drains
    between phases) the check is eager and an unconverged solve is
    logged loudly — a solve that stops on max_iters with rel_res above
    tol returns a trajectory-dependent solution (the round-4 parity
    regression: two f32 reduction orders of the SAME system differed by
    3.8% in field value at 40 unconverged iterations)."""
    from .host_field import SolverStats
    stats = SolverStats(cg_stats[0], cg_stats[1], cfg.solver_tol,
                        cfg.solver_max_iters)
    if os.environ.get("NKSR_TIMING", "0") == "1" and not stats.converged:
        from ..utils.profiling import log_engine_demotion
        log_engine_demotion(
            "cg-converged", "cg-max-iters",
            f"solve stopped at {stats.iters} iters with rel_res "
            f"{stats.rel_res:.2e} > tol {stats.tol:.0e}")
    return stats


@functools.lru_cache(maxsize=32)
def _compiled_lattice_solve(cfg: P.PipelineConfig, spec, phase_key,
                            dense_prior: bool = False):
    """Dense-lattice kernel solve (fields/lattice.py) + mask attachment.

    The TPU-native solve engine: per-CG-iteration work is dense shifts +
    batched einsums instead of sparse row gathers (see lattice.py header
    for the measured rationale).  ``dense_prior``: compute the residual
    normal prior by dense scatter+gather (the NKSR_DENSE_UNET path —
    prior_splat_idx then carries the per-depth lattice ORIGINS row
    instead of index tables)."""
    from ..fields import DecoderFn, LayerField, NeuralField
    from ..fields import lattice as LAT
    from ..fields.kernel_field import KernelField
    from ..fields.support import InterpolatorFn
    from ..models.network import MLP, Interpolators

    # STATIC phase (keyed into the jit cache): keeps the AV0 upsample
    # chain fusable — see fields.lattice._upsample_to_0
    phase = np.asarray(phase_key, np.int32)
    # resolve the engine EAGERLY, before jit traces fn: the Mosaic probe
    # cannot run inside a trace (see _probe_once)
    cascade_eng = resolve_cascade_engine(cfg.cascade_engine)

    def fn(params, xyz_sorted, mask_sorted, pt_cell0, pt_dest,
           slot_cells_pt, slot_cells_gr, slot_cell0_pt, slot_cell0_gr,
           gr_perm, gr_coords, gr_depth, gr_active,
           vox_cell, vox_active, xyz_p, mask, input_normal,
           dec_svh, udf_svh, basis_feats, normal_feats, udf_feats,
           prior_splat_idx):
        interp = InterpolatorFn(
            params={"params": params["params"]["interpolators"]},
            module=Interpolators(depth=cfg.tree_depth,
                                 kernel_dim=cfg.kernel_dim,
                                 n_hidden=cfg.interp_layers,
                                 hidden_dim=cfg.interp_hidden))
        # gradient targets: residual normal head on the splat prior
        # (reference weighting /root/reference/models/nksr_net.py:100-112)
        nvals = []
        for d in range(cfg.adaptive_depth):
            nv = normal_feats[d]
            if input_normal is not None:
                if dense_prior:
                    prior = _splat_normals_dense(
                        spec, prior_splat_idx, d, cfg.voxel_size,
                        xyz_p, input_normal, mask,
                        vox_cell[d], vox_active[d])
                else:
                    prior = P.splat_normals_to_grid(
                        dec_svh.grids[d], xyz_p, input_normal, mask,
                        splat_idx=prior_splat_idx[d])
                nv = prior + nv
            nvals.append(nv)
        gr_targets = -jnp.concatenate(nvals, 0)
        alphas, dense_xs, cg_stats = LAT.lattice_solve(
            spec, interp, basis_feats, xyz_sorted, mask_sorted,
            pt_cell0, pt_dest, slot_cells_pt, slot_cells_gr,
            gr_coords, gr_depth, gr_active, gr_targets,
            vox_cell, vox_active,
            voxel_size=cfg.voxel_size,
            pos_weight=cfg.pos_weight, normal_weight=cfg.normal_weight,
            reg_weight=cfg.reg_weight, tol=cfg.solver_tol,
            max_iters=cfg.solver_max_iters,
            approx_grad=cfg.approx_kernel_grad,
            slot_cell0_pt=slot_cell0_pt, slot_cell0_gr=slot_cell0_gr,
            gr_perm=gr_perm,
            phase=phase, compute_dtype=cfg.solver_compute_dtype,
            formulation=cfg.solver_formulation,
            cascade_engine=cascade_eng, return_dense=True,
            return_stats=True)
        field = KernelField(
            svh=dec_svh, features=basis_feats, interp=interp,
            alpha=alphas, kernel_dim=cfg.kernel_dim,
            approx_kernel_grad=cfg.approx_kernel_grad)
        if cfg.udf_enabled:
            udf_dec = DecoderFn(
                params={"params": params["params"]["udf_decoder"]},
                module=MLP(hidden=(2 * cfg.udf_dim,) * 2, out=1))
            mf = NeuralField(svh=udf_svh, features=udf_feats,
                             decoder=udf_dec)
            mf = mf.set_level_set(2.0 * cfg.voxel_size)
        else:
            mf = LayerField(dec_svh, cfg.adaptive_depth)
        # the packed solution lattices ride along so the lattice
        # evaluator skips re-scattering them (fields/lattice_eval.py)
        return field.set_mask_field(mf), dense_xs, cg_stats
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _compiled_gr_targets(cfg: P.PipelineConfig, spec):
    """Gradient targets for the sharded solve: residual normal head on
    the dense splat prior (the same rows _compiled_lattice_solve builds
    inline; the sharded solve takes them as an explicit input)."""
    def fn(normal_feats, xyz_p, mask, input_normal, origins, vox_cell,
           vox_active):
        nvals = []
        for d in range(cfg.adaptive_depth):
            nv = normal_feats[d]
            if input_normal is not None:
                prior = _splat_normals_dense(
                    spec, origins, d, cfg.voxel_size, xyz_p,
                    input_normal, mask, vox_cell[d], vox_active[d])
                nv = prior + nv
            nvals.append(nv)
        return -jnp.concatenate(nvals, 0)
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _compiled_solve(cfg: P.PipelineConfig):
    """Sort-free kernel solve + mask attachment (phase 2 of the splat
    path; mirrors the tail of models/pipeline.forward)."""
    from ..fields import DecoderFn, LayerField, NeuralField
    from ..models.network import MLP

    def fn(params, xyz, mask, input_normal, dec_svh, udf_svh,
           basis_feats, normal_feats, udf_feats, pos_sup, grad_sup):
        prior_idx = tuple(pos_sup[d] for d in range(cfg.adaptive_depth))
        field = P.solve_kernel_field(
            cfg, params, xyz, mask, input_normal, dec_svh,
            basis_feats, normal_feats,
            pos_sup_idx=pos_sup, grad_sup_idx=grad_sup,
            prior_splat_idx=prior_idx)
        if cfg.udf_enabled:
            udf_dec = DecoderFn(
                params={"params": params["params"]["udf_decoder"]},
                module=MLP(hidden=(2 * cfg.udf_dim,) * 2, out=1))
            mf = NeuralField(svh=udf_svh, features=udf_feats,
                             decoder=udf_dec)
            mf = mf.set_level_set(2.0 * cfg.voxel_size)
        else:
            mf = LayerField(dec_svh, cfg.adaptive_depth)
        return field.set_mask_field(mf)
    return jax.jit(fn)


class NetworkHandle:
    """API-parity shim for ``reconstructor.network`` (movable ``.to``,
    loadable state dict — /root/reference/NKSR-USAGE.md:164)."""

    def __init__(self, cfg: P.PipelineConfig, params):
        self.cfg = cfg
        self.params = params

    def to(self, device):
        return self  # JAX manages placement; kept for API compatibility

    def load_state_dict(self, state_dict):
        from ..utils.checkpoint import (import_reference_state_dict,
                                        looks_like_reference_state_dict,
                                        torch_state_dict_to_params)
        if looks_like_reference_state_dict(state_dict):
            # published wheel layout (ks/snet/p2s/carla —
            # utils/checkpoint.py REFERENCE_FAMILIES): family-wise
            # order+shape import with a loud per-family report
            self.params, report = import_reference_state_dict(
                state_dict, self.params)
            for fam, status in report.items():
                print(f"[nksr_tpu] checkpoint import: {fam}: {status}")
            return self
        self.params = torch_state_dict_to_params(self.cfg, state_dict,
                                                 self.params)
        return self


class Reconstructor:
    """Neural-kernel surface reconstruction engine.

    ``device`` is accepted for API parity with the reference and ignored
    (JAX places arrays on the default device/mesh).
    """

    def __init__(self, device=None, config: Optional[P.PipelineConfig] = None,
                 params=None, seed: int = 0):
        self.config = config or P.PipelineConfig()
        if params is None:
            params = P.init_params(self.config, jax.random.PRNGKey(seed))
        self.network = NetworkHandle(self.config, params)
        self.chunk_tmp_device = None  # parity attr; chunks park on host

    # ------------------------------------------------------------------ api
    def reconstruct(self, input_xyz, input_normal=None, *,
                    sensor=None, detail_level: Optional[float] = 0.0,
                    voxel_size: Optional[float] = None,
                    chunk_size: Optional[float] = None,
                    preprocess_fn: Optional[Callable] = None,
                    approx_kernel_grad: bool = False,
                    solver_tol: float = 1e-5,
                    solver_max_iters: Optional[int] = None,
                    fused_mode: bool = False,
                    structure: Optional[str] = None,
                    mesh=None):
        """Reconstruct an implicit field from a point cloud.

        Parameter semantics follow the reference ``Reconstructor``
        (NKSR-USAGE.md:128-137).  ``fused_mode``: the reference's fused
        solve recomputes kernel supports inside each CG matvec instead of
        materializing them (memory for compute).  Our default
        dense-lattice engine (fields/lattice.py) is *always* matrix-free
        in that sense — the AV0 cascade is recomputed per matvec and no
        Gram matrix or per-row support tensor is ever materialized — so
        on the lattice path the flag is satisfied by construction and
        both values take the same (fused) engine.  Only the sparse
        fallback (NKSR_LATTICE=0 / oversized bboxes) distinguishes the
        two variants (fields/kernel_field.py solve_fused/solve_non_fused).
        """
        xyz = np.asarray(input_xyz, np.float32)
        normal = None if input_normal is None else np.asarray(
            input_normal, np.float32)
        sens = None if sensor is None else np.asarray(sensor, np.float32)

        if preprocess_fn is not None:
            xyz, normal, sens = preprocess_fn(xyz, normal, sens)
            xyz = np.asarray(xyz, np.float32)
            normal = None if normal is None else np.asarray(normal,
                                                            np.float32)

        if chunk_size is not None:
            if voxel_size is not None or (detail_level or 0.0) != 0.0:
                # matches the reference restriction (NKSR-USAGE.md:137)
                raise ValueError(
                    "detail tuning is not supported in chunk mode; "
                    "prescale your cloud instead")
            if mesh is not None:
                # chunk axis sharded over the device mesh (parallel/)
                from ..parallel.spatial import reconstruct_chunks_sharded
                return reconstruct_chunks_sharded(
                    self, xyz, normal, sens, chunk_size, mesh,
                    approx_kernel_grad=approx_kernel_grad,
                    solver_tol=solver_tol)
            from .chunking import reconstruct_chunked
            return reconstruct_chunked(self, xyz, normal, sens, chunk_size,
                                       approx_kernel_grad=approx_kernel_grad,
                                       solver_tol=solver_tol)

        vs = self._pick_voxel_size(xyz, detail_level, voxel_size)
        cfg = self._runtime_config(
            xyz.shape[0], xyz, vs, approx_kernel_grad, solver_tol,
            solver_max_iters,
            feature="normal" if normal is not None else "sensor",
            fused_mode=fused_mode)
        if structure is not None:
            cfg = dataclasses.replace(cfg, structure_mode=structure)

        n = xyz.shape[0]
        cap_pts = _next_pow2(n)
        pad = cap_pts - n
        xyz_p = np.pad(xyz, ((0, pad), (0, 0)))
        mask = np.zeros(cap_pts, bool)
        mask[:n] = True
        feat = P.point_features(
            cfg, jnp.asarray(xyz_p),
            normal=None if normal is None else jnp.asarray(
                np.pad(normal, ((0, pad), (0, 0)))),
            sensor=None if sens is None else jnp.asarray(
                np.pad(sens, ((0, pad), (0, 0)))))

        if mesh is not None:
            # no chunk_size: shard ONE scene's lattice into x-slabs over
            # the device mesh, halos over ICI (SURVEY §5 north star;
            # reference chunked-engine analog NKSR-USAGE.md:88-126)
            if cfg.structure_mode in ("splat", "adaptive"):
                return self._reconstruct_sharded(cfg, xyz, xyz_p, mask,
                                                 feat, normal, mesh)
            if cfg.structure_mode == "predicted":
                # the predicted plan rides the same sharded lattice
                # engine as the splat plan (predicted_dense.py)
                from .predicted_dense import reconstruct_predicted_sharded
                f = reconstruct_predicted_sharded(
                    self.network.params, cfg, xyz, xyz_p, mask, feat,
                    mesh)
                if f is not None:
                    return f
            from ..utils.profiling import log_engine_demotion
            log_engine_demotion(
                "sharded-svh-solve", "single-device",
                f"structure='{cfg.structure_mode}' solve not sharded "
                "(unsupported structure mode or oversized plan)")

        if cfg.structure_mode in ("splat", "adaptive"):
            return self._reconstruct_host(cfg, xyz, xyz_p, mask, feat,
                                          normal=normal)
        if cfg.structure_mode == "predicted":
            # two-phase host-orchestrated variant of the reference default:
            # sort-free device jits, host grid pruning between levels
            from .host_predicted import reconstruct_predicted_host
            return reconstruct_predicted_host(
                self.network.params, cfg, xyz, xyz_p, mask, feat)

        # 'predicted_ingraph': the fully-traced single-jit forward — used
        # by training and as the parity reference for the host path
        fwd = _compiled_forward(cfg)
        field = fwd(self.network.params, jnp.asarray(xyz_p),
                    jnp.asarray(mask), feat)
        return field

    def _reconstruct_host(self, cfg, xyz, xyz_p, mask, feat, normal=None):
        """Host-built structures + sort-free device jits
        (see core/host_build.py).  ``structure_mode='adaptive'`` builds the
        normal-variation hierarchy (flat regions stay coarse) instead of
        the full splat."""
        from ..core import host_build as HB
        from ..ops.gather_scatter import stencil_offsets
        from .host_field import HostField
        from .host_predicted import _Timer

        tm = _Timer()
        # one pass builds grids AND the sorted point-base keys reused for
        # the support tables; capacities come from the exact counts
        grids, orders = HB.build_splat_grids_ex(
            xyz, cfg.voxel_size, cfg.tree_depth)
        if cfg.structure_mode == "adaptive":
            assert normal is not None, \
                "adaptive structure needs input normals"
            dec_grids = HB.build_adaptive_grids(
                xyz, normal, cfg.voxel_size, cfg.tree_depth,
                tau=cfg.adaptive_tau, adaptive_depth=cfg.adaptive_depth,
                splat=(grids, orders))
        else:
            dec_grids = grids
        tm.lap("splat grids")
        caps = tuple(max(_next_pow2(int(len(g.keys) * 1.05)), 512)
                     for g in grids)
        dec_caps = caps if dec_grids is grids else tuple(
            max(_next_pow2(int(len(g.keys) * 1.05)), 512)
            for g in dec_grids)
        cfg = dataclasses.replace(cfg, capacities=caps)
        enc_svh = HB.to_device_svh(grids, caps, cfg.voxel_size)
        gt_svh = enc_svh if dec_grids is grids else \
            HB.to_device_svh(dec_grids, dec_caps, cfg.voxel_size)
        n, cap_pts = xyz.shape[0], xyz_p.shape[0]
        pad8 = np.full((cap_pts - n, 8), -1, np.int32)

        import os as _os
        if _os.environ.get("NKSR_LATTICE", "1") == "1":
            from ..fields.lattice import plan_lattice
            plan = plan_lattice(
                grids, caps, xyz, orders[0][0], orders[0][1],
                cfg.voxel_size, cfg.tree_depth, cfg.adaptive_depth,
                k=cfg.kernel_dim,
                dec_grids=None if dec_grids is grids else dec_grids,
                dec_caps=None if dec_grids is grids else dec_caps)
        else:
            plan = None
        dense_unet = plan is not None and use_dense_unet(plan.spec, cfg)
        self._last_unet_engine = "dense" if dense_unet else "sparse"

        if dense_unet:
            # conv3d UNet on the solve lattice: no neighbor tables, no
            # gather convolutions (models/dense_unet.py)
            from ..models import dense_unet as DU
            from ..models.network import NetworkOutput
            tm.lap("lattice plan (pre-net)")
            # pre-upload the solve's plan arrays (~100 MB) ON A THREAD
            # while the main thread builds the dense tables / sorted
            # point arrays: the device is still idle (nothing
            # dispatched), so the transfer rides the tunnel at full
            # speed (device_put serializes with running compute on this
            # platform: 0.23 s idle vs 1.94 s mid-compute for 67 MB),
            # and the ~0.3 s of host prep below now overlaps it
            import threading
            _upl: dict = {}

            def _upload_solve_arrays():
                try:
                    ncap_ = plan.spec.n_pts_cap
                    xs_h = np.zeros((ncap_, 3), np.float32)
                    xs_h[:n] = xyz[plan.pt_perm]
                    ms_h = np.zeros(ncap_, bool)
                    ms_h[:n] = True
                    c0_h = np.zeros((ncap_, 3), np.int32)
                    c0_h[:n] = plan.pt_cell0
                    dest_h = np.full(
                        ncap_, plan.spec.p_rows * plan.spec.s_pt,
                        np.int32)
                    dest_h[:n] = plan.pt_dest
                    _upl["dev"] = jax.device_put(
                        (xs_h, ms_h, c0_h, dest_h,
                         plan.slot_cell_pt, plan.slot_cell_gr,
                         plan.slot_cell0_pt, plan.slot_cell0_gr,
                         plan.gr_perm, plan.gr_coords, plan.gr_depth,
                         plan.gr_active, tuple(plan.vox_cell),
                         tuple(plan.vox_active), xyz_p, mask,
                         feat if cfg.feature == "normal" else None))
                except Exception as e:       # surfaced at join
                    _upl["err"] = e

            _upl_th = threading.Thread(target=_upload_solve_arrays,
                                       daemon=True)
            _upl_th.start()
            dt = DU.build_tables(plan.spec, plan.origins, grids, caps,
                                 dec_grids, dec_caps)
            # depth-0-cell-sorted points (reusing the host sort) turn the
            # encoder splat into 8 sorted per-corner scatters — measured
            # 884 ms of the 1.5 s dense UNet as one unsorted scalar
            # scatter (BASELINE.md round-2 split).  The pad tail maps
            # past the lattice end so sortedness holds through it.
            perm = orders[0][1]
            perm_p = np.concatenate(
                [perm, np.arange(n, cap_pts)]).astype(np.int32)
            xyz_s = np.empty((cap_pts, 3), np.float32)
            xyz_s[:n] = xyz[perm]
            xyz_s[n:] = (plan.origins[0].astype(np.float64)
                         + np.asarray(plan.spec.dims[0]) + 8.0) \
                * cfg.voxel_size
            # host-computed base cells: device floor(xyz/vs) could
            # round differently from the numpy floor the plan is built
            # from; the plan's own sorted cells remove the hazard
            base0_s = np.empty((cap_pts, 3), np.int32)
            base0_s[:n] = HB.unpack64(orders[0][0])
            base0_s[n:] = plan.origins[0] + np.asarray(
                plan.spec.dims[0]) + 8
            feat_s = jnp.take(feat, jnp.asarray(perm_p), axis=0) \
                if feat is not None else None
            _upl_th.join()
            if "err" in _upl:
                raise _upl["err"]
            solve_dev = _upl["dev"]
            tm.lap("solve upload (threaded, pre-net)")
            basis_f, normal_f, struct_f, udf_f = _compiled_dense_unet(
                cfg, plan.spec, True)(
                self.network.params, jnp.asarray(plan.origins.astype(
                    np.int32)), dt, jnp.asarray(xyz_s), feat_s,
                jnp.asarray(mask), jnp.asarray(base0_s))
            out = NetworkOutput(
                basis_features=basis_f, normal_features=normal_f,
                structure_features=struct_f, udf_features=udf_f)
            dec_svh, udf_svh = gt_svh, enc_svh
            if tm.on and _os.environ.get("NKSR_TIMING_SYNC", "0") == "1":
                from ..utils.profiling import drain
                drain(out.basis_features)
                tm.lap("dense unet (sync)")
            tm.lap("dispatch dense unet")
        else:
            tables = HB.build_unet_tables(grids, caps, stencil_offsets(3))
            tm.lap("unet tables")
            splat0 = HB.support_indices(grids[:1], caps[:1], xyz,
                                        presorted=orders[:1])[0]
            splat_idx = np.concatenate([splat0, pad8])

            # dispatch the network NOW (async) — the device runs it while
            # the host builds the solve's support tables below
            out, dec_svh, udf_svh = _compiled_structure(cfg)(
                self.network.params, jnp.asarray(xyz_p),
                jnp.asarray(mask), feat, enc_svh, gt_svh, tables,
                jnp.asarray(splat_idx))
            if tm.on and _os.environ.get("NKSR_TIMING_SYNC", "0") == "1":
                # kills the host/device overlap — phase attribution only
                from ..utils.profiling import drain
                drain(out.basis_features)
                tm.lap("network (sync)")
            tm.lap("dispatch structure")

        input_normal = feat if cfg.feature == "normal" else None
        if plan is not None:
            spec = plan.spec
            if dense_unet:
                # dense prior: no host support tables at all — the solve
                # scatters normals onto the lattice itself
                prior_idx = jnp.asarray(plan.origins.astype(np.int32))
            elif dec_grids is grids:
                prior_idx = (jnp.asarray(splat_idx),) + tuple(
                    jnp.asarray(np.concatenate([s, pad8]))
                    for s in HB.support_indices(
                        grids[1:cfg.adaptive_depth],
                        caps[1:cfg.adaptive_depth], xyz,
                        presorted=orders[1:cfg.adaptive_depth]))
            else:
                prior_idx = tuple(
                    jnp.asarray(np.concatenate([s, pad8]))
                    for s in HB.support_indices(
                        dec_grids[:cfg.adaptive_depth],
                        dec_caps[:cfg.adaptive_depth], xyz,
                        presorted=orders[:cfg.adaptive_depth]))
            if dense_unet:
                # plan arrays were device_put BEFORE the network
                # dispatch (see "solve upload (pre-net)")
                (xs_d, ms_d, c0_d, dest_d, scp_d, scg_d, sc0p_d,
                 sc0g_d, grp_d, grc_d, grd_d, gra_d, vc_d, va_d,
                 xyzp_d, mask_d, inorm_d) = solve_dev
            else:
                ncap = spec.n_pts_cap
                xs = np.zeros((ncap, 3), np.float32)
                xs[:n] = xyz[plan.pt_perm]
                ms = np.zeros(ncap, bool)
                ms[:n] = True
                c0 = np.zeros((ncap, 3), np.int32)
                c0[:n] = plan.pt_cell0
                dest = np.full(ncap, spec.p_rows * spec.s_pt, np.int32)
                dest[:n] = plan.pt_dest
                (xs_d, ms_d, c0_d, dest_d, scp_d, scg_d, sc0p_d,
                 sc0g_d, grp_d, grc_d, grd_d, gra_d, vc_d, va_d,
                 xyzp_d, mask_d, inorm_d) = (
                    jnp.asarray(xs), jnp.asarray(ms), jnp.asarray(c0),
                    jnp.asarray(dest), jnp.asarray(plan.slot_cell_pt),
                    jnp.asarray(plan.slot_cell_gr),
                    jnp.asarray(plan.slot_cell0_pt),
                    jnp.asarray(plan.slot_cell0_gr),
                    jnp.asarray(plan.gr_perm),
                    jnp.asarray(plan.gr_coords),
                    jnp.asarray(plan.gr_depth),
                    jnp.asarray(plan.gr_active),
                    tuple(jnp.asarray(v) for v in plan.vox_cell),
                    tuple(jnp.asarray(v) for v in plan.vox_active),
                    jnp.asarray(xyz_p), jnp.asarray(mask), input_normal)
            tm.lap("lattice plan")
            phase_key = tuple(map(tuple, plan.phase.tolist()))
            field, dxs, cg_stats = _compiled_lattice_solve(
                cfg, spec, phase_key, dense_prior=dense_unet)(
                self.network.params, xs_d, ms_d, c0_d, dest_d,
                scp_d, scg_d, sc0p_d, sc0g_d, grp_d, grc_d, grd_d,
                gra_d, vc_d, va_d, xyzp_d, mask_d, inorm_d,
                dec_svh, udf_svh, out.basis_features,
                out.normal_features, out.udf_features, prior_idx)
            if tm.on:
                from ..utils.profiling import drain
                drain(field.alpha)
            tm.lap("lattice solve")
            from ..fields.lattice_eval import LatticeEvalContext
            ctx = LatticeEvalContext(
                spec, plan.origins,
                self.network.params["params"]["interpolators"],
                out.basis_features, field.alpha,
                vc_d, va_d,
                cfg.voxel_size, cfg.approx_kernel_grad,
                compute_dtype=cfg.solver_compute_dtype,
                dense_xs=dxs)
            return HostField(
                field, cfg, dec_grids, dec_caps, cfg.adaptive_depth,
                udf_host=grids if cfg.udf_enabled else None,
                udf_caps=caps, lattice_ctx=ctx,
                solver_stats=_check_solver_stats(cg_stats, cfg))

        # ---- sparse fallback (huge bboxes / NKSR_LATTICE=0) -------------
        # solve supports live on the DECODER hierarchy
        if dec_grids is grids:
            pos_sup_rest = HB.support_indices(grids[1:], caps[1:], xyz,
                                              presorted=orders[1:])
            pos_sup = (jnp.asarray(splat_idx),) + tuple(
                jnp.asarray(np.concatenate([s, pad8]))
                for s in pos_sup_rest)
        else:
            pos_sup = tuple(
                jnp.asarray(np.concatenate([s, pad8]))
                for s in HB.support_indices(dec_grids, dec_caps, xyz,
                                            presorted=orders))
        centers_parts = []
        for d in range(cfg.adaptive_depth):
            cpad = np.zeros((dec_caps[d], 3), np.float32)
            nn_ = min(len(dec_grids[d].keys), dec_caps[d])
            cpad[:nn_] = dec_grids[d].coords[:nn_] \
                * dec_grids[d].voxel_size
            centers_parts.append(cpad)
        centers_all = np.concatenate(centers_parts, 0)
        grad_sup = tuple(jnp.asarray(s) for s in
                         HB.support_indices(dec_grids, dec_caps,
                                            centers_all))
        tm.lap("support")

        field = _compiled_solve(cfg)(
            self.network.params, jnp.asarray(xyz_p), jnp.asarray(mask),
            input_normal, dec_svh, udf_svh, out.basis_features,
            out.normal_features, out.udf_features, pos_sup, grad_sup)
        if tm.on:
            from ..utils.profiling import drain
            drain(field.alpha)
        tm.lap("device solve")
        return HostField(
            field, cfg, dec_grids, dec_caps, cfg.adaptive_depth,
            udf_host=grids if cfg.udf_enabled else None, udf_caps=caps)

    def _reconstruct_sharded(self, cfg, xyz, xyz_p, mask, feat, normal,
                             mesh):
        """ONE scene's lattice sharded into x-slabs across ``mesh``:
        the network runs replicated on the global (slab-aligned) lattice,
        the kernel solve runs distributed with per-CG-iteration halo
        ppermutes (parallel/lattice_shard.py), and the result is the
        same HostField (+ lattice evaluator) the single-device path
        returns.  Falls back to the single-device path when the aligned
        lattice does not fit."""
        from ..core import host_build as HB
        from ..fields import LayerField
        from ..fields.kernel_field import KernelField
        from ..fields.lattice_eval import LatticeEvalContext
        from ..fields.support import InterpolatorFn
        from ..models import dense_unet as DU
        from ..models.network import Interpolators, NetworkOutput
        from ..parallel import lattice_shard as LS
        from ..utils.profiling import log_engine_demotion
        from .host_field import HostField
        from .host_predicted import _Timer

        tm = _Timer()
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        grids, orders = HB.build_splat_grids_ex(
            xyz, cfg.voxel_size, cfg.tree_depth)
        caps = tuple(max(_next_pow2(int(len(g.keys) * 1.05)), 512)
                     for g in grids)
        cfg = dataclasses.replace(cfg, capacities=caps)
        if cfg.structure_mode == "adaptive":
            # pruned decoder hierarchy (normal-variation builder) — the
            # sharded solve/mesh ride it exactly like the host path
            # (reference builder: /root/reference/models/nksr_net.py:175-179)
            assert normal is not None, \
                "adaptive structure needs input normals"
            dec_grids = HB.build_adaptive_grids(
                xyz, normal, cfg.voxel_size, cfg.tree_depth,
                tau=cfg.adaptive_tau, adaptive_depth=cfg.adaptive_depth,
                splat=(grids, orders))
            dec_caps = tuple(max(_next_pow2(int(len(g.keys) * 1.05)),
                                 512) for g in dec_grids)
        else:
            dec_grids, dec_caps = grids, caps
        out = LS.plan_sharded(grids, caps, xyz, orders[0][0], orders[0][1],
                              cfg.voxel_size, cfg.tree_depth,
                              cfg.adaptive_depth, n_dev, k=cfg.kernel_dim,
                              dec_grids=None if dec_grids is grids
                              else dec_grids,
                              dec_caps=None if dec_grids is grids
                              else dec_caps)
        if out is None:
            log_engine_demotion("sharded-svh-solve", "single-device",
                                "aligned lattice exceeds the dense budget")
            return self._reconstruct_host(cfg, xyz, xyz_p, mask, feat,
                                          normal=normal)
        plan, splan = out
        spec = plan.spec
        tm.lap("sharded plan")

        # network feats on the global lattice (replicated; the solve is
        # what shards).  Dense conv3d UNet only — beyond its budget we
        # fall back entirely rather than mix engines.
        if not use_dense_unet(spec, cfg):
            return self._reconstruct_host(cfg, xyz, xyz_p, mask, feat,
                                          normal=normal)
        self._last_unet_engine = "dense"
        n, cap_pts = xyz.shape[0], xyz_p.shape[0]
        dt = DU.build_tables(spec, plan.origins, grids, caps,
                             dec_grids, dec_caps)
        perm = orders[0][1]
        perm_p = np.concatenate(
            [perm, np.arange(n, cap_pts)]).astype(np.int32)
        base0_s = np.empty((cap_pts, 3), np.int32)
        base0_s[:n] = HB.unpack64(orders[0][0])
        base0_s[n:] = plan.origins[0] + np.asarray(spec.dims[0]) + 8
        xyz_s = np.zeros((cap_pts, 3), np.float32)
        xyz_s[:n] = xyz[perm]
        feat_s = jnp.take(feat, jnp.asarray(perm_p), axis=0) \
            if feat is not None else None
        basis_f, normal_f, _, udf_f = _compiled_dense_unet(
            cfg, spec, True)(
            self.network.params,
            jnp.asarray(plan.origins.astype(np.int32)), dt,
            jnp.asarray(xyz_s), feat_s, jnp.asarray(mask),
            jnp.asarray(base0_s))
        tm.lap("dispatch dense unet")

        input_normal = feat if cfg.feature == "normal" else None
        vox_cell = tuple(jnp.asarray(v) for v in plan.vox_cell)
        vox_active = tuple(jnp.asarray(v) for v in plan.vox_active)
        gr_t = _compiled_gr_targets(cfg, spec)(
            normal_f, jnp.asarray(xyz_p), jnp.asarray(mask), input_normal,
            jnp.asarray(plan.origins.astype(np.int32)), vox_cell,
            vox_active)
        tm.lap("gr targets")

        with mesh:
            parts, slab_xs = LS.sharded_lattice_solve(
                mesh, splan,
                self.network.params["params"]["interpolators"],
                basis_f, gr_t,
                voxel_size=cfg.voxel_size, pos_weight=cfg.pos_weight,
                normal_weight=cfg.normal_weight,
                reg_weight=cfg.reg_weight, tol=cfg.solver_tol,
                max_iters=cfg.solver_max_iters,
                approx_grad=cfg.approx_kernel_grad,
                return_slab_xs=True)
        alphas = LS.gather_alphas(plan, splan, parts)
        tm.lap("sharded solve + gather")

        dec_svh = HB.to_device_svh(dec_grids, dec_caps, cfg.voxel_size)
        interp = InterpolatorFn(
            params={"params":
                    self.network.params["params"]["interpolators"]},
            module=Interpolators(depth=cfg.tree_depth,
                                 kernel_dim=cfg.kernel_dim,
                                 n_hidden=cfg.interp_layers,
                                 hidden_dim=cfg.interp_hidden))
        field = KernelField(
            svh=dec_svh, features=basis_f, interp=interp,
            alpha=tuple(jnp.asarray(a) for a in alphas),
            kernel_dim=cfg.kernel_dim,
            approx_kernel_grad=cfg.approx_kernel_grad)
        field = field.set_mask_field(LayerField(dec_svh,
                                                cfg.adaptive_depth))
        ctx = LatticeEvalContext(
            spec, plan.origins,
            self.network.params["params"]["interpolators"],
            basis_f, field.alpha, vox_cell, vox_active,
            cfg.voxel_size, cfg.approx_kernel_grad,
            compute_dtype=cfg.solver_compute_dtype)
        hf = HostField(field, cfg, dec_grids, dec_caps,
                       cfg.adaptive_depth, lattice_ctx=ctx)
        # sharded mesh extraction rides the per-slab solve coefficients
        # (parallel/mesh_shard.py): the global FINE lattice is never
        # materialized on one device
        hf.sharded_mesh = dict(
            mesh=mesh, plan=plan, splan=splan,
            interp_params=self.network.params["params"]["interpolators"],
            basis=basis_f, xs_parts=slab_xs,
            voxel_size=cfg.voxel_size,
            compute_dtype=resolve_solver_dtype(cfg.solver_compute_dtype),
            approx_grad=cfg.approx_kernel_grad)
        return hf

    # -------------------------------------------------------------- helpers
    def _pick_voxel_size(self, xyz: np.ndarray,
                         detail_level: Optional[float],
                         voxel_size: Optional[float]) -> float:
        """detail_level/voxel_size semantics (NKSR-USAGE.md:128-137):
        voxel_size wins; detail_level in [0, 1] sweeps coarse -> fine around
        the sampling density; None means the network's native scale."""
        if voxel_size is not None:
            return float(voxel_size)
        if detail_level is None:
            return self.config.voxel_size
        sub = xyz[:: max(1, xyz.shape[0] // 5000)]
        from scipy.spatial import cKDTree  # host-side heuristic only
        d, _ = cKDTree(sub).query(sub, k=2)
        spacing = float(np.median(d[:, 1])) + 1e-9
        lo, hi = 1.5 * spacing, 6.0 * spacing
        return float(hi * (1 - detail_level) + lo * detail_level)

    def _runtime_config(self, n_pts: int, xyz: np.ndarray, vs: float,
                        approx_kernel_grad: bool, solver_tol: float,
                        solver_max_iters: Optional[int],
                        feature: str,
                        fused_mode: bool = False) -> P.PipelineConfig:
        # splat-corner capacity estimate from a subsample (the host path
        # replaces these with exact counts from its own build)
        caps = []
        step = max(1, xyz.shape[0] // 100000)
        sub = xyz[::step]
        offs = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                        -1).reshape(1, 8, 3)
        for d in range(self.config.tree_depth):
            base = np.floor(sub / (vs * 2.0 ** d)).astype(np.int64)
            corners = (base[:, None, :] + offs).reshape(-1, 3)
            key = ((corners[:, 0] + (1 << 20)) << 42) \
                + ((corners[:, 1] + (1 << 20)) << 21) \
                + (corners[:, 2] + (1 << 20))
            n_unique = len(np.unique(key))
            # sublinear growth of occupied cells with point count
            scale = min(step, max(1.0, step ** 0.7))
            caps.append(max(_next_pow2(int(n_unique * scale * 1.3)), 512))
        return dataclasses.replace(
            self.config, voxel_size=vs, capacities=tuple(caps),
            approx_kernel_grad=approx_kernel_grad, solver_tol=solver_tol,
            solver_max_iters=solver_max_iters or self.config.solver_max_iters,
            feature=feature, fused_mode=fused_mode,
            solver_compute_dtype=resolve_solver_dtype(
                self.config.solver_compute_dtype))


def get_estimate_normal_preprocess_fn(knn: int = 64,
                                      max_angle_deg: float = 85.0):
    """Reference-parity preprocess factory (NKSR-USAGE.md:109; algorithm
    from /root/reference/examples/recons_waymo_cpu.py:21-41)."""

    def fn(xyz, normal, sensor):
        assert normal is None, "normals already provided"
        assert sensor is not None, "sensor positions required"
        xyz_j = jnp.asarray(np.asarray(xyz, np.float32))
        sens_j = jnp.asarray(np.asarray(sensor, np.float32))
        n = xyz_j.shape[0]
        cell = K.estimate_cell_size(np.asarray(xyz), knn)
        cap = _next_pow2(n)
        nrm, keep = K.estimate_normals(
            xyz_j, jnp.ones(n, bool), knn, cell, cap,
            max_per_cell=max(2 * knn // 9, 8), sensor=sens_j,
            max_angle_deg=max_angle_deg)
        keep_np = np.asarray(keep)
        return (np.asarray(xyz_j)[keep_np], np.asarray(nrm)[keep_np], None)

    return fn
