"""Host-orchestrated field: sort-free device evaluation + host meshing.

The Reconstructor's fast inference path (see core/host_build.py for why):
the host builds every integer structure; the device runs compact,
sort-free jit programs for the math (basis MLPs + dots).  This wrapper
carries the host grids next to the solved device field so meshing and
queries can prepare index tables on the host.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import host_build as HB
from ..meshing.dual_mc import TriangleMesh


@functools.lru_cache(maxsize=64)
def _eval_fn(cfg, grad: bool):
    """Jitted sort-free field evaluation at fixed batch shape."""
    def fn(field, x, sup_idx):
        return field.evaluate_f(x, grad=grad, sup_idx=sup_idx)
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _udf_mask_fn(cfg):
    """Jitted sort-free UDF-mask evaluation (NeuralField mask head)."""
    def fn(mask_field, x, sup_idx):
        v = mask_field.evaluate_f(x, sup_idx=sup_idx).value
        return mask_field.level_set - v
    return jax.jit(fn)


class SolverStats:
    """Lazy CG convergence diagnostics (iters run, final relative
    residual).  Device values are only materialized on first access so
    attaching stats never forces a host sync mid-pipeline (the host
    plans meshing while the device still runs the solve).  Mirrors the
    reference's ``field.solver_config['verbose']`` observability
    (/root/reference/models/nksr_net.py:97-98) as queryable data."""

    def __init__(self, iters, rel_res, tol: float, max_iters: int):
        self._iters = iters
        self._rel_res = rel_res
        self.tol = float(tol)
        self.max_iters = int(max_iters)

    @property
    def iters(self) -> int:
        if not isinstance(self._iters, int):
            self._iters = int(np.asarray(self._iters))
        return self._iters

    @property
    def rel_res(self) -> float:
        if not isinstance(self._rel_res, float):
            self._rel_res = float(np.asarray(self._rel_res))
        return self._rel_res

    @property
    def converged(self) -> bool:
        return self.rel_res <= self.tol

    def __repr__(self):
        return (f"SolverStats(iters={self.iters}, "
                f"rel_res={self.rel_res:.3e}, tol={self.tol:.1e}, "
                f"converged={self.converged})")


class HostField:
    """Solved kernel field + host-side structure for fast queries."""

    def __init__(self, field, cfg, host_grids: List[HB.HostGrid],
                 capacities: Sequence[int], adaptive_depth: int,
                 udf_host: Optional[List[HB.HostGrid]] = None,
                 udf_caps: Optional[Sequence[int]] = None,
                 lattice_ctx=None, solver_stats=None):
        self.field = field
        self.cfg = cfg
        self.host_grids = host_grids
        self.capacities = tuple(capacities)
        self.adaptive_depth = adaptive_depth
        # UDF mask head grids (the UNet's candidate hierarchy) when the
        # model has one (cfg.udf_enabled; reference nksr_net.py:116-130)
        self.udf_host = udf_host
        self.udf_caps = None if udf_caps is None else tuple(udf_caps)
        # lattice-native fast evaluator (fields/lattice_eval.py) when the
        # field was solved on the dense lattice — replaces the generic
        # host-support-table path for queries and meshing
        self.lattice_ctx = lattice_ctx
        # CG convergence diagnostics (SolverStats; lattice engine only)
        self.solver_stats = solver_stats
        # sharded-extraction context (set by the sharded reconstruct
        # path): mesh/plan/per-slab solve coefficients for
        # parallel/mesh_shard.extract_dual_mesh_sharded
        self.sharded_mesh = None

    def __getattr__(self, name):
        return getattr(self.field, name)

    # ------------------------------------------------------------- queries
    def _support(self, x: np.ndarray):
        return HB.support_indices(self.host_grids, self.capacities, x)

    def _eval_batched(self, x: np.ndarray, grad: bool = False,
                      batch: int = 1 << 18):
        if self.lattice_ctx is not None:
            out = self.lattice_ctx.eval_batched(np.asarray(x, np.float32),
                                                grad=grad)
            return (out[0], out[2]) if grad else out[0]
        n = x.shape[0]
        vals = np.empty(n, np.float32)
        grads = np.empty((n, 3), np.float32) if grad else None
        fn = _eval_fn(self.cfg, grad)
        for i in range(0, n, batch):
            xb = x[i:i + batch]
            pad = batch - xb.shape[0] if xb.shape[0] < batch else 0
            xp = np.pad(xb, ((0, pad), (0, 0)))
            sup = self._support(xp)
            out = fn(self.field, jnp.asarray(xp), sup)
            vals[i:i + batch] = np.asarray(out.value)[:xb.shape[0]]
            if grad:
                grads[i:i + batch] = np.asarray(
                    out.gradient)[:xb.shape[0]]
        return (vals, grads) if grad else vals

    def _mask_host(self, x: np.ndarray) -> np.ndarray:
        """Trust mask at host query points: UDF mask when the field has a
        NeuralField mask head, else union-of-support (LayerField)."""
        mf = getattr(self.field, "mask_field", None)
        if self.udf_host is not None and mf is not None and \
                hasattr(mf, "level_set"):
            sup = HB.support_indices(self.udf_host, self.udf_caps, x)
            m = _udf_mask_fn(self.cfg)(
                mf, jnp.asarray(x), tuple(jnp.asarray(s) for s in sup))
            return np.asarray(m) > 0
        if self.lattice_ctx is not None:
            _, m = self.lattice_ctx.eval_batched(np.asarray(x, np.float32))
            return m
        sup = HB.support_indices(self.host_grids, self.capacities, x)
        inside = np.zeros(x.shape[0], bool)
        for s in sup:
            inside |= (np.asarray(s) >= 0).any(1)
        return inside

    def eval_fbar_batched(self, x: np.ndarray) -> np.ndarray:
        """Fused value+mask pass (one device round-trip on the lattice
        path) — the mesher's inner loop."""
        x = np.asarray(x, np.float32)
        has_udf_mask = (self.udf_host is not None
                        and getattr(self.field, "mask_field", None)
                        is not None
                        and hasattr(self.field.mask_field, "level_set"))
        neg = -self.host_grids[0].voxel_size
        if self.lattice_ctx is not None and not has_udf_mask:
            v, m = self.lattice_ctx.eval_batched(x)
            return np.where(m, v, neg).astype(np.float32)
        f = self._eval_batched(x)
        m = self._mask_host(x)
        return np.where(m, f, neg).astype(np.float32)

    def evaluate_f(self, x, grad: bool = False):
        from ..fields.kernel_field import FieldEval
        x = np.asarray(x, np.float32)
        if grad:
            v, g = self._eval_batched(x, grad=True)
            return FieldEval(value=v, gradient=g)
        return FieldEval(value=self._eval_batched(x))

    def evaluate_f_bar(self, x) -> np.ndarray:
        x = np.asarray(x, np.float32)
        f = self._eval_batched(x)
        m = self._mask_host(x)
        return np.where(m, f, -float(np.asarray(
            self.field.svh.voxel_size)))

    # ------------------------------------------------------------- meshing
    def extract_dual_mesh(self, mise_iter: int = 0, grid_upsample: int = 1,
                          max_points: Optional[int] = None) -> TriangleMesh:
        """``max_points`` bounds each device field-evaluation wave (the
        memory knob of the reference signature,
        /root/reference/examples/recons_colored_mesh.py:30)."""
        import os
        if self.sharded_mesh is not None \
                and os.environ.get("NKSR_SHARDED_MC", "1") == "1":
            # per-slab extraction over the solve's device mesh: the
            # global fine lattice never lands on one device
            from ..parallel.mesh_shard import extract_dual_mesh_sharded
            sm = self.sharded_mesh
            with sm["mesh"]:
                m = extract_dual_mesh_sharded(
                    sm["mesh"], sm["plan"], sm["splan"],
                    sm["interp_params"], sm["basis"], sm["xs_parts"],
                    sm["voxel_size"], sm["compute_dtype"],
                    sm["approx_grad"], mise_iter=mise_iter,
                    grid_upsample=grid_upsample)
            if m is not None:
                return m
            from ..utils.profiling import log_engine_demotion
            log_engine_demotion(
                "sharded-dual-mc", "dense-dual-mc",
                "slab too narrow for the 2-plane halo or per-slab fine "
                "grid over budget")
        if os.environ.get("NKSR_DENSE_MC", "1") == "1":
            # dense-lattice dual MC: topology on device as shifts +
            # compactions (meshing/lattice_mc.py); None -> inapplicable
            from ..meshing.lattice_mc import extract_dual_mesh_dense
            m = extract_dual_mesh_dense(self, mise_iter=mise_iter,
                                        grid_upsample=grid_upsample,
                                        max_points=max_points)
            if m is not None:
                return m
            from ..utils.profiling import log_engine_demotion
            log_engine_demotion(
                "dense-dual-mc", "host-mesher",
                "no lattice context or fine grid over the dense cell "
                "budget")
        from ..meshing.host_mc import host_extract_dual_mesh
        return host_extract_dual_mesh(self, mise_iter=mise_iter,
                                      grid_upsample=grid_upsample,
                                      max_points=max_points)

    def set_texture_field(self, tex) -> "HostField":
        self.field = self.field.set_texture_field(tex)
        return self

    def set_mask_field(self, mf) -> "HostField":
        self.field = self.field.set_mask_field(mf)
        return self
