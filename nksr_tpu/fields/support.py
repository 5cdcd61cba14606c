"""Sparse basis-support evaluation for kernel fields.

For a query point x and hierarchy depth d, the supporting DoF are the
``kernel_dim`` learned basis functions of each of the 8 active voxels whose
centers surround x.  Each basis is ``raw(x_loc, F_v) * window(x_loc)`` with
the C1 bump window ``prod_a (1 - t_a^2)^2`` on support ``|t|<1`` — the
compact support that keeps the reference's kernel Gram matrix sparse
(/root/reference/README.md:17), expressed here as pure gathers + small
matmuls so XLA can fuse the whole evaluation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.grid import SparseGrid, point_splat_coords
from ..core.svh import SparseFeatureHierarchy
from ..ops.gather_scatter import take_rows


@struct.dataclass
class InterpolatorFn:
    """Functional handle on the network's Interpolators submodule."""
    params: Any
    module: Any = struct.field(pytree_node=False)

    def raw(self, d, x_loc, feat):
        return self.module.apply(self.params, d, x_loc, feat,
                                 method=self.module.raw)


def window(x_loc: jnp.ndarray) -> jnp.ndarray:
    """C1 bump: prod_a (max(0, 1 - t_a^2))^2, (..., 3) -> (...)."""
    t = jnp.clip(1.0 - x_loc * x_loc, 0.0, None)
    return jnp.prod(t * t, axis=-1)


def window_and_grad(x_loc: jnp.ndarray):
    """Window and its gradient wrt x_loc: (...,), (..., 3)."""
    u = jnp.clip(1.0 - x_loc * x_loc, 0.0, None)  # (..., 3)
    u2 = u * u
    w = jnp.prod(u2, axis=-1)
    # d/dt (1-t^2)^2 = -4 t (1 - t^2)
    du = -4.0 * x_loc * u
    # grad_a = du_a * prod_{b != a} u2_b ; robust product-exclusion
    prods = []
    for a in range(3):
        others = [u2[..., b] for b in range(3) if b != a]
        prods.append(du[..., a] * others[0] * others[1])
    return w, jnp.stack(prods, axis=-1)


class DepthSupport(NamedTuple):
    idx: jnp.ndarray     # (Q, 8) voxel index at this depth, -1 if absent
    basis: jnp.ndarray   # (Q, 8, K)
    dbasis: Optional[jnp.ndarray]  # (Q, 8, K, 3) wrt world coords, or None


def depth_support(grid: SparseGrid, features: jnp.ndarray,
                  interp: InterpolatorFn, d: int, x: jnp.ndarray,
                  grad: bool = False,
                  approx_grad: bool = False,
                  idx: Optional[jnp.ndarray] = None) -> DepthSupport:
    """Support of (Q, 3) world points at one hierarchy depth."""
    corner, _ = point_splat_coords(grid, x)            # (Q, 8, 3) int
    if idx is None:
        idx = grid.lookup(corner.reshape(-1, 3)).reshape(corner.shape[:2])
    centers = grid.grid_to_world(corner)
    x_loc = (x[:, None, :] - centers) / grid.voxel_size  # (Q, 8, 3)
    feat = take_rows(features, idx)                     # (Q, 8, Cb)
    active = (idx >= 0)[..., None]

    if not grad:
        raw = interp.raw(d, x_loc, feat)
        b = raw * window(x_loc)[..., None]
        return DepthSupport(idx, jnp.where(active, b, 0.0), None)

    w, dw = window_and_grad(x_loc)                      # (Q,8), (Q,8,3)
    if approx_grad:
        raw = interp.raw(d, x_loc, feat)
        draw = jnp.zeros(raw.shape + (3,), raw.dtype)
    else:
        def f(z):
            return interp.raw(d, z, feat)
        raw = f(x_loc)
        tangents = []
        for a in range(3):
            e = jnp.zeros_like(x_loc).at[..., a].set(1.0)
            _, t = jax.jvp(f, (x_loc,), (e,))
            tangents.append(t)
        draw = jnp.stack(tangents, axis=-1)             # (Q,8,K,3)
    b = raw * w[..., None]
    db_loc = raw[..., None] * dw[..., None, :] + draw * w[..., None, None]
    db = db_loc / grid.voxel_size                       # chain rule to world
    return DepthSupport(idx, jnp.where(active, b, 0.0),
                        jnp.where(active[..., None], db, 0.0))


def svh_support(svh: SparseFeatureHierarchy, features: Tuple[jnp.ndarray, ...],
                interp: InterpolatorFn, x: jnp.ndarray, grad: bool = False,
                approx_grad: bool = False,
                sup_idx: Optional[Tuple[jnp.ndarray, ...]] = None
                ) -> Tuple[DepthSupport, ...]:
    from ..core import coords as C

    if sup_idx is None:
        # one segmented sort-join for all depths' corner lookups (each big
        # sort program costs minutes of TPU compile; see
        # coords.multi_search_sorted).  Callers on the host-orchestrated
        # path pass precomputed ``sup_idx`` instead (core/host_build.py),
        # making the device graph sort-free.
        sets, queries = [], []
        for d in range(svh.depth):
            g = svh.grids[d]
            corner, _ = point_splat_coords(g, x)
            sets.append((g.key_hi, g.key_lo, g.num_voxels))
            queries.append(C.pack(corner.reshape(-1, 3)))
        idxs = C.multi_search_sorted(sets, queries)
        sup_idx = tuple(idxs[d].reshape(x.shape[0], 8)
                        for d in range(svh.depth))
    return tuple(
        depth_support(svh.grids[d], features[d], interp, d, x, grad,
                      approx_grad, idx=sup_idx[d])
        for d in range(svh.depth))


def predict(sup: Tuple[DepthSupport, ...],
            alpha: Tuple[jnp.ndarray, ...], grad: bool = False):
    """f(x) (and optionally grad f) from per-depth supports + coefficients."""
    val = 0.0
    g = 0.0
    for s, a in zip(sup, alpha):
        av = take_rows(a, s.idx)                        # (Q, 8, K)
        val = val + jnp.einsum("qsk,qsk->q", s.basis, av)
        if grad:
            g = g + jnp.einsum("qskc,qsk->qc", s.dbasis, av)
    return (val, g) if grad else val


def scatter_rows(sup: Tuple[DepthSupport, ...], shapes, weights_times_resid,
                 grad: bool = False):
    """A^T w r : accumulate per-row residuals back onto coefficients.

    ``weights_times_resid``: (Q,) for value rows or (Q, 3) for grad rows.
    ``shapes``: per-depth coefficient shapes (C_d, K).
    """
    out = []
    for s, shp in zip(sup, shapes):
        if grad:
            contrib = jnp.einsum("qskc,qc->qsk", s.dbasis,
                                 weights_times_resid)
        else:
            contrib = s.basis * weights_times_resid[:, None, None]
        seg = jnp.where(s.idx >= 0, s.idx, shp[0]).reshape(-1)
        acc = jnp.zeros((shp[0] + 1, shp[1])).at[seg].add(
            contrib.reshape(-1, shp[1]))
        out.append(acc[:-1])
    return tuple(out)


def diag_contrib(sup: Tuple[DepthSupport, ...], shapes, w: jnp.ndarray,
                 grad: bool = False):
    """Jacobi diagonal: sum_rows w * basis^2 per coefficient."""
    out = []
    for s, shp in zip(sup, shapes):
        if grad:
            sq = jnp.sum(s.dbasis * s.dbasis, axis=-1)
        else:
            sq = s.basis * s.basis
        sq = sq * w[:, None, None]
        seg = jnp.where(s.idx >= 0, s.idx, shp[0]).reshape(-1)
        acc = jnp.zeros((shp[0] + 1, shp[1])).at[seg].add(
            sq.reshape(-1, shp[1]))
        out.append(acc[:-1])
    return tuple(out)
