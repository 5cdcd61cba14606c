"""Sparse basis-support evaluation for kernel fields.

For a query point x and hierarchy depth d, the supporting DoF are the
``kernel_dim`` learned basis functions of each of the 8 active voxels whose
centers surround x.  Each basis is ``raw(x_loc, F_v) * window(x_loc)`` with
the C1 bump window ``prod_a (1 - t_a^2)^2`` on support ``|t|<1`` — the
compact support that keeps the reference's kernel Gram matrix sparse
(/root/reference/README.md:17), expressed here as pure gathers + small
matmuls so XLA can fuse the whole evaluation.

TPU layout rules (learned from HBM dumps): a trailing dim < 128 pads to a
full 128-lane tile, so ``(Q, 8, K=4)`` tensors blow up 32x.  All support
tensors are therefore stored 2-D with a fused trailing axis —
``idx_k (Q, 8K)`` flat-DoF indices, ``basis (Q, 8K)``,
``dbasis (Q, 8K*3)`` — and coefficient arrays are FLAT ``(C*K,)`` vectors
(1-D arrays tile without padding).  The interpolator MLP runs in
fixed-size row chunks to bound its (rows, hidden) temps.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.grid import SparseGrid, point_splat_coords
from ..core.svh import SparseFeatureHierarchy
from ..ops.gather_scatter import take_rows

_MLP_CHUNK = 1 << 15   # rows per interpolator-MLP chunk (bounds temps)


def _use_pallas_window() -> bool:
    """Opt-in Pallas window kernel (ops/pallas/window_basis.py).  Default
    off: XLA fuses the plain elementwise form into its neighbors, and a
    pallas_call is a fusion barrier — enable to A/B on real hardware."""
    import os
    return os.environ.get("NKSR_PALLAS_WINDOW", "0") == "1"


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
    du = -4.0 * x_loc * u                          # d/dt (1-t^2)^2
    prods = []
    for a in range(3):
        others = [u2[..., b] for b in range(3) if b != a]
        prods.append(du[..., a] * others[0] * others[1])
    return w, jnp.stack(prods, axis=-1)


class DepthSupport(NamedTuple):
    idx_k: jnp.ndarray   # (Q, 8K) int32 flat-DoF indices, -1 if absent
    basis: jnp.ndarray   # (Q, 8K) f32
    dbasis: Optional[jnp.ndarray]  # (Q, 3*8K) f32 [dx|dy|dz] blocks
    kernel_dim: int


def _chunked_pairs(fn, x, idx, chunk: int = _MLP_CHUNK):
    """Apply fn over row-chunks of (x, idx) (bounds padded MLP temps)."""
    q = x.shape[0]
    if q <= chunk:
        return fn((x, idx))
    pad = (-q) % chunk
    xp = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], 0)
    ip = jnp.concatenate([idx, jnp.full((pad, 8), -1, idx.dtype)], 0)
    out = jax.lax.map(fn, (xp.reshape(-1, chunk, 3),
                           ip.reshape(-1, chunk, 8)))
    return out.reshape(-1, out.shape[-1])[:q]


def depth_support(grid: SparseGrid, features: jnp.ndarray,
                  interp: InterpolatorFn, d: int, x: jnp.ndarray,
                  grad: bool = False,
                  approx_grad: bool = False,
                  idx: Optional[jnp.ndarray] = None) -> DepthSupport:
    """Support of (Q, 3) world points at one hierarchy depth.

    The chunked kernel emits FINAL flattened layouts — (R, 8K) basis and
    (R, 3*8K) component-major gradients — so no (.., K)- or (.., 3)-
    trailing tensor is ever materialized at full Q (each would pad to a
    128-lane tile and blow HBM 32x).
    """
    q = x.shape[0]
    if idx is None:
        corner, _ = point_splat_coords(grid, x)        # (Q, 8, 3) int
        idx = grid.lookup(corner.reshape(-1, 3)).reshape(q, 8)
    k = interp.module.kernel_dim
    inv_vs = 1.0 / grid.voxel_size

    def kernel_fn(args):
        xb, idxb = args                                 # (R, 3), (R, 8)
        r = xb.shape[0]
        corner_b, _ = point_splat_coords(grid, xb)
        centers = grid.grid_to_world(corner_b)
        z0 = (xb[:, None, :] - centers) / grid.voxel_size
        fv = take_rows(features, idxb)                  # (R, 8, Cb)
        act = jnp.repeat(idxb >= 0, k, axis=-1)         # (R, 8K)

        def f(z):
            return interp.raw(d, z, fv)

        if not grad:
            raw = f(z0)
            b = (raw * window(z0)[..., None]).reshape(r, 8 * k)
            return jnp.where(act, b, 0.0)
        if _use_pallas_window():
            from ..ops.pallas import window_and_grad_fused
            w, dw = window_and_grad_fused(z0)           # (R,8), (R,8,3)
        else:
            w, dw = window_and_grad(z0)
        raw = f(z0)
        if approx_grad:
            draws = [jnp.zeros_like(raw)] * 3
        else:
            draws = []
            for a in range(3):
                e = jnp.zeros_like(z0).at[..., a].set(1.0)
                _, t = jax.jvp(f, (z0,), (e,))
                draws.append(t)
        b = (raw * w[..., None]).reshape(r, 8 * k)
        comps = [jnp.where(act, b, 0.0)]
        for a in range(3):
            db_a = ((raw * dw[..., a:a + 1] + draws[a] * w[..., None])
                    * inv_vs).reshape(r, 8 * k)
            comps.append(jnp.where(act, db_a, 0.0))
        return jnp.concatenate(comps, axis=-1)          # (R, 4*8K)

    out = _chunked_pairs(kernel_fn, x, idx)
    idx_k = _expand_idx(idx, k)
    if not grad:
        return DepthSupport(idx_k, out, None, k)
    sk = 8 * k
    return DepthSupport(idx_k, out[:, :sk], out[:, sk:], k)


def _expand_idx(idx: jnp.ndarray, k: int) -> jnp.ndarray:
    """(Q, 8) voxel idx -> (Q, 8K) flat-DoF idx (voxel*K + k), -1 kept."""
    q = idx.shape[0]
    base = idx[:, :, None] * k + jnp.arange(k, dtype=jnp.int32)[None, None]
    base = jnp.where(idx[:, :, None] >= 0, base, -1)
    return base.reshape(q, 8 * k)


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
    """f(x) (and optionally grad f) from per-depth supports + FLAT
    coefficient vectors (C_d * K,)."""
    val = 0.0
    g = 0.0
    for s, a in zip(sup, alpha):
        q, sk = s.basis.shape
        av = jnp.take(a, jnp.clip(s.idx_k, 0), axis=0)
        av = jnp.where(s.idx_k >= 0, av, 0.0)           # (Q, 8K)
        val = val + jnp.sum(s.basis * av, axis=-1)
        if grad:
            d3 = s.dbasis.reshape(q, 3, sk)             # component-major
            g = g + jnp.einsum("qcs,qs->qc", d3, av)
    return (val, g) if grad else val


def scatter_rows(sup: Tuple[DepthSupport, ...], shapes, weights_times_resid,
                 grad: bool = False):
    """A^T w r : accumulate per-row residuals onto flat coefficients.

    ``weights_times_resid``: (Q,) for value rows or (Q, 3) for grad rows.
    ``shapes``: per-depth coefficient shapes (C_d, K) (flat size C_d*K).
    """
    out = []
    for s, shp in zip(sup, shapes):
        n_flat = shp[0] * shp[1]
        q, sk = s.basis.shape
        if grad:
            d3 = s.dbasis.reshape(q, 3, sk)
            contrib = jnp.einsum("qcs,qc->qs", d3, weights_times_resid)
        else:
            contrib = s.basis * weights_times_resid[:, None]
        seg = jnp.where(s.idx_k >= 0, s.idx_k, n_flat).reshape(-1)
        acc = jnp.zeros((n_flat + 1,)).at[seg].add(contrib.reshape(-1))
        out.append(acc[:-1])
    return tuple(out)


def diag_contrib(sup: Tuple[DepthSupport, ...], shapes, w: jnp.ndarray,
                 grad: bool = False):
    """Jacobi diagonal: sum_rows w * basis^2 per flat coefficient."""
    out = []
    for s, shp in zip(sup, shapes):
        n_flat = shp[0] * shp[1]
        q, sk = s.basis.shape
        if grad:
            d3 = s.dbasis.reshape(q, 3, sk)
            sq = jnp.sum(d3 * d3, axis=1)
        else:
            sq = s.basis * s.basis
        sq = sq * w[:, None]
        seg = jnp.where(s.idx_k >= 0, s.idx_k, n_flat).reshape(-1)
        acc = jnp.zeros((n_flat + 1,)).at[seg].add(sq.reshape(-1))
        out.append(acc[:-1])
    return tuple(out)
