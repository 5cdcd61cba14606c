"""Predicted-structure UNet decode on the dense lattice: topology
prediction as MASK computation, fully in-graph.

The reference's default inference route lets the UNet prune/refine the
decoder hierarchy mid-forward (/root/reference/models/nksr_net.py:74-78).
The host-orchestrated variant (recon/host_predicted.py) cuts the forward
at every topology change — one device jit per level with host grid
pruning in between — which costs a host/device round-trip per level and
leaves the per-level convolutions as gather-convs.

On a dense lattice none of that is necessary, because on TPU *changing
topology is just changing a boolean mask*:

  * candidate cells at the coarsest level = encoder occupancy;
  * ``status = argmax(struct_logits)`` per candidate cell — a dense VPU op;
  * pruning = ``status > 0`` masking (zeroed features, masked GroupNorm);
  * refinement = a 2x nearest upsample of the ``status == REFINED`` mask
    (every child of a refined voxel becomes a candidate — the dense
    equivalent of host_build.children_of);
  * the transposed conv up + encoder skip are the same dense ops the
    teacher-forced dense UNet (models/dense_unet.py) already uses.

So the ENTIRE structure-predicting forward is ONE jit of dense conv3d /
reshape-einsum math with data-dependent masks but static shapes.  The
host reads back one int8 status lattice per level (a few MB) to build
the voxel lists the solve planner needs; the per-level feature lattices
stay in HBM for the head gathers.

Exactness requirement: each finer lattice must contain EVERY child of
every coarser cell (children of refined boundary voxels must not fall
off the lattice).  ``plan_unet_lattice`` therefore builds child-cover
dims — ``dims[d] = 2 * dims[d+1]`` exactly, zero-phase origins — so the
dense candidate sets equal the host path's grids cell-for-cell
(tests/test_predicted_dense.py pins grid and field parity).

Reference contract served: ``network.unet(feat, enc_svh, ...)`` without
teacher forcing (/root/reference/models/nksr_net.py:74-78).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.svh import VOXEL_REFINED
from ..fields import lattice as LAT
from . import dense_unet as DU


# total (dense cells x f_maps) the in-graph decode may allocate; each
# level keeps an f_maps-wide f32 feature lattice alive for the head
# gathers (~3 such tensors live at the budget, ~5 GB) — callers fall
# back to the host route beyond it
DENSE_PRED_CELLMAP_BUDGET = 400_000_000


def plan_unet_lattice(grids, depth: int, f_maps: int = 32,
                      budget: int = DENSE_PRED_CELLMAP_BUDGET):
    """Child-cover dense lattice over the encoder hierarchy.

    Zero-phase origins (``o_d = o0 >> d`` with o0 aligned to
    2^(depth-1), as fields/lattice.plan_lattice) and exact-doubling dims
    (``dims[d] = dims[d+1] * 2``), so (a) parent/child index maps are
    the plain ``l >> 1`` / ``2l + o`` the dense UNet primitives assume
    and (b) every child of every cell of lattice d lies inside lattice
    d-1.  Returns (dims tuple-of-tuples, origins (depth, 3) int64) or
    None when the cell budget would be exceeded / a level is empty.
    """
    lo_t, hi_t = [], []
    for d in range(depth):
        c = grids[d].coords
        if len(c) == 0:
            return None
        lo_t.append(c.min(0).astype(np.int64) - 1)
        hi_t.append(c.max(0).astype(np.int64) + 1)
    algn = 1 << (depth - 1)
    o0 = np.minimum.reduce(
        [(lo_t[d] << d) + (1 << d) - 1 for d in range(depth)])
    o0 = o0 & ~np.int64(algn - 1)
    origins = np.stack([o0 >> d for d in range(depth)])
    # top-level extent covering every level's bbox when halved up
    need = np.maximum.reduce([
        -((origins[d] - hi_t[d] - 1) // (1 << (depth - 1 - d)))
        for d in range(depth)])                     # ceil div
    need = (need + 7) // 8 * 8
    dims, total = [], 0
    for d in range(depth):
        e = need << (depth - 1 - d)
        dims.append((int(e[0]), int(e[1]), int(e[2])))
        total += int(e[0] * e[1] * e[2])
    if total * f_maps > budget:
        return None
    return tuple(dims), origins


def enc_cell_tables(grids, caps, dims, origins):
    """Per-depth cap-padded (cell ids, active) of the encoder voxel lists
    in the dense lattice (host numpy -> device)."""
    from ..native import flat_cells
    cells, actives = [], []
    for d in range(len(dims)):
        cap = caps[d]
        n = min(len(grids[d].keys), cap)
        c = np.zeros((cap, 3), np.int64)
        c[:n] = grids[d].coords[:n]
        cells.append(jnp.asarray(flat_cells(c, 0, origins[d], dims[d])))
        a = np.zeros(cap, bool)
        a[:n] = True
        actives.append(jnp.asarray(a))
    return tuple(cells), tuple(actives)


@functools.lru_cache(maxsize=8)
def _forward_fn(cfg, dims: Tuple[Tuple[int, int, int], ...]):
    """One jit: encoder splat + encoder path + structure-predicting
    decoder.  Returns (per-depth decoder feature lattices, per-depth
    int8 status lattices: 0 = not a candidate, else status + 1)."""
    depth = cfg.tree_depth
    cdt = jnp.dtype(cfg.conv_dtype)

    def fn(params, origins, enc_cell, enc_active, xyz, base0, feat, mask):
        up = params["params"]["unet"]
        occ = []
        for d in range(depth):
            nc = dims[d][0] * dims[d][1] * dims[d][2]
            m = jnp.zeros((nc,), bool).at[enc_cell[d]].max(
                enc_active[d], mode="drop")
            occ.append(m)

        f = DU.encode_points(cfg, params, dims, origins, xyz, feat, mask,
                             base0=base0, splat_sorted=True)
        f = jnp.where(occ[0][:, None], f, 0.0)
        enc_feats = []
        for d in range(depth):
            f = DU._conv_block(up[f"enc_{d}"], f, occ[d], dims[d], cdt)
            enc_feats.append(f)
            if d < depth - 1:
                f = DU._down(f, up[f"down_{d}"], up[f"down_b_{d}"],
                             dims[d], dims[d + 1], cdt)
                f = jnp.where(occ[d + 1][:, None], f, 0.0)

        g = enc_feats[depth - 1]
        cand = occ[depth - 1]
        gs = [None] * depth
        st_out = [None] * depth
        for d in range(depth - 1, -1, -1):
            g = DU._conv_block(up[f"dec_{d}"], g, cand, dims[d], cdt)
            logits = DU._dense_head(up[f"struct_{d}"], g)
            status = jnp.argmax(logits, -1).astype(jnp.int32)
            st_out[d] = jnp.where(cand, status + 1, 0).astype(jnp.int8)
            gs[d] = g
            if d > 0:
                refined = cand & (status == VOXEL_REFINED)
                # all 8 children of refined voxels become candidates —
                # child-cover dims guarantee none fall off the lattice
                cand = LAT._up2(refined[:, None].astype(jnp.float32),
                                dims[d], dims[d - 1])[:, 0] > 0
                h = DU._up(g, up[f"up_{d}"], dims[d], dims[d - 1], cdt)
                g = jnp.where(cand[:, None], h + enc_feats[d - 1], 0.0)
        return tuple(gs), tuple(st_out)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _heads_fn(cfg, with_udf: bool):
    """Basis/normal (at decoder voxels) and optional UDF (at candidate
    voxels) heads: one row gather per depth from the retained dense
    feature lattices, then small matmuls.  Row layouts match the sparse
    NKSRNetwork outputs (cap-padded voxel-list order)."""

    def fn(params, gs, dec_cell, dec_active, cand_cell, cand_active):
        up = params["params"]["unet"]
        basis, normals, udf = [], [], []
        for d in range(cfg.tree_depth):
            rows = jnp.take(gs[d], dec_cell[d], axis=0)
            rows = jnp.where(dec_active[d][:, None], rows, 0.0)
            basis.append(DU._dense_head(up[f"basis_{d}"], rows))
            nf = DU._dense_head(up[f"normal_{d}"], rows)
            normals.append(jnp.where(dec_active[d][:, None], nf, 0.0))
            if with_udf:
                crows = jnp.take(gs[d], cand_cell[d], axis=0)
                crows = jnp.where(cand_active[d][:, None], crows, 0.0)
                udf.append(DU._dense_head(up[f"udf_{d}"], crows))
        return tuple(basis), tuple(normals), tuple(udf)

    return jax.jit(fn)
