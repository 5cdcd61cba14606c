"""Sharded dual-MC mesh extraction over the x-slab lattice partition.

Companion to ``lattice_shard.sharded_lattice_solve``: after the sharded
solve, each device holds its slab's packed coefficient lattices; this
module extracts the mesh WITHOUT ever materializing the global fine
lattice (8x the solve lattice at ``mise_iter=1``) on one device — the
reference's scale story is solve+extract end-to-end, with extraction as
the memory peak (/root/reference/NKSR-USAGE.md:141-170).

Layout (all inside one ``shard_map`` over the mesh axis):

  * each slab rebuilds its local evaluation tables (AV0 cascade, corner
    feature tables, trust mask, extraction shell) on a slab+2-halo-plane
    lattice; the two halo planes are ``ppermute``d from the right
    neighbor ONCE.  Only RIGHT halos exist: a left halo would shift the
    local origin and break the zero-phase parent map (l >> 1) the
    cascade programs rely on;
  * vertex ownership is therefore shifted TWO fine planes right of the
    slab start: slab s owns crossing cells at local fine x in
    [2, Wf+2) (world planes [s*Wf+2, (s+1)*Wf+2) relative to the
    lattice origin) — cells at local x >= 1 are exactly the ones whose
    corner values, candidate dilation, and trust mask are locally exact
    without any left data, and a quad's BASE cell is the MAX of its 4
    cells (cells sit at base minus the offsets), so owned quads also
    need the crossing bits and vertex ranks of local x == 1 — the
    DUPLICATE plane, which equals the left neighbor's last owned plane.
    The world's first two fine planes are owned by nobody, which is
    safe because the global lattice margin is structurally inactive
    there;
  * candidates/corner-eval/topology/newton reuse the single-device
    mesher programs (meshing/lattice_mc.py) on the local spec; QUADS
    are owned iff their base cell is owned (``quad_x_min``);
  * the host concatenates per-slab vertex lists and resolves cross-seam
    quad references by a sorted merge-join of the duplicate plane's
    world-cell keys into the right neighbor's owned keys (vertex
    positions agree bitwise: both slabs compute them from the same
    exchanged values).

Parity vs the single-device mesher is pinned by
tests/test_parallel.py::TestShardedMesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS
from jax import shard_map

from ..core import host_build as HB
from ..fields import lattice as LAT
from ..fields.lattice_eval import LatticeEvalTables
from ..meshing.dual_mc import TriangleMesh
from ..meshing import lattice_mc as LM


def _mesh_spec(spec: LAT.LatticeSpec, slab_x) -> LAT.LatticeSpec:
    """Local spec with TWO halo x-planes per depth."""
    import dataclasses
    return dataclasses.replace(
        spec, dims=tuple((slab_x[d] + 2,) + spec.dims[d][1:]
                         for d in range(spec.depth)))


def _halo2(bufs, dims, widths, slab_planes, axis: str):
    """Extend each flat per-depth buffer by copying the right neighbor's
    first TWO x-planes behind the slab (open chain: last device reads
    zeros — the global lattice margin guarantees those planes are
    structurally inactive there)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, i - 1) for i in range(1, n)]
    out = []
    for (b, (X2, Y, Z), v, slab) in zip(bufs, dims, widths, slab_planes):
        rows = b.reshape(-1, Y * Z * v)[:slab]
        halo = jax.lax.ppermute(rows[:2], axis, perm)
        out.append(jnp.concatenate([rows, halo], 0).reshape(-1))
    return out


def extract_dual_mesh_sharded(mesh: Mesh, plan, splan, interp_params,
                              basis_features, xs_parts,
                              voxel_size: float, compute_dtype: str,
                              approx_grad: bool,
                              mise_iter: int = 0, grid_upsample: int = 1
                              ) -> Optional[TriangleMesh]:
    """Extract the dual mesh from per-slab solve coefficients.

    ``xs_parts``: per-depth (n, slab_x[d]*Y*Z*k) packed coefficients
    from ``sharded_lattice_solve(..., return_slab_xs=True)``.

    Returns None when inapplicable (a depth's slab is under 2 planes —
    the 2-plane halo would wrap — or f == 1, whose duplicate-plane
    corner reads reach the inexact second halo plane) so callers fall
    back to gathering.
    """
    spec = plan.spec
    depth, k = spec.depth, spec.k
    slab_x = splan.slab_x
    n = splan.n_shards
    AXIS = mesh.axis_names[0]
    f = max(int(grid_upsample), 1) * (2 ** max(int(mise_iter), 0))
    if any(slab_x[d] < 2 for d in range(depth)) or f < 2:
        return None
    spec_m = _mesh_spec(spec, slab_x)
    Xm, Ym, Zm = spec_m.dims[0]
    if Xm * Ym * Zm * f ** 3 > LM.DENSE_CELL_BUDGET:
        return None
    cdt = compute_dtype
    cbs = [basis_features[d].shape[-1] for d in range(depth)]
    origins = jnp.asarray(plan.origins.astype(np.int32))
    slabs = jnp.asarray(np.asarray(slab_x, np.int32))
    Wf = slab_x[0] * f            # owned fine extent per slab

    # ---- phase A: per-slab tables + candidate-corner count ------------
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PS(), PS(),
                  tuple(PS(AXIS) for _ in range(depth)),
                  tuple(PS(AXIS) for _ in range(depth)),
                  tuple(PS(AXIS) for _ in range(depth)),
                  tuple(PS(AXIS) for _ in range(depth))),
        out_specs=(PS(AXIS), tuple(PS(AXIS) for _ in range(depth)),
                   PS(AXIS), PS(AXIS), PS(AXIS)),
        check_vma=False)
    def prep(basis_global, origins_g, xs, vox_cell, vox_active, vox_src):
        sq = lambda a: a[0]
        xs_l = [sq(x) for x in xs]
        vc = tuple(sq(v) for v in vox_cell)
        va = tuple(sq(v) for v in vox_active)
        vs_ = tuple(sq(v) for v in vox_src)

        # local dense features/activity on the slab (halo planes zero),
        # then one 2-plane exchange.  vox_cell_loc flat ids are valid in
        # the slab+2 lattice unchanged: the x-plane stride Y*Z does not
        # depend on X.
        feats, acts = [], []
        for d in range(depth):
            nc2 = spec_m.n_cells(d)
            f_rows = jnp.take(basis_global[d], vs_[d], axis=0)
            f_rows = jnp.where(va[d][:, None], f_rows, 0.0)
            fd = jnp.zeros((nc2, cbs[d])).at[vc[d]].add(f_rows,
                                                        mode="drop")
            ad = jnp.zeros((nc2,)).at[vc[d]].add(
                va[d].astype(jnp.float32), mode="drop")
            feats.append(fd.reshape(-1))
            acts.append(ad)
        dims_m = [spec_m.dims[d] for d in range(depth)]
        slabp = [slab_x[d] for d in range(depth)]
        feats = _halo2(feats, dims_m, cbs, slabp, AXIS)
        acts = _halo2(acts, dims_m, [1] * depth, slabp, AXIS)
        xs_ext = _halo2([x for x in xs_l], dims_m, [k] * depth,
                        slabp, AXIS)
        xs_pk = tuple(x.reshape(spec_m.n_cells(d) * k // 128, 128)
                      for d, x in enumerate(xs_ext))

        av0 = LAT._av0_cascade(spec_m, xs_pk, jnp.dtype(cdt))
        fc, mask_parts, occ_parts = [], [], []
        for d in range(depth):
            fc.append(LAT._corner_cat(feats[d], spec_m, d, cbs[d])
                      .astype(jnp.dtype(cdt)))
            any_c = (LAT._corner_cat(acts[d], spec_m, d, 1) > 0).any(-1)
            mask_parts.append(any_c.astype(jnp.float32))
            occ_parts.append(acts[d])
        phase0 = tuple(int(0) for _ in range(3))
        mask0 = mask_parts[0]
        for d in range(1, depth):
            up = LAT._upsample_to_0(mask_parts[d][:, None], spec_m, d,
                                    phase0)
            mask0 = jnp.maximum(mask0, up[:, 0])
        shell0 = occ_parts[0]
        for d in range(1, spec.adaptive_depth):
            up = LAT._upsample_to_0(occ_parts[d][:, None], spec_m, d,
                                    phase0)
            shell0 = jnp.maximum(shell0, up[:, 0])

        _, _, n_c = LM._candidate_fn(spec_m, f, cell_x_max=Wf + 1,
                                     cell_x_min=1)(shell0)
        return (av0[None], tuple(c[None] for c in fc), mask0[None],
                shell0[None], n_c[None])

    av0_p, fc_p, mask0_p, shell0_p, counts = prep(
        tuple(basis_features), origins,
        tuple(jnp.asarray(x) for x in xs_parts),
        tuple(jnp.asarray(v) for v in splan.vox_cell_loc),
        tuple(jnp.asarray(v) for v in splan.vox_active_loc),
        tuple(jnp.asarray(v) for v in splan.vox_src))
    cap_c = LM._next_cap(int(np.asarray(counts).max()))

    def run_extract(cap_v, cap_q):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(PS(), PS(), PS(AXIS),
                      tuple(PS(AXIS) for _ in range(depth)),
                      PS(AXIS), PS(AXIS)),
            out_specs=(PS(AXIS),) * 6,
            check_vma=False)
        def extract(interp_p, origins_g, av0, fc, mask0, shell0):
            sq = lambda a: a[0]
            tables = LatticeEvalTables(
                av0=sq(av0), fc=tuple(sq(c) for c in fc),
                mask0=sq(mask0), shell0=sq(shell0))
            dev = jax.lax.axis_index(AXIS)
            org_l = origins_g.at[:, 0].add(dev.astype(jnp.int32) * slabs)

            cand, corner_mask, _ = LM._candidate_fn(
                spec_m, f, cell_x_max=Wf + 1,
                cell_x_min=1)(tables.shell0)
            v_dense = LM._corner_eval_fn(
                spec_m, f, cap_c, voxel_size, cdt, approx_grad)(
                interp_p, tables, org_l, corner_mask)
            verts, centers, nv, quads, flips, nqs, cc = LM._topology_fn(
                spec_m, f, cap_v, cap_q, voxel_size,
                quad_x_min=2)(v_dense, cand, org_l)
            if mise_iter > 0:
                verts = LM._newton_fn(spec_m, f, cap_v, voxel_size,
                                      cdt, approx_grad)(
                    interp_p, tables, org_l, verts, centers)
            wc = cc + org_l[0][None, :] * f       # world fine coords
            return (verts[None], nv[None], wc[None], quads[None],
                    flips[None], nqs[None])

        return extract(interp_params, origins, av0_p, fc_p,
                       mask0_p, shell0_p)

    cap_v = LM._next_cap(cap_c // 4)
    cap_q = LM._next_cap(cap_c // 4)
    verts, nv, wc, quads, flips, nqs = run_extract(cap_v, cap_q)
    nv_np = np.asarray(nv)
    nqs_np = np.asarray(nqs)
    if int(nv_np.max()) > cap_v or int(nqs_np.max()) > cap_q:
        cap_v = LM._next_cap(int(nv_np.max()))
        cap_q = LM._next_cap(max(4 * int(nv_np.max()),
                                 int(nqs_np.max())))
        verts, nv, wc, quads, flips, nqs = run_extract(cap_v, cap_q)
        nv_np = np.asarray(nv)
        nqs_np = np.asarray(nqs)

    # ---- host assembly: per-slab lists + seam join ---------------------
    # ownership boundary: slab s owns world fine planes
    # [s*Wf + 2, (s+1)*Wf + 2) relative to the lattice origin; the
    # duplicate plane (local x == 1) precedes the owned block in the
    # x-ascending enumeration
    ox = int(plan.origins[0][0])
    left = [(ox + s * slab_x[0]) * f + 2 for s in range(n)]
    vkeys, vdup, vpos = [], [], []
    for s in range(n):
        m = int(nv_np[s])
        w = np.asarray(wc[s, :m])
        vkeys.append(HB.pack64(w.astype(np.int64)))
        vdup.append(w[:, 0] < left[s])
        vpos.append(np.asarray(verts[s, :m]))
    n_dup = [int(d.sum()) for d in vdup]
    n_own = [int(nv_np[s]) - n_dup[s] for s in range(n)]
    base = np.concatenate([[0], np.cumsum(n_own)[:-1]]).astype(np.int64)

    from ..native import sorted_join
    lv2g = []
    for s in range(n):
        m = int(nv_np[s])
        g = np.full(m, -1, np.int64)
        nd = n_dup[s]
        # owned verts are the contiguous x-ascending suffix
        g[nd:] = base[s] + np.arange(n_own[s])
        if s > 0 and nd:
            # duplicate plane == left neighbor's LAST owned plane
            nbr_keys = vkeys[s - 1][n_dup[s - 1]:]
            j = sorted_join(nbr_keys, vkeys[s][:nd])
            g[:nd] = np.where(j >= 0, base[s - 1] + j.astype(np.int64),
                              -1)
        lv2g.append(g)

    import os
    if os.environ.get("NKSR_SHARDED_MC_DEBUG"):
        for s in range(n):
            m = int(nv_np[s])
            nd = n_dup[s]
            nj = int((lv2g[s][:nd] >= 0).sum())
            print(f"[mesh_shard] slab {s}: verts {m} (own {n_own[s]}, "
                  f"dup {nd}, joined {nj}) quads {nqs_np[s].tolist()}")

    tris = []
    dropped = 0
    for s in range(n):
        for a in range(3):
            nq = int(nqs_np[s, a])
            if nq == 0:
                continue
            q = np.asarray(quads[s, a, :nq]).astype(np.int64)
            fl = np.asarray(flips[s, a, :nq])
            gq = np.where(q >= 0, lv2g[s][np.clip(q, 0, None)], -1)
            ok = (gq >= 0).all(1)
            dropped += int((~ok).sum())
            gq = gq[ok]
            fl = fl[ok]
            gq = np.where(fl[:, None], gq[:, ::-1], gq)
            tris.append(gq[:, [0, 1, 2]])
            tris.append(gq[:, [0, 2, 3]])
    fcs = np.concatenate(tris, 0).astype(np.int32) if tris else \
        np.zeros((0, 3), np.int32)
    if dropped:
        import warnings
        warnings.warn(f"sharded mesh: {dropped} quads dropped at slab "
                      "seams (unresolved duplicate-vertex references)")

    verts_g = np.concatenate(
        [vpos[s][n_dup[s]:] for s in range(n)], 0) if n else \
        np.zeros((0, 3), np.float32)
    if len(fcs):
        used = np.zeros(len(verts_g), bool)
        used[fcs.reshape(-1)] = True
        remap = np.cumsum(used, dtype=np.int64) - 1
        verts_g = verts_g[used]
        fcs = remap[fcs].astype(np.int32)
    else:
        verts_g = verts_g[:0]
    return TriangleMesh(v=np.asarray(verts_g, np.float32), f=fcs,
                        c=None)
