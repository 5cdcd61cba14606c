"""Sharded-SVH kernel solve: ONE lattice partitioned into x-slabs across
the device mesh, with kernel-support halos exchanged over ICI inside
every CG iteration.

This is the SURVEY §5 north star ("the chunk grid becomes a sharded SVH
across chips; halo regions exchanged over ICI") made concrete on the
dense-lattice engine (fields/lattice.py):

  * the per-depth coefficient lattices are split into ``n`` contiguous
    x-slabs (dims are re-planned so every depth's X divides evenly —
    slab boundaries then align exactly across depths, because points'
    nested cells satisfy (x0 >> d) // (X_d/n) == x0 // (X_0/n));
  * solve rows (point slots + gradient slots) are owned by the slab
    containing their depth-0 cell;
  * the only cross-slab coupling is the +1x corner read of the compact
    kernel support — ONE x-plane per depth.  Each matvec ppermutes that
    plane from the right neighbor (forward) and returns the adjoint
    contribution to it (backward).  CG dot products are ``lax.psum``
    over the mesh axis.

Unlike ``parallel/spatial.py``'s sharded CHUNKS (independent per-chunk
solves over geometrically duplicated halos), this is a single global
least-squares system: the sharded solve and the single-device solve
compute the same normal equations and agree to solver tolerance
(tests/test_parallel.py::TestShardedLattice).

Reference analog: the out-of-core chunked engine
(/root/reference/NKSR-USAGE.md:88-126) — re-designed as SPMD over a
``jax.sharding.Mesh`` instead of a serial host loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS
from jax import shard_map

from ..fields import lattice as LAT


# mesh axis name is taken from the mesh at call time


def _next_pow2(n: int, lo: int = 8) -> int:
    import math
    return 1 << max(int(math.ceil(math.log2(max(n, 1)))), int(math.log2(lo)))


# ------------------------------------------------------------ host planning
class ShardedPlan(NamedTuple):
    """Per-device (leading axis n) localizations of a LatticePlan."""
    spec_local: LAT.LatticeSpec      # slab+1-halo-plane dims
    n_shards: int
    slab_x: Tuple[int, ...]          # per-depth slab width (cells)
    # point rows (stacked per device):
    xyz: np.ndarray                  # (n, cap_loc, 3)
    mask: np.ndarray                 # (n, cap_loc)
    cell0: np.ndarray                # (n, cap_loc, 3) world depth-0 cell
    dest: np.ndarray                 # (n, cap_loc)
    slot_cells_pt: np.ndarray        # (n, depth, s_pt_loc) LOCAL flat ids
    # gradient rows:
    gr_coords: np.ndarray            # (n, s_gr_loc, 3)
    gr_depth: np.ndarray             # (n, s_gr_loc)
    gr_active: np.ndarray            # (n, s_gr_loc)
    slot_cells_gr: np.ndarray        # (n, depth, s_gr_loc)
    gr_src: np.ndarray               # (n, s_gr_loc) global hierarchy row
    # voxels (coefficient/basis ownership):
    vox_cell_loc: Tuple[np.ndarray, ...]   # per depth (n, vcap_loc)
    vox_active_loc: Tuple[np.ndarray, ...]
    vox_src: Tuple[np.ndarray, ...]        # per depth (n, vcap_loc) global row


def plan_sharded(grids, caps, xyz: np.ndarray, sorted_base0, order0,
                 voxel_size: float, depth: int, adaptive_depth: int,
                 n_shards: int, k: int = 4,
                 dec_grids=None, dec_caps=None):
    """Aligned global plan + per-slab localization.

    Returns (global LatticePlan, ShardedPlan) or None when the lattice
    doesn't fit (caller falls back)."""
    plan = LAT.plan_lattice(grids, caps, xyz, sorted_base0, order0,
                            voxel_size, depth, adaptive_depth, k=k,
                            dec_grids=dec_grids, dec_caps=dec_caps)
    if plan is None:
        return None
    # re-plan with X aligned so every depth's X divides into n slabs
    A = n_shards * (1 << (depth - 1))
    x0_need = max(plan.spec.dims[d][0] << d for d in range(depth))
    x0 = -(-x0_need // A) * A
    force = tuple((x0 >> d,) + plan.spec.dims[d][1:] for d in range(depth))
    plan = LAT.plan_lattice(grids, caps, xyz, sorted_base0, order0,
                            voxel_size, depth, adaptive_depth, k=k,
                            dec_grids=dec_grids, dec_caps=dec_caps,
                            force_dims=force)
    if plan is None:
        return None
    spec = plan.spec
    n = n_shards
    slab_x = tuple(spec.dims[d][0] // n for d in range(depth))
    yz = tuple(spec.dims[d][1] * spec.dims[d][2] for d in range(depth))
    # local cell count: slab + ONE halo x-plane (the +1x corner read; y/z
    # wrap rows of the halo plane are global-margin cells, never
    # referenced)
    n_cells_loc = tuple((slab_x[d] + 1) * yz[d] for d in range(depth))

    def owner_of_flat0(flat0):
        return np.minimum(flat0 // yz[0] // slab_x[0], n - 1)

    def localize(flat, d, dev):
        loc = flat.astype(np.int64) - dev * slab_x[d] * yz[d]
        # pad/foreign entries clamp to 0 (their rows are zero-masked)
        return np.where((loc >= 0) & (loc < n_cells_loc[d]),
                        loc, 0).astype(np.int32)

    # ---- point slots & their rows --------------------------------------
    own_slot = owner_of_flat0(plan.slot_cell0_pt.astype(np.int64))
    # plan pads slot arrays by repeating the last real slot; detect count
    # from pt_dest (real points reference real slots)
    npts = plan.pt_perm.shape[0]
    s_pt, p_rows = spec.s_pt, spec.p_rows
    pt_slot = plan.pt_dest.astype(np.int64) % s_pt
    pt_row = plan.pt_dest.astype(np.int64) // s_pt
    own_pt = own_slot[pt_slot]

    slot_lists = [np.nonzero(own_slot == dev)[0] for dev in range(n)]
    # restrict to slots that actually carry points (pad slots repeat the
    # last cell and would double-count)
    used = np.zeros(s_pt, bool)
    used[pt_slot] = True
    slot_lists = [s[used[s]] for s in slot_lists]
    s_pt_loc = _next_pow2(max((len(s) for s in slot_lists), default=1))
    cap_loc = _next_pow2(max((int((own_pt == dev).sum())
                              for dev in range(n)), default=1), lo=64)

    xyz_sorted = xyz[plan.pt_perm]
    xyz_l = np.zeros((n, cap_loc, 3), np.float32)
    mask_l = np.zeros((n, cap_loc), bool)
    cell0_l = np.zeros((n, cap_loc, 3), np.int32)
    dest_l = np.full((n, cap_loc), p_rows * s_pt_loc, np.int32)
    slot_cells_pt_l = np.zeros((n, spec.depth, s_pt_loc), np.int32)
    for dev in range(n):
        slots = slot_lists[dev]
        remap = np.full(s_pt, -1, np.int64)
        remap[slots] = np.arange(len(slots))
        sel = np.nonzero(own_pt == dev)[0]
        m = len(sel)
        xyz_l[dev, :m] = xyz_sorted[sel]
        mask_l[dev, :m] = True
        cell0_l[dev, :m] = plan.pt_cell0[sel]
        dest_l[dev, :m] = (pt_row[sel] * s_pt_loc
                           + remap[pt_slot[sel]]).astype(np.int32)
        for d in range(spec.depth):
            slot_cells_pt_l[dev, d, :len(slots)] = localize(
                plan.slot_cell_pt[d][slots], d, dev)

    # ---- gradient slots -------------------------------------------------
    s_gr = spec.s_gr
    own_gr = owner_of_flat0(plan.slot_cell0_gr.astype(np.int64))
    own_gr = np.where(plan.gr_active, own_gr, 0)
    gr_lists = [np.nonzero((own_gr == dev) & plan.gr_active)[0]
                for dev in range(n)]
    s_gr_loc = _next_pow2(max((len(g) for g in gr_lists), default=1))
    gr_coords_l = np.zeros((n, s_gr_loc, 3), np.int32)
    gr_depth_l = np.zeros((n, s_gr_loc), np.int32)
    gr_active_l = np.zeros((n, s_gr_loc), bool)
    slot_cells_gr_l = np.zeros((n, spec.depth, s_gr_loc), np.int32)
    gr_src_l = np.zeros((n, s_gr_loc), np.int32)
    for dev in range(n):
        g = gr_lists[dev]
        m = len(g)
        gr_coords_l[dev, :m] = plan.gr_coords[g]
        gr_depth_l[dev, :m] = plan.gr_depth[g]
        gr_active_l[dev, :m] = True
        # realign to hierarchy order: gr_perm[g] is the hierarchy row of
        # sorted slot g (lattice_solve applies the same take)
        gr_src_l[dev, :m] = plan.gr_perm[g]
        for d in range(spec.depth):
            slot_cells_gr_l[dev, d, :m] = localize(
                plan.slot_cell_gr[d][g], d, dev)

    # ---- voxels ----------------------------------------------------------
    vox_cell_loc, vox_active_loc, vox_src = [], [], []
    for d in range(spec.depth):
        vc = plan.vox_cell[d].astype(np.int64)
        va = plan.vox_active[d]
        own_v = np.minimum(vc // yz[d] // slab_x[d], n - 1)
        own_v = np.where(va, own_v, 0)
        lists = [np.nonzero((own_v == dev) & va)[0] for dev in range(n)]
        vcap = _next_pow2(max((len(x) for x in lists), default=1), lo=64)
        c_l = np.zeros((n, vcap), np.int32)
        a_l = np.zeros((n, vcap), bool)
        s_l = np.zeros((n, vcap), np.int32)
        for dev in range(n):
            sel = lists[dev]
            m = len(sel)
            c_l[dev, :m] = localize(vc[sel], d, dev)
            a_l[dev, :m] = True
            s_l[dev, :m] = sel
        vox_cell_loc.append(c_l)
        vox_active_loc.append(a_l)
        vox_src.append(s_l)

    # local spec: extended dims + LOCAL slot/row capacities (assemble_rows
    # and the matvec read s_pt/p_rows/s_gr/n_pts_cap from the spec)
    spec_local = dataclasses.replace(
        spec,
        dims=tuple((slab_x[d] + 1,) + spec.dims[d][1:]
                   for d in range(depth)),
        s_pt=s_pt_loc, s_gr=s_gr_loc, n_pts_cap=cap_loc)

    return plan, ShardedPlan(
        spec_local=spec_local, n_shards=n, slab_x=slab_x,
        xyz=xyz_l, mask=mask_l, cell0=cell0_l, dest=dest_l,
        slot_cells_pt=slot_cells_pt_l,
        gr_coords=gr_coords_l, gr_depth=gr_depth_l,
        gr_active=gr_active_l, slot_cells_gr=slot_cells_gr_l,
        gr_src=gr_src_l,
        vox_cell_loc=tuple(vox_cell_loc),
        vox_active_loc=tuple(vox_active_loc),
        vox_src=tuple(vox_src))


# ------------------------------------------------------------ device pieces
def _halo_fwd(spec_local: LAT.LatticeSpec, xs_slab, v: int, axis: str):
    """Append the right neighbor's FIRST x-plane to each depth's slab
    buffer (open chain: the last device appends zeros)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, i - 1) for i in range(1, n)]
    out = []
    for d, x in enumerate(xs_slab):
        X1, Y, Z = spec_local.dims[d]
        plane = X1 - 1  # slab width
        rows = x.reshape(plane, Y * Z * v)
        halo = jax.lax.ppermute(rows[:1], axis, perm)
        out.append(jnp.concatenate([rows, halo], 0).reshape(-1))
    return tuple(out)


def _halo_adj(spec_local: LAT.LatticeSpec, xs_ext, v: int, axis: str):
    """Adjoint of ``_halo_fwd``: fold each extended buffer's halo plane
    back onto the right neighbor's first plane."""
    n = jax.lax.axis_size(axis)
    perm = [(i, i + 1) for i in range(n - 1)]
    out = []
    for d, x in enumerate(xs_ext):
        X1, Y, Z = spec_local.dims[d]
        rows = x.reshape(X1, Y * Z * v)
        back = jax.lax.ppermute(rows[-1:], axis, perm)
        slab = rows[:-1].at[:1].add(back)
        out.append(slab.reshape(-1))
    return tuple(out)


def sharded_lattice_solve(mesh: Mesh, splan: ShardedPlan, interp_params,
                          basis_features, gr_targets, voxel_size: float,
                          pos_weight: float, normal_weight: float,
                          reg_weight: float, tol: float, max_iters: int,
                          approx_grad: bool = False,
                          return_slab_xs: bool = False):
    """Distributed PCG over the slab-sharded lattice.

    ``basis_features``/``gr_targets``: GLOBAL per-depth arrays
    (replicated); ownership gathers are per-device via the plan's src
    index tables.  Returns global per-depth flat coefficients
    (cap_d * k,), identical in math to fields/lattice.lattice_solve.

    ``return_slab_xs``: additionally return the per-slab packed dense
    coefficient lattices (per depth, leading device axis, slab-only
    extent (slab_x[d] * Y * Z * k,)) so sharded mesh extraction
    (parallel/mesh_shard.py) can consume the solution WITHOUT ever
    materializing the global lattice on one device.  Return becomes
    (alphas_parts, xs_parts)."""
    spec_l = splan.spec_local
    depth, k = spec_l.depth, spec_l.k
    n = splan.n_shards
    AXIS = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PS(), PS(), PS(),
                  PS(AXIS), PS(AXIS), PS(AXIS), PS(AXIS), PS(AXIS),
                  PS(AXIS), PS(AXIS), PS(AXIS), PS(AXIS), PS(AXIS),
                  tuple(PS(AXIS) for _ in range(depth)),
                  tuple(PS(AXIS) for _ in range(depth)),
                  tuple(PS(AXIS) for _ in range(depth))),
        out_specs=(tuple(PS(AXIS) for _ in range(depth)),
                   tuple(PS(AXIS) for _ in range(depth))),
        check_vma=False)
    def solve(interp_params, basis_global, gr_targets_global,
              xyz, mask, cell0, dest, slot_cells_pt,
              gr_coords, gr_depth, gr_active, slot_cells_gr, gr_src,
              vox_cell, vox_active, vox_src):
        from ..fields.support import InterpolatorFn
        sq = lambda a: a[0]                   # drop the sharded axis
        xyz_, mask_, cell0_, dest_ = (sq(xyz), sq(mask), sq(cell0),
                                      sq(dest))
        sc_pt = sq(slot_cells_pt)
        gr_c, gr_d, gr_a = sq(gr_coords), sq(gr_depth), sq(gr_active)
        sc_gr = sq(slot_cells_gr)
        gr_s = sq(gr_src)
        vc = tuple(sq(v) for v in vox_cell)
        va = tuple(sq(v) for v in vox_active)
        vs_ = tuple(sq(v) for v in vox_src)

        interp = InterpolatorFn(params={"params": interp_params},
                                module=None)

        # one-time: local dense features + activity with a feature halo
        feats, acts = [], []
        for d in range(depth):
            cb = basis_global[d].shape[-1]
            f_rows = jnp.take(basis_global[d], vs_[d], axis=0)
            f_rows = jnp.where(va[d][:, None], f_rows, 0.0)
            nc = spec_l.n_cells(d)
            fd = jnp.zeros((nc, cb)).at[vc[d]].add(f_rows, mode="drop")
            ad = jnp.zeros((nc,)).at[vc[d]].add(
                va[d].astype(jnp.float32), mode="drop")
            feats.append(fd.reshape(-1))
            acts.append(ad)
        # owned voxels live in the slab; halo planes come from the right
        feats = _halo_refresh(spec_l, feats,
                              [basis_global[d].shape[-1]
                               for d in range(depth)], AXIS)
        acts = _halo_refresh(spec_l, acts, [1] * depth, AXIS)
        features_dense_fc = tuple(
            LAT._corner_cat(feats[d], spec_l, d,
                            basis_global[d].shape[-1])
            for d in range(depth))
        act_fc = tuple(LAT._corner_cat(acts[d], spec_l, d, 1)
                       for d in range(depth))

        b_pt, m_pt, _, b_gr = LAT.assemble_rows(
            spec_l, interp, features_dense_fc, act_fc, xyz_, mask_,
            cell0_, dest_, sc_pt, gr_c, gr_d, gr_a, sc_gr,
            voxel_size, approx_grad)
        b_pt, m_pt, b_gr = jax.lax.optimization_barrier(
            (b_pt, m_pt, b_gr))

        n_pts = jnp.maximum(jax.lax.psum(
            jnp.sum(mask_.astype(jnp.float32)), AXIS), 1.0)
        m_vox = jnp.maximum(jax.lax.psum(
            jnp.sum(gr_a.astype(jnp.float32)), AXIS), 1.0)
        w_pt = m_pt * (pos_weight / n_pts)
        w_gr = gr_a.astype(jnp.float32) * (
            normal_weight / m_vox * voxel_size ** 2)

        targets = jnp.take(gr_targets_global, gr_s, axis=0)
        targets = jnp.where(gr_a[:, None], targets, 0.0)

        f32 = jnp.float32

        def apply_A(xs_slab):
            xs_ext = _halo_fwd(spec_l, xs_slab, k, AXIS)
            avs = LAT._corner_tables(spec_l, xs_ext, f32)
            av_pt = LAT._row_blocks(spec_l, xs_ext, sc_pt, avs=avs)
            av_gr = LAT._row_blocks(spec_l, xs_ext, sc_gr, avs=avs)
            t_pt = jnp.einsum('rsl,sl->rs', b_pt,
                              av_pt, preferred_element_type=f32)
            t_gr = jnp.einsum('rsl,sl->rs', b_gr,
                              av_gr, preferred_element_type=f32)
            return t_pt, t_gr

        def apply_AT(t_pt, t_gr):
            y_pt = jnp.einsum('rsl,rs->sl', b_pt, t_pt,
                              preferred_element_type=f32)
            y_gr = jnp.einsum('rsl,rs->sl', b_gr, t_gr,
                              preferred_element_type=f32)
            outs = []
            w8 = 8 * k
            for d in range(depth):
                acc = jnp.zeros((spec_l.n_cells(d), w8)).at[
                    sc_pt[d]].add(y_pt[:, d * w8:(d + 1) * w8],
                                  mode="drop")
                acc = acc.at[sc_gr[d]].add(
                    y_gr[:, d * w8:(d + 1) * w8], mode="drop")
                outs.append(LAT._corner_scatter_back(acc, spec_l, d, k))
            return _halo_adj(spec_l, tuple(outs), k, AXIS)

        def matvec(xs):
            t_pt, t_gr = apply_A(xs)
            y = apply_AT(w_pt * t_pt, w_gr[None, :] * t_gr)
            return jax.tree_util.tree_map(
                lambda yi, xi: yi + reg_weight * xi, y, xs)

        rhs = apply_AT(jnp.zeros((spec_l.p_rows, b_pt.shape[1]), f32),
                       w_gr[None, :] * jnp.swapaxes(targets, 0, 1))

        # Jacobi diagonal via the same adjoint path on squared rows
        sq_pt = jnp.einsum('rsl,rs->sl', b_pt ** 2, w_pt)
        sq_gr = jnp.einsum('rsl,rs->sl', b_gr ** 2,
                           w_gr[None].repeat(3, 0))
        outs = []
        w8 = 8 * k
        for d in range(depth):
            acc = jnp.zeros((spec_l.n_cells(d), w8)).at[sc_pt[d]].add(
                sq_pt[:, d * w8:(d + 1) * w8], mode="drop")
            acc = acc.at[sc_gr[d]].add(
                sq_gr[:, d * w8:(d + 1) * w8], mode="drop")
            outs.append(LAT._corner_scatter_back(acc, spec_l, d, k))
        diag = jax.tree_util.tree_map(
            lambda a: a + reg_weight,
            _halo_adj(spec_l, tuple(outs), k, AXIS))
        diag = jax.lax.optimization_barrier(diag)

        def precond(r):
            return jax.tree_util.tree_map(lambda ri, di: ri / di, r, diag)

        xs = _pcg_psum(matvec, rhs, precond, tol, max_iters, AXIS)

        alphas = []
        for d in range(depth):
            rows = jnp.take(xs[d].reshape(-1, k), vc[d], axis=0)
            rows = jnp.where(va[d][:, None], rows, 0.0)
            alphas.append(rows[None])          # restore sharded axis
        return tuple(alphas), tuple(x[None] for x in xs)

    parts, xs_parts = solve(
        interp_params, basis_features, gr_targets,
        jnp.asarray(splan.xyz), jnp.asarray(splan.mask),
        jnp.asarray(splan.cell0), jnp.asarray(splan.dest),
        jnp.asarray(splan.slot_cells_pt),
        jnp.asarray(splan.gr_coords), jnp.asarray(splan.gr_depth),
        jnp.asarray(splan.gr_active), jnp.asarray(splan.slot_cells_gr),
        jnp.asarray(splan.gr_src),
        tuple(jnp.asarray(v) for v in splan.vox_cell_loc),
        tuple(jnp.asarray(v) for v in splan.vox_active_loc),
        tuple(jnp.asarray(v) for v in splan.vox_src))
    if return_slab_xs:
        return parts, xs_parts
    return parts


def _halo_refresh(spec_local: LAT.LatticeSpec, bufs, widths, axis: str):
    """One-time feature/activity halo: overwrite each extended buffer's
    LAST x-plane with the right neighbor's first owned plane."""
    n = jax.lax.axis_size(axis)
    perm = [(i, i - 1) for i in range(1, n)]
    out = []
    for d, (b, v) in enumerate(zip(bufs, widths)):
        X1, Y, Z = spec_local.dims[d]
        rows = b.reshape(X1, Y * Z * v)
        halo = jax.lax.ppermute(rows[:1], axis, perm)
        out.append(jnp.concatenate([rows[:-1], halo], 0).reshape(-1))
    return out


def _pcg_psum(matvec, b, precond, tol: float, max_iters: int, axis: str):
    """PCG whose dot products are psum'd over the mesh axis (the
    distributed twin of solver/pcg.pcg)."""
    def tdot(a, c):
        leaves = jax.tree_util.tree_map(
            lambda x, y: jnp.sum(x.astype(jnp.float32)
                                 * y.astype(jnp.float32)), a, c)
        local = jax.tree_util.tree_reduce(jnp.add, leaves)
        return jax.lax.psum(local, axis)

    axpy = lambda a, x, y: jax.tree_util.tree_map(
        lambda u, v: a * u + v, x, y)
    b_norm = jnp.sqrt(tdot(b, b)) + 1e-30
    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    z0 = precond(b)
    rz0 = tdot(b, z0)
    rr0 = tdot(b, b)

    def cond(state):
        i, _, _, _, _, rr = state
        return (i < max_iters) & (jnp.sqrt(rr) / b_norm > tol)

    def body(state):
        i, x, r, p, rz, _ = state
        mp = matvec(p)
        alpha = rz / (tdot(p, mp) + 1e-30)
        x = axpy(alpha, p, x)
        r = axpy(-alpha, mp, r)
        z = precond(r)
        rz_new = tdot(r, z)
        beta = rz_new / (rz + 1e-30)
        p = axpy(beta, p, z)
        return i + 1, x, r, p, rz_new, tdot(r, r)

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x0, b, z0, rz0, rr0))
    return x


def gather_alphas(plan, splan: ShardedPlan, parts) -> Tuple[np.ndarray, ...]:
    """Reassemble global per-depth flat coefficients from the per-device
    owned-voxel pieces."""
    out = []
    k = plan.spec.k
    for d in range(plan.spec.depth):
        cap = plan.vox_cell[d].shape[0]
        glob = np.zeros((cap, k), np.float32)
        rows = np.asarray(parts[d])             # (n, vcap_loc, k)
        for dev in range(splan.n_shards):
            act = splan.vox_active_loc[d][dev]
            glob[splan.vox_src[d][dev][act]] = rows[dev][act]
        out.append(glob.reshape(cap * k))
    return tuple(out)
