"""Spatial sharding: the sequence-parallel analog for surface
reconstruction (SURVEY.md §5 "long-context equivalent").

The reference scales spatially by *serial* chunking with host offload
(NKSR-USAGE.md:88-126).  On TPU the chunk grid maps onto the device mesh
instead: each chip owns a slab of space plus a halo wide enough for the
kernel support + dual-MC stencil, reconstructs its slab locally, and only
the halo features ride ICI.

Two tiers live under this package:

- this module: shard a *batch of chunks* across the mesh with shard_map —
  each device runs the full single-chunk pipeline on its own chunk(s)
  (the chunks are independent by construction because the host chunker
  already adds geometric halos, chunking.py);
- ``lattice_shard.py``: ONE lattice solve sharded in x-slabs with true
  per-CG-iteration halo exchange over ``ppermute`` (forward + adjoint)
  — reachable from ``Reconstructor.reconstruct(..., mesh=...)``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
from jax import shard_map

from ..models import pipeline as P


def chunk_forward_sharded(cfg: P.PipelineConfig, mesh: Mesh, params,
                          chunk_batch: Dict[str, jnp.ndarray]):
    """Run the reconstruction forward on B chunks, B sharded over devices.

    ``chunk_batch``: xyz (B, N, 3), mask (B, N), feat (B, N, 3).
    Returns per-chunk field evaluations at the input points (B, N) — the
    cheap summary used by tests; full fields stay device-local.
    """

    def one(p, xyz, mask, feat):
        out = P.forward(cfg, p, xyz, mask, feat)
        return out.field.evaluate_f(xyz).value

    def shard_fn(p, xyz, mask, feat):
        return jax.vmap(lambda x, m, f: one(p, x, m, f))(xyz, mask, feat)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(PS(), PS("data"), PS("data"), PS("data")),
                   out_specs=PS("data"), check_vma=False)
    return fn(params, chunk_batch["xyz"], chunk_batch["mask"],
              chunk_batch["feat"])


def reconstruct_chunks_sharded(recon, xyz: np.ndarray,
                               normal: Optional[np.ndarray],
                               sensor: Optional[np.ndarray],
                               chunk_size: float, mesh: Mesh,
                               approx_kernel_grad: bool = False,
                               solver_tol: float = 1e-5):
    """Chunked reconstruction with the chunk axis sharded over a device
    mesh — the TPU-native scale-out of the reference's serial chunk loop
    (NKSR-USAGE.md:88-126; SURVEY.md §5 north star).

    The host builds every chunk's grids + index tables (sort-free device
    programs, core/host_build.py) at COMMON per-level capacities so the
    per-chunk pytrees stack into (B, ...) arrays; one ``shard_map``-ped,
    ``vmap``-ped forward then solves all chunks concurrently, B/n_dev per
    chip.  Chunk independence is geometric (the host chunker adds halos
    wider than the kernel support), so no cross-chip exchange is needed
    for the solve itself; meshes stitch exactly like the serial path.

    The solve runs on the dense-lattice engine (fields/lattice.py) with
    one COMMON LatticeSpec across chunks (equal chunk extents make the
    forced dims cheap), keeping results consistent with the serial chunk
    loop; if any chunk exceeds the forced sizes the whole batch falls
    back to the sparse in-graph solve.
    """
    import dataclasses
    import math

    from ..core import host_build as HB
    from ..models import pipeline as P
    from ..ops.gather_scatter import stencil_offsets
    from ..recon.chunking import ChunkedField
    from ..recon.host_field import HostField

    cfg = recon.config
    vs = cfg.voxel_size
    halo = vs * (2 ** cfg.tree_depth) + 2 * vs
    lo = xyz.min(0)
    ids = np.floor((xyz - lo) / chunk_size).astype(np.int64)
    uniq = np.unique(ids, axis=0)

    def _pow2(n):
        return 1 << max(8, int(math.ceil(math.log2(max(n, 1)))))

    # ---- host: per-chunk grids + capacities
    sel_list, grids_list, orders_list, cids = [], [], [], []
    for cid in uniq:
        c_lo = lo + cid * chunk_size
        c_hi = c_lo + chunk_size
        sel = np.all((xyz >= c_lo - halo) & (xyz < c_hi + halo), axis=1)
        if sel.sum() < 16:
            continue
        g, o = HB.build_splat_grids_ex(xyz[sel], vs, cfg.tree_depth)
        sel_list.append(sel)
        grids_list.append(g)
        orders_list.append(o)
        cids.append(cid)
    if not sel_list:
        return ChunkedField([], chunk_size, vs, origin=lo,
                            id_lo=uniq.min(0), id_hi=uniq.max(0))
    caps = tuple(_pow2(max(len(g[d].keys) for g in grids_list))
                 for d in range(cfg.tree_depth))
    cap_pts = _pow2(max(int(s.sum()) for s in sel_list))
    from ..recon.reconstructor import (resolve_solver_dtype,
                                       resolve_cascade_engine)
    _cascade_eng = resolve_cascade_engine(cfg.cascade_engine)
    cfg = dataclasses.replace(
        cfg, capacities=caps, approx_kernel_grad=approx_kernel_grad,
        solver_tol=solver_tol, structure_mode="splat",
        feature="normal" if normal is not None else "sensor",
        solver_compute_dtype=resolve_solver_dtype(cfg.solver_compute_dtype))

    # ---- host: lattice plans at one common spec (dims = per-depth max)
    import os as _os
    plans = None
    if _os.environ.get("NKSR_LATTICE", "1") == "1":
        from ..fields.lattice import plan_lattice
        raw = [plan_lattice(g, caps, xyz[sel], o[0][0], o[0][1], vs,
                            cfg.tree_depth, cfg.adaptive_depth,
                            k=cfg.kernel_dim)
               for g, o, sel in zip(grids_list, orders_list, sel_list)]
        if all(p is not None for p in raw):
            force_dims = tuple(
                tuple(int(max(p.spec.dims[d][a] for p in raw))
                      for a in range(3))
                for d in range(cfg.tree_depth))
            force_s_pt = max(p.spec.s_pt for p in raw)
            plans = [plan_lattice(g, caps, xyz[sel], o[0][0], o[0][1], vs,
                                  cfg.tree_depth, cfg.adaptive_depth,
                                  k=cfg.kernel_dim, force_dims=force_dims,
                                  force_s_pt=force_s_pt, force_cap=cap_pts)
                     for g, o, sel in zip(grids_list, orders_list,
                                          sel_list)]
            if any(p is None for p in plans):
                plans = None

    # ---- host: per-chunk padded arrays + tables, then stack
    stencil = stencil_offsets(3)
    xyzs, masks, feats, pres = [], [], [], []
    for sel, grids, orders in zip(sel_list, grids_list, orders_list):
        cx = xyz[sel]
        n = cx.shape[0]
        pad = cap_pts - n
        xp = np.pad(cx, ((0, pad), (0, 0)))
        mk = np.zeros(cap_pts, bool)
        mk[:n] = True
        ft = P.point_features(
            cfg, jnp.asarray(xp),
            normal=None if normal is None else jnp.asarray(
                np.pad(normal[sel], ((0, pad), (0, 0)))),
            sensor=None if sensor is None else jnp.asarray(
                np.pad(sensor[sel], ((0, pad), (0, 0)))))
        enc_svh = HB.to_device_svh(grids, caps, vs)
        tables = HB.build_unet_tables(grids, caps, stencil)
        sup = HB.support_indices(grids, caps, cx, presorted=orders)
        sup = tuple(np.concatenate(
            [s, np.full((pad, 8), -1, np.int32)]) for s in sup)
        centers = []
        for d in range(cfg.adaptive_depth):
            cpad = np.zeros((caps[d], 3), np.float32)
            nn = min(len(grids[d].keys), caps[d])
            cpad[:nn] = grids[d].coords[:nn] * grids[d].voxel_size
            centers.append(cpad)
        grad_sup = HB.support_indices(grids, caps,
                                      np.concatenate(centers, 0))
        pres.append(P.Precomputed(
            enc_svh=enc_svh, unet_tables=tables, point_splat_idx=sup[0],
            pos_sup_idx=tuple(jnp.asarray(s) for s in sup),
            grad_sup_idx=tuple(jnp.asarray(s) for s in grad_sup)))
        xyzs.append(xp)
        masks.append(mk)
        feats.append(np.asarray(ft))

    # host-side lattice point arrays (slot-sorted order) per chunk
    lats = None
    if plans is not None:
        spec = plans[0].spec
        lats = []
        for plan, sel in zip(plans, sel_list):
            cx = xyz[sel]
            n = cx.shape[0]
            xs = np.zeros((cap_pts, 3), np.float32)
            xs[:n] = cx[plan.pt_perm]
            ms = np.zeros(cap_pts, bool)
            ms[:n] = True
            c0 = np.zeros((cap_pts, 3), np.int32)
            c0[:n] = plan.pt_cell0
            dest = np.full(cap_pts, spec.p_rows * spec.s_pt, np.int32)
            dest[:n] = plan.pt_dest
            lats.append(dict(
                xyz_sorted=xs, mask_sorted=ms, pt_cell0=c0, pt_dest=dest,
                slot_cell_pt=plan.slot_cell_pt,
                slot_cell_gr=plan.slot_cell_gr,
                slot_cell0_pt=plan.slot_cell0_pt,
                slot_cell0_gr=plan.slot_cell0_gr,
                gr_perm=plan.gr_perm,
                phase=plan.phase, gr_coords=plan.gr_coords,
                gr_depth=plan.gr_depth, gr_active=plan.gr_active,
                vox_cell=tuple(plan.vox_cell),
                vox_active=tuple(plan.vox_active)))

    # pad the chunk axis to a multiple of the mesh size (masked-out dupes)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    b = len(xyzs)
    b_pad = -b % n_dev
    for _ in range(b_pad):
        xyzs.append(xyzs[0])
        masks.append(np.zeros_like(masks[0]))
        feats.append(feats[0])
        pres.append(pres[0])
        if lats is not None:
            lats.append(lats[0])
    stack = lambda xs: jax.tree_util.tree_map(
        lambda *l: jnp.stack([jnp.asarray(x) for x in l]), *xs)
    batch = (jnp.asarray(np.stack(xyzs)), jnp.asarray(np.stack(masks)),
             jnp.asarray(np.stack(feats)), stack(pres))

    if lats is not None:
        from ..fields import lattice as LAT
        from ..fields.kernel_field import KernelField
        from ..fields.neural_field import LayerField, NeuralField
        from ..fields import DecoderFn
        from ..fields.support import InterpolatorFn
        from ..models.network import MLP, Interpolators

        def one(p, x, m, f, pre, lat):
            net = cfg.network()
            out, dec_svh, udf_svh = net.apply(
                p, x, f, m, pre.enc_svh, pre.enc_svh, True,
                cfg.capacities, tables=pre.unet_tables,
                point_splat_idx=pre.point_splat_idx)
            interp = InterpolatorFn(
                params={"params": p["params"]["interpolators"]},
                module=Interpolators(depth=cfg.tree_depth,
                                     kernel_dim=cfg.kernel_dim,
                                     n_hidden=cfg.interp_layers,
                                     hidden_dim=cfg.interp_hidden))
            nvals = []
            for d in range(cfg.adaptive_depth):
                nv = out.normal_features[d]
                if cfg.feature == "normal":
                    prior = P.splat_normals_to_grid(
                        dec_svh.grids[d], x, f, m,
                        splat_idx=pre.pos_sup_idx[d])
                    nv = prior + nv
                nvals.append(nv)
            gr_targets = -jnp.concatenate(nvals, 0)
            alphas = LAT.lattice_solve(
                spec, interp, out.basis_features,
                lat["xyz_sorted"], lat["mask_sorted"], lat["pt_cell0"],
                lat["pt_dest"], lat["slot_cell_pt"], lat["slot_cell_gr"],
                lat["gr_coords"], lat["gr_depth"], lat["gr_active"],
                gr_targets, lat["vox_cell"], lat["vox_active"],
                voxel_size=cfg.voxel_size, pos_weight=cfg.pos_weight,
                normal_weight=cfg.normal_weight,
                reg_weight=cfg.reg_weight, tol=cfg.solver_tol,
                max_iters=cfg.solver_max_iters,
                approx_grad=cfg.approx_kernel_grad,
                slot_cell0_pt=lat["slot_cell0_pt"],
                slot_cell0_gr=lat["slot_cell0_gr"],
                gr_perm=lat["gr_perm"],
                phase=lat["phase"],
                compute_dtype=cfg.solver_compute_dtype,
                cascade_engine=_cascade_eng)
            field = KernelField(
                svh=dec_svh, features=out.basis_features, interp=interp,
                alpha=alphas, kernel_dim=cfg.kernel_dim,
                approx_kernel_grad=cfg.approx_kernel_grad)
            if cfg.udf_enabled:
                udf_dec = DecoderFn(
                    params={"params": p["params"]["udf_decoder"]},
                    module=MLP(hidden=(2 * cfg.udf_dim,) * 2, out=1))
                mf = NeuralField(svh=udf_svh, features=out.udf_features,
                                 decoder=udf_dec)
                mf = mf.set_level_set(2.0 * cfg.voxel_size)
            else:
                mf = LayerField(dec_svh, cfg.adaptive_depth)
            return field.set_mask_field(mf)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(PS(), PS("data"), PS("data"), PS("data"),
                      PS("data"), PS("data")),
            out_specs=PS("data"), check_vma=False)
        def shard_fn(p, x, m, f, pre, lat):
            return jax.vmap(
                lambda xi, mi, fi, pi, li: one(p, xi, mi, fi, pi, li))(
                x, m, f, pre, lat)

        fields = shard_fn(recon.network.params, *batch, stack(lats))
    else:
        def one(p, x, m, f, pre):
            out = P.forward(cfg, p, x, m, f, gt_svh=pre.enc_svh,
                            use_gt_structure=True, pre=pre)
            return out.field

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(PS(), PS("data"), PS("data"), PS("data"),
                      PS("data")),
            out_specs=PS("data"), check_vma=False)
        def shard_fn(p, x, m, f, pre):
            return jax.vmap(
                lambda xi, mi, fi, pi: one(p, xi, mi, fi, pi))(
                x, m, f, pre)

        fields = shard_fn(recon.network.params, *batch)

    chunks = []
    take = lambda tree, i: jax.tree_util.tree_map(lambda a: a[i], tree)
    for i, cid in enumerate(cids):
        hf = HostField(jax.device_put(take(fields, i)), cfg,
                       grids_list[i], caps, cfg.adaptive_depth)
        c_lo = lo + cid * chunk_size
        chunks.append({"cid": cid, "lo": c_lo,
                       "hi": c_lo + chunk_size, "field": hf})
    return ChunkedField(chunks, chunk_size, vs, origin=lo,
                        id_lo=uniq.min(0), id_hi=uniq.max(0))


def halo_exchange_1d(mesh: Mesh, axis: str, values: jnp.ndarray,
                     halo: int):
    """Exchange 1-D slab halos between mesh neighbors with ppermute.

    ``values``: per-device slab (inside shard_map), shape (L, ...).
    Returns (left_halo, right_halo) received from the neighbors — the
    primitive the future sharded-SVH solve builds on.
    """
    n = jax.lax.axis_size(axis)
    # perm (i -> i+1): device d receives the LAST rows of neighbor d-1,
    # i.e. its left halo; perm (i -> i-1) symmetric for the right halo.
    left = jax.lax.ppermute(values[-halo:], axis,
                            [(i, (i + 1) % n) for i in range(n)])
    right = jax.lax.ppermute(values[:halo], axis,
                             [(i, (i - 1) % n) for i in range(n)])
    return right, left
