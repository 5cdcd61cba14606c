"""Dense-lattice dual marching cubes: the topology half on DEVICE.

The host mesher (meshing/host_mc.py) extracts topology with sorted-key
joins (corner merges, stencil joins, 27-child MISE expansion) — measured
~30-55 s of single-core host time at 1M-point bench scale even after the
native k-way merges.  For fields solved on the dense lattice
(fields/lattice.py + fields/lattice_eval.py) none of that is necessary:
on a dense fine grid every structure op is a SHIFT —

  * candidate cells   = upsampled trust shell, dilated one ring;
  * corner values     = one compacted field-evaluation wave scattered
                        into a dense corner buffer (missing corners read
                        the sealed default -s, exactly the host path's
                        neg_default);
  * crossing cells    = 8 shifted sign reads;
  * dual vertices     = edge-crossing means at compacted crossing cells;
  * quads             = sign changes along +x/+y/+z corner edges whose 4
                        surrounding cells all cross; vertex ids come from
                        a dense rank (cumsum) buffer.

Device work is a few streaming passes over the fine grid plus the same
field-evaluation wave the host path needs; host work drops to reshaping
the returned vertex/quad arrays.  Equivalence with the host mesher is
pinned by tests/test_meshing.py::test_dense_matches_host.

Reference contract: ``field.extract_dual_mesh(mise_iter, grid_upsample)``
(/root/reference/NKSR-USAGE.md:77, models/nksr_net.py:214,284).
``mise_iter`` rounds multiply the extraction resolution by 2 (the
hierarchical-MISE semantics); on the dense path the candidate shell is
already tight, so refinement is direct rather than round-by-round.
Falls back to the host mesher when the fine grid exceeds the dense
budget.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.compaction import compact_ids
from .dual_mc import TriangleMesh

# cells around an a-axis corner edge, in quad winding order
# (= host_mc._QUAD_VOX_OFFS; cells are corner - off)
_QUAD_VOX_OFFS = np.array([
    [[0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1]],   # x-edge
    [[0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0]],   # y-edge
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],   # z-edge
], dtype=np.int64)

_CORNER_OFFS = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                        -1).reshape(8, 3)
_EDGES = np.array([[a, b] for a in range(8) for b in range(a + 1, 8)
                   if bin(a ^ b).count("1") == 1], np.int64)

DENSE_CELL_BUDGET = 140_000_000


def _shift(a: jnp.ndarray, d: Tuple[int, int, int], fill):
    """Static shift with fill: out[i] = a[i + d] (reads beyond -> fill)."""
    out = a
    for ax, s in enumerate(d):
        if s == 0:
            continue
        n = out.shape[ax]
        pad = [(0, 0)] * out.ndim
        if s > 0:
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(s, None)
            pad[ax] = (0, s)
        else:
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(0, n + s)
            pad[ax] = (-s, 0)
        out = jnp.pad(out[tuple(sl)], pad, constant_values=fill)
    return out


def _next_cap(n: int, lo: int = 4096) -> int:
    n = max(int(n), lo)
    k = int(np.ceil(np.log2(n)))
    c15 = 3 << (k - 2)
    return c15 if c15 >= n else 1 << k


@functools.lru_cache(maxsize=16)
def _candidate_fn(spec, f: int, cell_x_max: Optional[int] = None,
                  cell_x_min: int = 0):
    """jit 1: candidate-cell mask + corner count (dense shifts only).

    ``cell_x_min``/``cell_x_max``: keep only candidate cells with local
    fine x in [cell_x_min, cell_x_max] (sharded meshing: a slab
    enumerates the cells whose every input is locally exact — its own
    extent shifted one plane right of the slab start, plus the +1
    duplicate plane; planes beyond exist only to supply exact values —
    parallel/mesh_shard.py)."""
    X, Y, Z = spec.dims[0]

    def fn(mask0):
        shell = (mask0 > 0).reshape(X, Y, Z)
        m = jnp.repeat(jnp.repeat(jnp.repeat(shell, f, 0), f, 1), f, 2)
        # one-ring dilation so rim quads stay sealed (host path analog);
        # the 27-neighborhood box dilation is separable: +-1 along each
        # axis in sequence (6 shifted ORs instead of 26)
        dil = m
        for ax in range(3):
            d_pos = [0, 0, 0]
            d_pos[ax] = 1
            d_neg = [0, 0, 0]
            d_neg[ax] = -1
            dil = dil | _shift(dil, tuple(d_pos), False) \
                | _shift(dil, tuple(d_neg), False)
        if cell_x_max is not None or cell_x_min:
            ax = jnp.arange(X * f)
            keep = ax >= cell_x_min
            if cell_x_max is not None:
                keep = keep & (ax <= cell_x_max)
            dil = dil & keep[:, None, None]
        # corner grid ((Xf+1)^3): corner c is used by cells c-offs
        cg = jnp.zeros((X * f + 1, Y * f + 1, Z * f + 1), bool)
        cg = cg.at[:-1, :-1, :-1].set(dil)
        corner = cg
        for o in _CORNER_OFFS[1:]:
            corner = corner | _shift(cg, tuple(-int(v) for v in o), False)
        return dil, corner, jnp.sum(corner)
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _corner_eval_fn(spec, f: int, cap_c: int, voxel_size: float,
                    compute_dtype: str, approx_grad: bool,
                    chunk: int = 1 << 18):
    """jit 2: compact candidate corners, evaluate f_bar there, scatter
    into the dense corner-value buffer (default -s everywhere else)."""
    from ..fields.lattice_eval import _eval_fn
    X, Y, Z = spec.dims[0]
    Xc, Yc, Zc = X * f + 1, Y * f + 1, Z * f + 1
    s_f = voxel_size / f

    def fn(interp_params, tables, origins, corner_mask):
        flat = corner_mask.reshape(-1)
        ids = compact_ids(flat, cap_c)
        # corner world position: fine lattice shares the depth-0 frame
        # scaled by f; local corner index -> world fine coord -> world
        cw = jnp.stack([ids // (Yc * Zc), (ids // Zc) % Yc, ids % Zc], -1)
        cw = cw + origins[0][None, :] * f
        pos = (cw.astype(jnp.float32) - 0.5) * s_f
        ev = _eval_fn(spec, voxel_size, False, approx_grad, cap_c,
                      chunk=chunk)
        # _eval_fn is a jit; calling inside jit just inlines the graph
        val, mask = ev(interp_params, tables, origins, pos)
        fbar = jnp.where(mask, val, -voxel_size).astype(jnp.float32)
        v_dense = jnp.full((Xc * Yc * Zc,), -abs(s_f), jnp.float32)
        n_live = jnp.sum(flat.astype(jnp.int32))
        live = jnp.arange(cap_c) < n_live
        v_dense = v_dense.at[jnp.where(live, ids, Xc * Yc * Zc)].set(
            jnp.where(live, fbar, 0.0), mode="drop")
        return v_dense.reshape(Xc, Yc, Zc)
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _topology_fn(spec, f: int, cap_v: int, cap_q: int, voxel_size: float,
                 quad_x_min: int = 0):
    """jit 3: crossing cells, dual vertices, quad lists — dense shifts +
    compactions, no joins.

    ``quad_x_min``: restrict QUAD bases to local fine x >= quad_x_min
    (sharded meshing: a quad's BASE is the max of its 4 cells — cells
    sit at base MINUS the offsets — so a slab owns quads based in its
    own extent and the -1 duplicate vertex plane resolves cross-seam
    references — parallel/mesh_shard.py)."""
    X, Y, Z = spec.dims[0]
    Xf, Yf, Zf = X * f, Y * f, Z * f
    s_f = voxel_size / f
    offs = _CORNER_OFFS
    ea, eb = _EDGES[:, 0], _EDGES[:, 1]

    def fn(v_dense, cand, origins):
        S = v_dense > 0
        # per-cell corner-sign aggregation via 8 shifted reads
        any_pos = jnp.zeros((Xf, Yf, Zf), bool)
        all_pos = jnp.ones((Xf, Yf, Zf), bool)
        for o in offs:
            so = S[int(o[0]):, int(o[1]):, int(o[2]):][:Xf, :Yf, :Zf]
            any_pos = any_pos | so
            all_pos = all_pos & so
        cross = any_pos & ~all_pos & cand
        flatc = cross.reshape(-1)
        n_verts = jnp.sum(flatc.astype(jnp.int32))

        # compacted crossing-cell ids
        cid = compact_ids(flatc, cap_v)
        cc = jnp.stack([cid // (Yf * Zf), (cid // Zf) % Yf, cid % Zf], -1)

        # 8 corner values per compacted cell: dense shifted stack + ONE
        # 8-lane row gather (8 scalar-row gathers paid ~22 ns/row each)
        fv_dense = jnp.stack(
            [v_dense[int(o[0]):int(o[0]) + Xf, int(o[1]):int(o[1]) + Yf,
                     int(o[2]):int(o[2]) + Zf] for o in offs],
            -1).reshape(-1, 8)
        fv = jnp.take(fv_dense, cid, axis=0)                # (cap_v, 8)

        cw = cc + origins[0][None, :] * f                   # world cell
        corner_w = (cw[:, None, :] + offs[None]).astype(jnp.float32)
        corner_pos = (corner_w - 0.5) * s_f
        fa, fb = fv[:, ea], fv[:, eb]
        ecross = (fa > 0) != (fb > 0)
        t = fa / (fa - fb + 1e-20)
        pa = corner_pos[:, ea]
        pb = corner_pos[:, eb]
        pc = pa + t[..., None] * (pb - pa)
        w = ecross.astype(jnp.float32)
        wsum = jnp.sum(w, 1, keepdims=True)
        centers = cw.astype(jnp.float32) * s_f
        verts = jnp.where(wsum > 0,
                          jnp.sum(pc * w[..., None], 1)
                          / jnp.maximum(wsum, 1e-20), centers)
        vcenters = centers

        # quads: sign change along +a corner edges with all 4 cells
        # crossing.  Every quad's BASE corner equals a crossing cell's
        # min corner (offset row 0 of _QUAD_VOX_OFFS is (0,0,0) for all
        # three axes), so candidates are enumerated over the COMPACTED
        # crossing cells (cap_v rows).  Everything a quad test needs —
        # crossing bit, 1-based vertex rank, and the signs of the base
        # corner and its three +axis corner neighbors — is PACKED into
        # one int32 per cell; a dense 7-offset shifted stack then lets
        # ONE (cap_v, 7) row gather replace the former ~25 scalar-row
        # gathers (measured ~0.8 s of the 1.1 s topology jit at the
        # 1M-point bench: scalar gathers pay ~22 ns/row regardless of
        # row bytes).  Quad order is unchanged (crossing cells enumerate
        # ascending flat ids).
        csum = jnp.cumsum(flatc.astype(jnp.int32))       # rank + 1
        i32 = jnp.int32
        s0 = S[:Xf, :Yf, :Zf].astype(i32)
        sx = S[1:Xf + 1, :Yf, :Zf].astype(i32)
        sy = S[:Xf, 1:Yf + 1, :Zf].astype(i32)
        sz = S[:Xf, :Yf, 1:Zf + 1].astype(i32)
        key = (csum.reshape(Xf, Yf, Zf) << 5) \
            | (cross.astype(i32) << 4) \
            | s0 | (sx << 1) | (sy << 2) | (sz << 3)
        # union of the 12 quad-cell offsets over the 3 axes: 7 distinct
        offs7 = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                          [1, 0, 0], [1, 0, 1], [1, 1, 0]], np.int64)
        lane_of = {tuple(int(v) for v in o): i
                   for i, o in enumerate(offs7)}
        nbr = jnp.stack(
            [_shift(key, tuple(-int(v) for v in o), 0) for o in offs7],
            -1).reshape(-1, 7)
        rows = jnp.take(nbr, cid, axis=0)                # (cap_v, 7)

        quads, flips, nqs = [], [], []
        live_v = jnp.arange(cap_v) < n_verts
        base = rows[:, 0]
        s_base = (base & 1).astype(bool)
        for a in range(3):
            sa = ((base >> (a + 1)) & 1).astype(bool)
            lanes4 = [lane_of[tuple(int(v) for v in off)]
                      for off in _QUAD_VOX_OFFS[a]]
            ok4 = live_v & (s_base != sa)
            if quad_x_min:
                ok4 = ok4 & (cc[:, 0] >= quad_x_min)
            for ln in lanes4:
                ok4 = ok4 & ((rows[:, ln] >> 4) & 1).astype(bool)
            nq = jnp.sum(ok4.astype(jnp.int32))
            qid = compact_ids(ok4, cap_q)                # over cap_v rows
            liveq = jnp.arange(cap_q) < nq
            qrows = jnp.take(rows, qid, axis=0)          # (cap_q, 7)
            vids = jnp.stack(
                [(qrows[:, ln] >> 5) - 1 for ln in lanes4], -1)
            flip = ~(qrows[:, 0] & 1).astype(bool)
            quads.append(jnp.where(liveq[:, None], vids, -1))
            flips.append(flip & liveq)
            nqs.append(nq)
        return (verts, vcenters, n_verts, jnp.stack(quads),
                jnp.stack(flips), jnp.stack(nqs), cc)
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _newton_fn(spec, f: int, cap_n: int, voxel_size: float,
               compute_dtype: str, approx_grad: bool, chunk: int = 1 << 17):
    """jit 4: one Newton step toward the zero set, ON DEVICE.

    The former host version fetched verts+centers (~22 MB), re-uploaded
    the verts for the gradient wave, and fetched value+gradient back
    (~14 MB) — ~1 s of pure transfer at the measured ~40 MB/s
    device->host tunnel bandwidth.  Here the topology jit's outputs stay
    in HBM and only the final verts cross the link once."""
    from ..fields.lattice_eval import _eval_fn
    s_f = voxel_size / f

    def fn(interp_params, tables, origins, verts, centers):
        ev = _eval_fn(spec, voxel_size, True, approx_grad, cap_n,
                      chunk=chunk)
        val, _, g = ev(interp_params, tables, origins, verts)
        step = val[:, None] * g / (jnp.sum(g * g, 1, keepdims=True)
                                   + 1e-12)
        out = verts - jnp.clip(step, -0.5 * s_f, 0.5 * s_f)
        return jnp.clip(out, centers - 0.5 * s_f, centers + 0.5 * s_f)
    return jax.jit(fn)


def extract_dual_mesh_dense(hf, mise_iter: int = 0, grid_upsample: int = 1,
                            texture=None,
                            max_points: Optional[int] = None
                            ) -> Optional[TriangleMesh]:
    """Dense-lattice extraction; returns None when inapplicable (no
    lattice context / fine grid over budget) so callers fall back.

    ``max_points``: memory knob from the reference signature
    (extract_dual_mesh(mise_iter, grid_upsample, max_points),
    /root/reference/examples/recons_colored_mesh.py:30) — bounds each
    device field-evaluation wave to at most this many query points."""
    ctx = getattr(hf, "lattice_ctx", None)
    if ctx is None:
        return None
    # UDF mask head (cfg.udf_enabled models, reference
    # nksr_net.py:116-130): the host path SEALS the mesh at the mask
    # boundary (out-of-mask corners read -voxel_size, creating crossings
    # there); here the mask TRIMS instead — faces with any dual vertex
    # outside ``level_set - udf(v) > 0`` are dropped after extraction
    # (one ~1 s vertex wave at 1M-point scale vs ~2-4 s of host support
    # joins for a 6M-corner seal).  Open rims at the trim boundary are
    # the documented delta vs the host mesher (PARITY.md).
    mf = getattr(hf.field, "mask_field", None)
    has_udf_mask = getattr(hf, "udf_host", None) is not None \
        and mf is not None and hasattr(mf, "level_set")
    spec = ctx.spec
    f = max(int(grid_upsample), 1) * (2 ** max(int(mise_iter), 0))
    X, Y, Z = spec.dims[0]
    if X * Y * Z * f ** 3 > DENSE_CELL_BUDGET:
        return None

    from ..recon.host_predicted import _Timer
    tm = _Timer()
    tables = ctx.tables()
    origins = jnp.asarray(ctx.origins.astype(np.int32))

    cand, corner_mask, n_c = _candidate_fn(spec, f)(tables.shell0)
    cap_c = _next_cap(int(n_c))
    tm.lap(f"dmc: candidates ({int(n_c)} corners)")

    chunk = 1 << 18
    if max_points is not None:
        c = 1 << max(int(np.log2(max(int(max_points), 1))), 0)
        while cap_c % c:
            c >>= 1
        chunk = max(min(chunk, c), 1)
    v_dense = _corner_eval_fn(spec, f, cap_c, ctx.voxel_size,
                              ctx.compute_dtype, ctx.approx_grad,
                              chunk=chunk)(
        ctx.interp_params, tables, origins, corner_mask)
    tm.lap("dmc: corner eval")

    # crossing count for capacity planning (cheap dense reduction)
    cap_v = _next_cap(cap_c // 4)
    cap_q = _next_cap(cap_c // 4)
    verts, centers, n_verts, quads, flips, nqs, _ = _topology_fn(
        spec, f, cap_v, cap_q, ctx.voxel_size)(v_dense, cand, origins)
    nv = int(n_verts)
    nqs = np.asarray(nqs)
    if nv > cap_v or int(nqs.max()) > cap_q:
        cap_q = _next_cap(max(4 * nv, int(nqs.max())))
        verts, centers, n_verts, quads, flips, nqs, _ = _topology_fn(
            spec, f, _next_cap(nv), cap_q,
            ctx.voxel_size)(v_dense, cand, origins)
        nv = int(n_verts)
        nqs = np.asarray(nqs)
    # device-slice to the live counts BEFORE fetching: the full
    # capacity-sized buffers would cross the device->host link.  The
    # fetch happens HERE, before the newton dispatch: device->host
    # transfers that overlap running compute collapse to a few MB/s on
    # this tunneled platform (a fetch-after-newton-dispatch variant
    # measured 7-8 s for these ~25 MB vs ~0.7 s idle)
    quads = [np.asarray(quads[a, :int(nqs[a])]) for a in range(3)]
    flips = [np.asarray(flips[a, :int(nqs[a])]) for a in range(3)]
    tm.lap(f"dmc: topology ({nv} verts)")

    # ---- newton polish toward the zero set (as the host path does when
    # refining; one gradient wave through the shared evaluator), clipped
    # to the dual cell box exactly like host_mc — ON DEVICE: only the
    # polished verts cross the device->host link (see _newton_fn)
    if mise_iter > 0 and nv:
        from ..fields.lattice_eval import _bucket_cap
        cap_n = _bucket_cap(nv)
        vv, cc = verts, centers
        if cap_n <= vv.shape[0]:
            vv, cc = vv[:cap_n], cc[:cap_n]
        else:
            pad = ((0, cap_n - vv.shape[0]), (0, 0))
            vv, cc = jnp.pad(vv, pad), jnp.pad(cc, pad)
        chunk = 1 << 17
        if max_points is not None:
            c = 1 << max(int(np.log2(max(int(max_points), 1))), 0)
            while cap_n % c:
                c >>= 1
            chunk = max(min(chunk, c), 1)
        verts = _newton_fn(spec, f, cap_n, ctx.voxel_size,
                           ctx.compute_dtype, ctx.approx_grad,
                           chunk=chunk)(
            ctx.interp_params, tables, origins, vv, cc)
    verts = np.asarray(verts[:nv])
    tm.lap("dmc: newton")

    if has_udf_mask and nv:
        from ..core import host_build as HB
        from ..fields.lattice_eval import _bucket_cap
        from ..recon.host_field import _udf_mask_fn
        cap_m = _bucket_cap(nv)       # bucketed shape: compiles reused
        vp = np.zeros((cap_m, 3), np.float32)
        vp[:nv] = verts
        sup = HB.support_indices(hf.udf_host, hf.udf_caps, vp)
        mv = np.asarray(_udf_mask_fn(hf.cfg)(
            mf, jnp.asarray(vp),
            tuple(jnp.asarray(s) for s in sup)))[:nv] > 0
        kept_q, kept_f = [], []
        for q, fl in zip(quads, flips):
            keep = (q >= 0).all(1) & mv[np.clip(q, 0, nv - 1)].all(1)
            kept_q.append(q[keep])
            kept_f.append(fl[keep])
        quads, flips = kept_q, kept_f
        tm.lap("dmc: udf mask trim")

    tris = []
    for a in range(3):
        q, fl = quads[a], flips[a]          # already sliced to live rows
        q = np.where(fl[:, None], q[:, ::-1], q)
        tris.append(q[:, [0, 1, 2]])
        tris.append(q[:, [0, 2, 3]])
    fcs = np.concatenate(tris, 0).astype(np.int32) if tris else \
        np.zeros((0, 3), np.int32)

    # drop unreferenced vertices (crossing cells without quads) —
    # linear-time mask+prefix-sum remap (np.unique's sort was ~1 s of
    # host time at 1M-vertex scale)
    if len(fcs):
        used = np.zeros(len(verts), bool)
        used[fcs.reshape(-1)] = True
        remap = np.cumsum(used, dtype=np.int64) - 1
        verts = verts[used]
        fcs = remap[fcs].astype(np.int32)
    else:
        verts = verts[:0]

    colors = None
    tex = texture if texture is not None else \
        getattr(hf.field, "texture_field", None)
    if tex is not None and len(verts):
        colors = np.asarray(tex.evaluate_f(jnp.asarray(verts)).value)
    tm.lap("dmc: assemble")
    return TriangleMesh(v=np.asarray(verts, np.float32), f=fcs, c=colors)
