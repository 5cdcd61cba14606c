"""Dense-lattice kernel solve: the MXU/VPU-native formulation of the
gradient-fitting least-squares fit behind ``KernelField.solve_non_fused``
(reference contract /root/reference/models/nksr_net.py:90-112).

Why this exists (measured on the real TPU v5e in this sandbox):

  * The sparse matrix-free matvec (fields/support.py) costs ~1.2 s per CG
    iteration at bench scale — it is bound by *random row gathers/scatters*
    (~12-60 ns per gathered row on TPU, independent of row width), doing
    ~50 M of them per iteration.
  * TPUs are fast at exactly two things: dense streaming (shifts, cumsum,
    elementwise) and matmuls.  This module reformulates the solve so every
    CG iteration is dense streaming + batched contractions:

      - coefficients live on a *dense voxel lattice* per depth (flat 1-D
        buffers — 1-D tiles without lane padding), valid per chunk/crop;
      - the 8-corner "support evaluation" becomes 8 STATIC flat-buffer
        shifts (the corner offsets are constant strides in a dense
        lattice) — zero gathers;
      - solve rows are blocked by their finest cell into fixed-width
        slots: per slot a (rows, 128) basis block B covering all depths
        (4 depths x 8 corners x K), so the per-row work is two batched
        einsums over contiguous memory;
      - the only per-iteration random accesses are ONE sorted 128-lane
        row gather and ONE sorted 128-lane row scatter-add per slot
        family, against a fused depth-0-resolution support buffer (AV0)
        built/consumed by static zero-phase upsample/downsample cascades
        (_up2/_down2);
      - the corner expansion (flat coefficients -> per-cell 8-corner
        lanes) and its adjoint are ONE-HOT PERMUTATION MATMULS over
        128-lane packed buffers (_place_level/_strip_level_adj): the
        lane shuffle runs on the MXU instead of as layout copies, and no
        in-loop tensor is narrower than its tile.

    Measured on the chip (2026-08-17): 128-lane row gathers cost 17 ns/row
    and 128-lane sorted scatter-adds 23 ns/row, vs 35/134 ns/row for the
    32-lane per-depth forms — which is why the matvec is fused at depth-0
    resolution rather than per depth.  Layout rules the code is shaped
    around: (N, v) values for v << 128 tile-pad HBM up to 32x, and inside
    the CG while-loop XLA's remat/compression pass MATERIALIZES such
    values even when they would fuse in isolation (measured compile-time
    OOMs 38.5G and 22G against 15.75G from exactly that).  Hence the
    packed-buffer + permutation-matmul formulation: CG state is flat
    coefficient bytes viewed as (len/128, 128), and every in-loop op is
    a row-slice, row-merge reshape, 128-lane stream, MXU contraction, or
    sorted gather/scatter.

The lattice is exact integer geometry: a point's support cell at depth d
is ``floor(x / vs_d)`` and deeper cells are nested prefixes
(``cell_d = cell_0 >> d``), so corner determination never depends on
float rounding (the sparse path's float-floor wobble cannot happen here).

Assembly (one-time per solve) computes the same windowed learned basis as
fields/support.py: ``raw(x_loc, F_corner) * window(x_loc)`` with the C1
bump window — numerically identical math, validated against the sparse
solve in tests/test_lattice.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------- spec
@dataclasses.dataclass(frozen=True)
class LatticeSpec:
    """Static description of the dense solve (hashable: keys jit caches).

    ``dims[d] = (X, Y, Zp)``: dense cell counts per depth (Zp includes the
    +2 corner margin).  ``n_cells[d] = X*Y*Zp``.  Slot layout: ``s_pt``
    point slots of ``p_rows`` rows each, ``s_gr`` gradient slots (3
    component rows each, one slot per decoder voxel of the adaptive
    depths).
    """
    dims: Tuple[Tuple[int, int, int], ...]
    k: int
    depth: int
    adaptive_depth: int
    s_pt: int
    p_rows: int
    s_gr: int
    n_pts_cap: int

    @property
    def lanes(self) -> int:
        return self.depth * 8 * self.k

    def n_cells(self, d: int) -> int:
        x, y, z = self.dims[d]
        return x * y * z

    def corner_strides(self, d: int) -> Tuple[int, ...]:
        """Flat-index deltas of the 8 cell corners (static slice starts)."""
        _, y, z = self.dims[d]
        return tuple((dx * y + dy) * z + dz
                     for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))


class LatticePlan(NamedTuple):
    """Host-built integer tables driving the device solve (numpy)."""
    spec: LatticeSpec
    origins: np.ndarray       # (depth, 3) int32 lattice origin per depth
    phase: np.ndarray         # (depth, 3) int32: o0 - (o_d << d) per axis —
    #                           the sub-cell offset that aligns each coarse
    #                           lattice with the depth-0 frame (fused AV0)
    # points (in slot-sorted order):
    pt_perm: np.ndarray       # (n,) original index of each sorted point
    pt_dest: np.ndarray       # (n,) row destination in (p_rows * s_pt)
    pt_cell0: np.ndarray      # (n, 3) int32 depth-0 cell of each point
    slot_cell_pt: np.ndarray  # (depth, s_pt) flat dense cell per depth (-1 pad -> 0)
    slot_cell0_pt: np.ndarray  # (s_pt,) flat DEPTH-0 cell per slot, sorted
    # grad slots (one per decoder voxel of depths < adaptive_depth,
    # cap-padded, in hierarchy row order):
    gr_coords: np.ndarray     # (s_gr, 3) voxel coord at its own depth
    gr_depth: np.ndarray      # (s_gr,) own depth of each voxel
    gr_active: np.ndarray     # (s_gr,) bool
    slot_cell_gr: np.ndarray  # (depth, s_gr) flat dense cell per depth
    slot_cell0_gr: np.ndarray  # (s_gr,) flat depth-0 cell per grad slot, sorted
    gr_perm: np.ndarray       # (s_gr,) hierarchy-order index of each slot
    #                           (device realigns gradient targets with it)
    # per-depth voxel -> dense cell maps (cap-padded, pad -> 0):
    vox_cell: Tuple[np.ndarray, ...]   # (cap_d,) flat dense cell ids
    vox_active: Tuple[np.ndarray, ...]


def _next_pow2(n: int) -> int:
    import math
    return 1 << max(6, int(np.ceil(np.log2(max(n, 1)))))


def plan_lattice(grids, caps: Sequence[int], xyz: np.ndarray,
                 sorted_base0: np.ndarray, order0: np.ndarray,
                 voxel_size: float, depth: int, adaptive_depth: int,
                 k: int = 4, p_rows: int = 4,
                 dec_grids=None, dec_caps=None,
                 force_dims=None, force_s_pt: Optional[int] = None,
                 force_cap: Optional[int] = None) -> Optional[LatticePlan]:
    """Build the lattice plan on the host (pure integer numpy, no joins).

    ``grids``/``caps``: decoder hierarchy (host_build.HostGrid).
    ``sorted_base0``/``order0``: depth-0 point base keys sorted + argsort
    (from host_build.build_splat_grids_ex — reused, no extra sort).
    ``force_dims``/``force_s_pt``/``force_cap``: override the derived
    per-depth dims / point-slot count / point capacity so a BATCH of
    plans (e.g. the chunks of a sharded reconstruction) shares one
    LatticeSpec and can be stacked + vmapped.
    Returns None when the dense bbox is too large (caller falls back to
    the sparse path / chunk mode), or when a forced size is exceeded.
    """
    from ..core.host_build import unpack64

    if dec_grids is None:
        dec_grids, dec_caps = grids, caps
    n = xyz.shape[0]
    # bbox per depth from the DECODER grid coords (voxel corner set).
    # Margin 2 on both sides so local cell 0 can never touch an active
    # voxel: out-of-bbox queries alias to cell 0 and read zero basis —
    # exactly the sparse path's idx==-1 masking.
    from ..native import coord_minmax

    def _cminmax(c):
        mm = coord_minmax(c)
        if mm is not None:
            return mm[0].astype(np.int64), mm[1].astype(np.int64)
        return c.min(0).astype(np.int64), c.max(0).astype(np.int64)

    lo_t, hi_t = [], []
    for d in range(depth):
        c = dec_grids[d].coords
        if len(c) == 0:
            lo_t.append(np.zeros(3, np.int64))
            hi_t.append(np.ones(3, np.int64))
        else:
            mn, mx = _cminmax(c)
            lo_t.append(mn - 2)
            hi_t.append(mx + 2)
    # The depth-0 FRAME must contain every fused-gather address (AV0 is
    # indexed at depth-0 resolution): all point depth-0 cells and every
    # grad slot's (c_dd << dd).  With a pruned decoder depth 0 (adaptive
    # hierarchies) those extend beyond the depth-0 voxel bbox.
    cand_lo = [lo_t[0] + 2]
    cand_hi = [hi_t[0] - 2]
    sb_all = sorted_base0
    if n and len(sb_all):
        # sorted keys: componentwise x-bounds are free (ends of the
        # sorted order); y/z still need a pass
        c0_all = unpack64(sb_all)
        mn, mx = _cminmax(c0_all)
        cand_lo.append(mn)
        cand_hi.append(mx)
    for dd in range(adaptive_depth):
        c = dec_grids[dd].coords
        if len(c):
            mn, mx = _cminmax(c)
            cand_lo.append(mn * (1 << dd))
            cand_hi.append(mx * (1 << dd))
    lo_t[0] = np.minimum.reduce(cand_lo) - 2
    hi_t[0] = np.maximum.reduce(cand_hi) + 2
    # ZERO-PHASE nesting: pick o0 so that o_d = o0 >> d simultaneously
    # (a) stays <= every level's lo_t (margin preserved) and (b) is exactly
    # divisible down the chain (o0 multiple of 2^(depth-1)).  Every
    # upsample/downsample step then has step-phase 0 — the fused AV0
    # cascade (_up2/_down2) becomes a static, vmappable program shared by
    # all chunks of a sharded batch.
    algn = 1 << (depth - 1)
    # o0 >> d <= lo_t[d]  <=>  o0 <= (lo_t[d] << d) + 2^d - 1 — the +2^d-1
    # matters: without it a coarse level's -2 margin would be amplified
    # 2^d-fold into the depth-0 extent
    o0_cand = np.minimum.reduce(
        [(lo_t[d] << d) + (1 << d) - 1 for d in range(depth)])
    o0 = o0_cand & ~np.int64(algn - 1)
    origins, dims, phase, total = [], [], [], 0
    for d in range(depth):
        o = o0 >> d
        if d == 0:
            ext = hi_t[0] - o + 1
        else:
            # cover both this level's active extent and the upsample
            # window of the finer level (step phase 0: ceil(ext_f / 2))
            need_up = (np.asarray(dims[d - 1], np.int64) + 1) >> 1
            ext = np.maximum(hi_t[d] - o + 1, need_up)
        # round dims up to multiples of 8: the LatticeSpec keys the jit
        # cache, so bucketed dims let same-size scenes (bench reps, chunk
        # grids) reuse compiles; extra cells are inactive and read zeros
        ext = (ext + 7) // 8 * 8
        if force_dims is not None:
            if (ext > np.asarray(force_dims[d])).any():
                return None
            ext = np.asarray(force_dims[d], np.int64)
        origins.append(o)
        phase.append(origins[0] - o * (1 << d))
        dims.append((int(ext[0]), int(ext[1]), int(ext[2])))
        total += int(ext[0] * ext[1] * ext[2])
    if total * k > 160_000_000:     # dense coefficient budget (~2.5 GB f32)
        return None

    # ---- point slots: group sorted points by depth-0 cell ----------------
    sb, order = sorted_base0, order0
    if n:
        first = np.concatenate([[True], sb[1:] != sb[:-1]])
        cell_rank = np.cumsum(first) - 1                  # cell id per sorted pt
        pos_in_cell = np.arange(n) - np.maximum.accumulate(
            np.where(first, np.arange(n), 0))
    else:
        first = np.zeros(0, bool)
        cell_rank = np.zeros(0, np.int64)
        pos_in_cell = np.zeros(0, np.int64)
    sub_slot = pos_in_cell // p_rows                      # spill slot index
    row_in_slot = pos_in_cell % p_rows
    # slot id = rank over (cell_rank, sub_slot) pairs — both sorted
    pair_first = np.concatenate([[True], (cell_rank[1:] != cell_rank[:-1])
                                 | (sub_slot[1:] != sub_slot[:-1])]) \
        if n else np.zeros(0, bool)
    slot_of_pt = np.cumsum(pair_first) - 1 if n else np.zeros(0, np.int64)
    n_slots = int(slot_of_pt[-1]) + 1 if n else 0
    s_pt = _next_pow2(n_slots) if force_s_pt is None else force_s_pt
    if n_slots > s_pt:
        return None

    cell0_sorted = c0_all if n and len(sb_all) else \
        unpack64(sb).astype(np.int64)                     # (n, 3) int
    slot_cell0 = cell0_sorted[pair_first] if n else np.zeros((0, 3), np.int64)

    from ..native import flat_cells

    def flat_cell(cd: np.ndarray, d: int) -> np.ndarray:
        """Map coordinates ALREADY at depth d into the depth-d lattice
        (one fused native pass: shift/subtract/bounds/index)."""
        return flat_cells(cd, 0, origins[d], dims[d])

    slot_cell_pt = np.zeros((depth, s_pt), np.int32)
    for d in range(depth):
        flat_cells(slot_cell0, -d, origins[d], dims[d],
                   out=slot_cell_pt[d, :n_slots])
    # fused depth-0 slot cells (sorted by construction: slots enumerate
    # the sorted point keys).  Pad slots repeat the last cell so the
    # sortedness hint stays valid; their rows are zero.
    slot_cell0_pt = np.zeros(s_pt, np.int32)
    if n_slots:
        flat_cells(slot_cell0, 0, origins[0], dims[0],
                   out=slot_cell0_pt[:n_slots])
        slot_cell0_pt[n_slots:] = slot_cell0_pt[n_slots - 1]

    pt_dest = (row_in_slot * s_pt + slot_of_pt).astype(np.int32)

    # ---- gradient slots: decoder voxels of the adaptive depths ----------
    gr_parts, grd_parts, gra_parts = [], [], []
    for dd in range(adaptive_depth):
        cap = dec_caps[dd]
        nn = min(len(dec_grids[dd].keys), cap)
        c = np.zeros((cap, 3), np.int64)
        c[:nn] = dec_grids[dd].coords[:nn]
        gr_parts.append(c)
        grd_parts.append(np.full(cap, dd, np.int32))
        a = np.zeros(cap, bool)
        a[:nn] = True
        gra_parts.append(a)
    gr_coords = np.concatenate(gr_parts, 0) if gr_parts else \
        np.zeros((0, 3), np.int64)
    gr_depth = np.concatenate(grd_parts, 0) if grd_parts else \
        np.zeros(0, np.int32)
    gr_active = np.concatenate(gra_parts, 0) if gra_parts else \
        np.zeros(0, bool)
    s_gr = len(gr_coords)

    # grad slots are concatenated per source depth dd, so each dd is a
    # contiguous range — the per-depth shifts run as strided native
    # passes with no masked gathers or temporaries
    gr_offs = np.cumsum([0] + [dec_caps[dd]
                               for dd in range(adaptive_depth)])
    slot_cell_gr = np.zeros((depth, max(s_gr, 1)), np.int32)
    for d in range(depth):
        # support cell of a depth-dd voxel center at depth d:
        # floor(c * 2^dd / 2^d) = c << (dd-d)  |  c >> (d-dd)
        for dd in range(adaptive_depth):
            lo, hi = int(gr_offs[dd]), int(gr_offs[dd + 1])
            flat_cells(gr_coords[lo:hi], dd - d, origins[d], dims[d],
                       out=slot_cell_gr[d, lo:hi])
    slot_cell_gr = slot_cell_gr[:, :s_gr] if s_gr else \
        np.zeros((depth, 0), np.int32)
    # fused depth-0 cell of each grad slot: a depth-dd voxel's support
    # cell at depth d is ((c_dd << dd) >> d) for every d, so indexing the
    # AV0 buffer at (c_dd << dd) reads the right lanes at all depths
    if s_gr:
        slot_cell0_gr = np.zeros(s_gr, np.int32)
        for dd in range(adaptive_depth):
            lo, hi = int(gr_offs[dd]), int(gr_offs[dd + 1])
            flat_cells(gr_coords[lo:hi], dd, origins[0], dims[0],
                       out=slot_cell0_gr[lo:hi])
        slot_cell0_gr[~gr_active] = 0
        # sort grad slots globally by depth-0 cell so BOTH the fused
        # gather and the scatter-add get the sorted-indices hint
        # (measured 23 vs 134 ns/row for the scatter).  ``gr_perm``
        # realigns the hierarchy-ordered gradient targets on device.
        gr_perm = np.argsort(slot_cell0_gr, kind="stable").astype(np.int32)
        slot_cell0_gr = slot_cell0_gr[gr_perm]
        gr_coords = gr_coords[gr_perm]
        gr_depth = gr_depth[gr_perm]
        gr_active = gr_active[gr_perm]
        slot_cell_gr = slot_cell_gr[:, gr_perm]
    else:
        slot_cell0_gr = np.zeros(0, np.int32)
        gr_perm = np.zeros(0, np.int32)

    # ---- per-depth voxel -> dense cell (coefficient init/extract) -------
    vox_cell, vox_active = [], []
    for d in range(depth):
        cap = dec_caps[d]
        nn = min(len(dec_grids[d].keys), cap)
        c = np.zeros((cap, 3), np.int64)
        c[:nn] = dec_grids[d].coords[:nn]
        vox_cell.append(flat_cell(c, d))
        a = np.zeros(cap, bool)
        a[:nn] = True
        vox_active.append(a)

    cap_pts = _next_pow2(max(n, 1)) if force_cap is None else force_cap
    if n > cap_pts:
        return None
    spec = LatticeSpec(
        dims=tuple(dims), k=k, depth=depth, adaptive_depth=adaptive_depth,
        s_pt=s_pt, p_rows=p_rows, s_gr=s_gr, n_pts_cap=cap_pts)
    return LatticePlan(
        spec=spec, origins=np.stack(origins).astype(np.int32),
        phase=np.stack(phase).astype(np.int32),
        pt_perm=order.astype(np.int32), pt_dest=pt_dest,
        pt_cell0=cell0_sorted.astype(np.int32),
        slot_cell_pt=slot_cell_pt, slot_cell0_pt=slot_cell0_pt,
        gr_coords=gr_coords.astype(np.int32), gr_depth=gr_depth,
        gr_active=gr_active, slot_cell_gr=slot_cell_gr,
        slot_cell0_gr=slot_cell0_gr.astype(np.int32),
        gr_perm=gr_perm,
        vox_cell=tuple(vox_cell), vox_active=tuple(vox_active))


# ------------------------------------------------------- device primitives
def _corner_cat(flat: jnp.ndarray, spec: LatticeSpec, d: int,
                v: int) -> jnp.ndarray:
    """(n_cells*v,) flat dense channel buffer -> (n_cells, 8v) per-cell
    corner concat via 8 STATIC shifted slices (corner offsets are constant
    flat strides on a dense lattice — the gather-free support evaluation).

    Layout note: the flat slices reshape to (n, v) per corner; XLA keeps
    those in compact {0,1:T(4,128)}-style layouts and pays one relayout
    copy per corner at the concat (measured ~4 ms per 85 MB at bench
    scale).  Do NOT restructure this as one (n+pad, v) reshape + row
    slices: XLA then materializes (n, v) in lane-PADDED T(8,128) layouts
    (32x memory — 5 GB per corner at bench scale, instant OOM).
    """
    n = spec.n_cells(d)
    strides = spec.corner_strides(d)
    pad = (strides[-1] + 1) * v
    fp = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return jnp.concatenate(
        [jax.lax.dynamic_slice(fp, (s * v,), (n * v,)).reshape(n, v)
         for s in strides], axis=-1)


def _corner_scatter_back(acc: jnp.ndarray, spec: LatticeSpec, d: int,
                         v: int) -> jnp.ndarray:
    """Adjoint of ``_corner_cat``: (n_cells, 8v) -> flat (n_cells*v,).

    Written as a SUM of 8 statically shifted FLAT blocks: out[m*v + j] =
    sum_i acc[m - s_i, i*v + j].  Each block pays one (n, v) -> flat
    relayout copy, but every materialized tensor is 1-D.  Do NOT rewrite
    this as row-shifted (n, v) lane-slice adds: the (n, v) slices
    materialize in lane-PADDED T(8,128) layouts (32x HBM for v=4 — eight
    4.1 GB temps at bench scale, measured OOM 38.5G/15.75G)."""
    n = spec.n_cells(d)
    strides = spec.corner_strides(d)
    out = 0.0
    for i, s in enumerate(strides):
        part = acc[:, i * v:(i + 1) * v].reshape(-1)        # (n*v,)
        if s:
            part = jnp.concatenate(
                [jnp.zeros((s * v,), acc.dtype), part[:(n - s) * v]])
        out = out + part
    return out


# ------------------- packed 128-lane corner expansion (one-hot MXU perms)
#
# The corner expansion flat (n*v,) -> (n, 8v) is a pure data relayout.
# Expressed as XLA slices+concat it creates (n, v)-shaped values whose
# T(8,128) layouts lane-pad 32x for v=4; inside the CG while-loop XLA's
# remat/compression pass materializes those operands (measured: eight
# 2.06 GB temps, compile-time OOM 22G/15.75G).  Here the relayout is a
# ONE-HOT PERMUTATION MATMUL instead: every tensor is either flat-packed
# (rows of 128 flats) or cell-rows of 128 lanes, and the lane shuffle
# runs on the MXU (~3 ms at bench scale vs ~50 ms of relayout copies).
# The matrices are 0/1 with a single 1 per row/column, so the "matmul"
# is exact element selection in any dtype.

@functools.lru_cache(maxsize=None)
def _corner_perm_M(v: int) -> np.ndarray:
    """(1024, 1024) one-hot: G lane (i, m) -> packed corner-table P lane.

    G row t concatenates the 8 corner-shifted flat windows (128 flats
    each); P row (8t + r) holds cells [C_o*(8t+r) ...) as 8v-lane groups,
    C_o = 16 // v cells per 128-lane row.
    """
    m = np.zeros((8, 128, 8, 128), np.float32)
    for i in range(8):
        for r in range(8):
            for c in range(16 // v):
                for j in range(v):
                    m[i, 16 * r + v * c + j, r, 8 * v * c + v * i + j] = 1.0
    return m.reshape(1024, 1024)


@functools.lru_cache(maxsize=None)
def _place_perm_U(v: int, d_block: int, lanes: int) -> np.ndarray:
    """(128, C_o*lanes) one-hot: packed corner-table row -> C_o cell-rows
    of width ``lanes`` with the 8v corner lanes placed at block offset
    ``8*v*d_block`` (lanes = depth*8v, 128 at the default depth 4, k 4)."""
    c_o = 16 // v
    u = np.zeros((128, c_o, lanes), np.float32)
    for c in range(c_o):
        for w in range(8 * v):
            u[8 * v * c + w, c, 8 * v * d_block + w] = 1.0
    return u.reshape(128, c_o * lanes)


def _g_windows(a: jnp.ndarray, strides, v: int, t_rows: int) -> jnp.ndarray:
    """(R, 128) zero-padded packed flat buffer -> (T, 1024) concat of the
    8 corner-shifted windows.  A shift of ``s`` cells is ``s*v`` flats =
    a static row offset plus a static lane roll (two row-slices, one
    lane-concat, one lane-slice) — every value 128-lane or wider."""
    gs = []
    for s in strides:
        q, l = divmod(s * v, 128)
        if l == 0:
            g = jax.lax.slice(a, (q, 0), (q + t_rows, 128))
        else:
            two = jnp.concatenate(
                [jax.lax.slice(a, (q, 0), (q + t_rows, 128)),
                 jax.lax.slice(a, (q + 1, 0), (q + t_rows + 1, 128))],
                axis=1)
            g = jax.lax.slice(two, (0, l), (t_rows, l + 128))
        gs.append(g)
    return jnp.concatenate(gs, axis=1)


def _place_level(spec: LatticeSpec, xp: jnp.ndarray, d: int,
                 dtype) -> jnp.ndarray:
    """Packed flat coefficients (n_d*v/128, 128) -> cell-rows
    (n_d, lanes) with the level's 8v corner lanes at block offset 8*v*d
    (other lanes zero).  Two one-hot matmuls; both reshapes are free row
    merges."""
    v = spec.k
    n = spec.n_cells(d)
    t_rows = n * v // 128
    strides = spec.corner_strides(d)
    extra = (strides[-1] * v) // 128 + 2
    a = jnp.concatenate(
        [xp.astype(dtype), jnp.zeros((extra, 128), dtype)], axis=0)
    g = _g_windows(a, strides, v, t_rows)
    mm = jnp.asarray(_corner_perm_M(v), dtype)
    uu = jnp.asarray(_place_perm_U(v, d, spec.lanes), dtype)
    p = (g @ mm).reshape(8 * t_rows, 128)
    return (p @ uu).reshape(n, spec.lanes)


def _strip_level_adj(spec: LatticeSpec, z: jnp.ndarray,
                     d: int) -> jnp.ndarray:
    """Adjoint of ``_place_level`` (f32): cell-rows (n_d, 128) -> packed
    flat (n_d*v/128, 128)."""
    v = spec.k
    n = spec.n_cells(d)
    c_o = 16 // v
    t_rows = n * v // 128
    strides = spec.corner_strides(d)
    extra = (strides[-1] * v) // 128 + 2
    f32 = jnp.float32
    # one-hot operands in z's own dtype: the "matmul" is exact element
    # selection in any dtype, and a f32 operand against a bf16 z would
    # force a full-size convert of the z stream
    uu_t = jnp.asarray(_place_perm_U(v, d, spec.lanes).T, z.dtype)
    mm_t = jnp.asarray(_corner_perm_M(v).T, f32)
    pp = (z.reshape(n // c_o, c_o * spec.lanes) @ uu_t).astype(f32)
    h = pp.reshape(t_rows, 1024) @ mm_t
    out = jnp.zeros((t_rows + extra, 128), f32)
    for idx, s in enumerate(strides):
        hi = jax.lax.slice(h, (0, idx * 128), (t_rows, (idx + 1) * 128))
        q, l = divmod(s * v, 128)
        if l == 0:
            out = out.at[q:q + t_rows].add(hi)
        else:
            w = jnp.pad(hi, ((0, 0), (l, 128 - l)))
            out = out.at[q:q + t_rows].add(w[:, :128])
            out = out.at[q + 1:q + t_rows + 1].add(w[:, 128:])
    return jax.lax.slice(out, (0, 0), (t_rows, 128))


# ----------------------------- zero-phase up/down cascade (fused AV0 v2)
def _up2(a: jnp.ndarray, dims_c, dims_f) -> jnp.ndarray:
    """(cells_c, L) -> (cells_f, L): one 2x nearest upsample step between
    nested lattices (step phase 0: fine cell l has parent l >> 1).

    Pass order is chosen from the round-4 HLO trace
    (scripts/profile_matvec_trace.py): every materialized pass runs near
    wire speed, so cost == passes x bytes.  Hence (a) the coarse buffer
    is trimmed ONCE up front (ceil(fine/2) extent; a coarse-size copy
    replaces the former fine-size trim slices, measured 2.0+ ms each at
    bench scale); (b) the z duplication — the one step whose lane-concat
    reshape cannot fuse — runs FIRST, while the buffer is still ~1/4 of
    fine size; (c) the x duplication runs LAST: a leading-axis broadcast
    of contiguous blocks is the cheapest full-size pass.  Odd fine
    extents trim after the corresponding duplication (rare: the plan
    emits even dims).
    """
    xc, yc, zc = dims_c
    xf, yf, zf = dims_f
    L = a.shape[-1]
    cx, cy, cz = (xf + 1) // 2, (yf + 1) // 2, (zf + 1) // 2
    a = a.reshape(xc, yc, zc, L)
    if (cx, cy, cz) != (xc, yc, zc):
        a = a[:cx, :cy, :cz]
    # z-dup via lane concat: row (..., z) = [A_z | A_z] reshaped so rows
    # 2z and 2z+1 both read A_z (row-major order preserved)
    a = jnp.concatenate([a, a], axis=-1).reshape(cx, cy, 2 * cz, L)
    if zf != 2 * cz:
        a = a[:, :, :zf]
    a = jnp.broadcast_to(a[:, :, None], (cx, cy, 2, zf, L))
    a = a.reshape(cx, 2 * cy, zf, L)
    if yf != 2 * cy:
        a = a[:, :yf]
    a = jnp.broadcast_to(a[:, None], (cx, 2, yf, zf, L))
    a = a.reshape(2 * cx, yf, zf, L)
    if xf != 2 * cx:
        a = a[:xf]
    return a.reshape(xf * yf * zf, L)


def _down2(a: jnp.ndarray, dims_f, dims_c) -> jnp.ndarray:
    """Adjoint of ``_up2``: (cells_f, L) -> (cells_c, L), summing the up
    to 8 children of each coarse cell (step phase 0).

    Pair sums are written as row-major reshape-splits + axis sums, NOT
    ``a[..., 0::2] + a[..., 1::2]``: XLA lowers stride-2 slices of big
    4-D tensors to gathers with multi-GB padded temps (measured OOM
    18.3G/15.75G at bench scale).  Mirror of the new ``_up2`` pass
    order: x-pair reduce first (leading-axis split, largest pass,
    cheapest form), z-pair reduce last (smallest buffer), and the pad up
    to the coarse extent happens ONCE at the end on the ~1/8-size coarse
    buffer (the former per-axis pads were fine-size passes — 4.15 +
    2.10 ms at bench scale in the round-4 trace).  Odd fine extents pad
    by one before their own reduction (rare: the plan emits even
    dims)."""
    xf, yf, zf = dims_f
    xc, yc, zc = dims_c
    L = a.shape[-1]
    cx, cy, cz = (xf + 1) // 2, (yf + 1) // 2, (zf + 1) // 2
    a = a.reshape(xf, yf, zf, L)
    if xf != 2 * cx:
        a = jnp.pad(a, ((0, 1), (0, 0), (0, 0), (0, 0)))
    a = a.reshape(cx, 2, yf, zf, L).sum(axis=1)
    if yf != 2 * cy:
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 0), (0, 0)))
    a = a.reshape(cx, cy, 2, zf, L).sum(axis=2)
    if zf != 2 * cz:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 1), (0, 0)))
    a = a.reshape(cx, cy, cz, 2, L).sum(axis=3)
    if (cx, cy, cz) != (xc, yc, zc):
        a = jnp.pad(a, ((0, xc - cx), (0, yc - cy), (0, zc - cz),
                        (0, 0)))
    return a.reshape(xc * yc * zc, L)


# ------------------------- conv-patches cascade (engine 'xla-conv')
#
# Same math as _av0_cascade, but the corner expansion rides XLA's TPU
# convolution emitter instead of the packed-window one-hot matmuls:
# a 2x2x2 conv_general_dilated_patches extracts all 8 corner
# coefficients per cell in the conv pipeline's own layouts, and ONE
# one-hot placement matmul both fixes the patches' channel-major corner
# order and lands the 8k block at the level's lane offset.  Boundary
# semantics differ from the flat-stride windows (patches zero-PAD where
# the flat strides WRAP into the next row), but both only ever read
# margin cells there, which are structurally inactive (zero
# coefficients, zero Gram rows) — the engines agree exactly on the
# active subspace (pinned by tests/test_lattice.py cross-engine test).

@functools.lru_cache(maxsize=None)
def _conv_place_M(v: int, d_block: int, lanes: int) -> np.ndarray:
    """(8v, lanes) one-hot: patches channel-major lane (c*8 + corner) ->
    AV0 lane 8*v*d_block + corner*v + c (corner-major, coeff minor —
    the _corner_cat/_place_level lane convention)."""
    m = np.zeros((8 * v, lanes), np.float32)
    for c in range(v):
        for corner in range(8):
            m[c * 8 + corner, 8 * v * d_block + corner * v + c] = 1.0
    return m


def _place_level_conv(spec: LatticeSpec, xp: jnp.ndarray, d: int,
                      dtype) -> jnp.ndarray:
    """Packed flat coefficients (n_d*v/128, 128) -> cell-rows
    (n_d, lanes) via patch-extraction + placement matmul."""
    v = spec.k
    X, Y, Z = spec.dims[d]
    xd = xp.reshape(X, Y, Z, v).astype(dtype)
    padc = jnp.pad(xd, ((0, 1), (0, 1), (0, 1), (0, 0)))
    p = jax.lax.conv_general_dilated_patches(
        padc[None], (2, 2, 2), (1, 1, 1), "VALID",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))[0]
    mm = jnp.asarray(_conv_place_M(v, d, spec.lanes), dtype)
    return p.reshape(X * Y * Z, 8 * v) @ mm


def _av0_cascade_conv(spec: LatticeSpec, xs: Tuple[jnp.ndarray, ...],
                      dtype) -> jnp.ndarray:
    """Conv-emitter twin of ``_av0_cascade``."""
    depth = spec.depth
    acc = _place_level_conv(spec, xs[depth - 1], depth - 1, dtype)
    for d in range(depth - 2, -1, -1):
        acc = _up2(acc, spec.dims[d + 1], spec.dims[d]) \
            + _place_level_conv(spec, xs[d], d, dtype)
    return acc


def _av0_adjoint_cascade_conv(spec: LatticeSpec,
                              z0: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Adjoint of ``_av0_cascade_conv`` in f32, by ``linear_transpose``
    (the cascade is linear; XLA emits the transposed convs)."""

    def fwd(xs):
        return _av0_cascade_conv(spec, xs, jnp.float32)

    prim = tuple(jax.ShapeDtypeStruct(
        (spec.n_cells(d) * spec.k // 128, 128), jnp.float32)
        for d in range(spec.depth))
    outs, = jax.linear_transpose(fwd, prim)(z0.astype(jnp.float32))
    return tuple(outs)


def _av0_cascade(spec: LatticeSpec, xs: Tuple[jnp.ndarray, ...],
                 dtype) -> jnp.ndarray:
    """Fused support buffer at depth-0 resolution, built coarse-to-fine:
    (cells_0, depth*8k) with lane block d = the 8-corner coefficients of
    the cell's depth-d ancestor.  Zero-phase nesting (plan_lattice) makes
    every step a static stride-2 program — no per-chunk phase data.

    ``xs``: per-depth PACKED flat coefficients (n_d*k/128, 128).  Each
    level lands via ``_place_level`` (one-hot matmuls, lanes beyond the
    level's block zero), so the assembly is adds — no lane concats of
    narrow pieces anywhere.
    """
    depth = spec.depth
    acc = _place_level(spec, xs[depth - 1], depth - 1, dtype)
    for d in range(depth - 2, -1, -1):
        acc = _up2(acc, spec.dims[d + 1], spec.dims[d]) \
            + _place_level(spec, xs[d], d, dtype)
    return acc                                  # lanes [d0 | d1 | ... ]


def _av0_adjoint_cascade(spec: LatticeSpec, z0: jnp.ndarray,
                         stream_dtype=jnp.float32
                         ) -> Tuple[jnp.ndarray, ...]:
    """Adjoint of ``_av0_cascade``: (cells_0, depth*8k) -> per-depth
    PACKED flat coefficient buffers (n_d*k/128, 128).  Strips each
    level's lane block via the transposed one-hot matmuls and downsamples
    one step.

    ``stream_dtype``: dtype of the cascade's big streamed buffers (the
    depth-0 z-buffer and its ``_down2`` children).  The per-depth outputs
    stay f32 (the strip matmuls accumulate in f32 on the MXU), so bf16
    here halves the dominant HBM streams at the cost of rounding the
    child sums — acceptable inside the CG matvec, whose f32 arithmetic
    already floors at rel_res ~3e-3 (DESIGN.md #17); the one-time
    Jacobi-diagonal builder keeps f32."""
    depth = spec.depth
    acc = z0.astype(stream_dtype)
    outs = []
    for d in range(depth):
        outs.append(_strip_level_adj(spec, acc, d))
        if d + 1 < depth:
            acc = _down2(acc, spec.dims[d], spec.dims[d + 1])
    return tuple(outs)


def _row_blocks(spec: LatticeSpec, xs: Tuple[jnp.ndarray, ...],
                slot_cells: jnp.ndarray, dtype=jnp.float32,
                avs=None) -> jnp.ndarray:
    """Per-slot support vector AV (S, lanes): corner coefficient blocks of
    the slot's cell at every depth.  ``slot_cells``: (depth, S) int32.

    ``avs``: optional pre-materialized per-depth corner tables from
    ``_corner_tables`` — REQUIRED for performance in loops: if the gather
    reads a fused (unmaterialized) corner-cat operand, XLA recomputes the
    8-slice concat per gathered row (~50 ns/row vs ~7 ns/row from a
    materialized table — 4 such fusions measured 66 ms each per CG
    iteration at bench scale)."""
    if avs is None:
        avs = _corner_tables(spec, xs, dtype)
    parts = []
    for d in range(spec.depth):
        parts.append(jnp.take(avs[d], slot_cells[d], axis=0))
    return jnp.concatenate(parts, axis=-1)             # (S, depth*8k)


def _corner_tables(spec: LatticeSpec, xs: Tuple[jnp.ndarray, ...],
                   dtype) -> Tuple[jnp.ndarray, ...]:
    """Materialized per-depth (cells_d, 8k) corner tables (see
    _row_blocks): the optimization_barrier forces one real table per
    depth that both row families' gathers then read."""
    avs = tuple(_corner_cat(xs[d], spec, d, spec.k).astype(dtype)
                for d in range(spec.depth))
    return jax.lax.optimization_barrier(avs)


def _row_blocks_adjoint(spec: LatticeSpec, y: jnp.ndarray,
                        slot_cells: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Adjoint of ``_row_blocks``: (S, lanes) -> per-depth flat buffers."""
    outs = []
    w = 8 * spec.k
    for d in range(spec.depth):
        acc = jnp.zeros((spec.n_cells(d), w)).at[slot_cells[d]].add(
            y[:, d * w:(d + 1) * w])
        outs.append(_corner_scatter_back(acc, spec, d, spec.k))
    return tuple(outs)


# ---------------------------------------------- fused depth-0 support (AV0)
def _is_static_phase(phase_d) -> bool:
    return isinstance(phase_d, (tuple, list)) or \
        (isinstance(phase_d, np.ndarray) and not isinstance(
            phase_d, jnp.ndarray))


def _upsample_to_0(av: jnp.ndarray, spec: LatticeSpec, d: int,
                   phase_d) -> jnp.ndarray:
    """(cells_d, v) -> (cells_0, v): nearest (block) upsampling aligned to
    the depth-0 frame.  ``phase_d``: (3,) offset ``o0 - (o_d << d)``.

    STATIC phases (python ints / numpy) are strongly preferred: the whole
    broadcast+slice chain then fuses into the AV0 concat consumer.  With
    a runtime phase (vmapped chunk batches) XLA materializes the
    upsampled block as a lane-padded temp — measured 4x-32x HBM padding
    blowups that OOMed the bench-scale solve.
    """
    if d == 0:
        return av
    x0, y0, z0 = spec.dims[0]
    xd, yd, zd = spec.dims[d]
    f = 1 << d
    v = av.shape[-1]
    a = av.reshape(xd, yd, zd, v)
    a = jnp.broadcast_to(a[:, None, :, None, :, None, :],
                         (xd, f, yd, f, zd, f, v))
    a = a.reshape(xd * f, yd * f, zd * f, v)
    if _is_static_phase(phase_d):
        px, py, pz = (int(phase_d[i]) for i in range(3))
        a = jax.lax.slice(a, (px, py, pz, 0), (px + x0, py + y0,
                                               pz + z0, v))
    else:
        a = jax.lax.dynamic_slice(
            a, (phase_d[0], phase_d[1], phase_d[2], 0), (x0, y0, z0, v))
    return a.reshape(spec.n_cells(0), v)


def _downsample_from_0(y: jnp.ndarray, spec: LatticeSpec, d: int,
                       phase_d) -> jnp.ndarray:
    """Adjoint of ``_upsample_to_0``: (cells_0, v) -> (cells_d, v)."""
    if d == 0:
        return y
    x0, y0d, z0 = spec.dims[0]
    xd, yd, zd = spec.dims[d]
    f = 1 << d
    v = y.shape[-1]
    if _is_static_phase(phase_d):
        px, py, pz = (int(phase_d[i]) for i in range(3))
        big = jnp.pad(y.reshape(x0, y0d, z0, v),
                      ((px, xd * f - px - x0), (py, yd * f - py - y0d),
                       (pz, zd * f - pz - z0), (0, 0)))
    else:
        big = jnp.zeros((xd * f, yd * f, zd * f, v), y.dtype)
        big = jax.lax.dynamic_update_slice(
            big, y.reshape(x0, y0d, z0, v),
            (phase_d[0], phase_d[1], phase_d[2], 0))
    return big.reshape(xd, f, yd, f, zd, f, v).sum(
        axis=(1, 3, 5)).reshape(spec.n_cells(d), v)


def _av0(spec: LatticeSpec, xs: Tuple[jnp.ndarray, ...],
         phase: jnp.ndarray, dtype) -> jnp.ndarray:
    """Fused per-cell support buffer at depth-0 resolution.

    (cells_0, depth*8k): lane block d holds the 8-corner coefficients of
    the cell's depth-d ancestor — so ONE row gather serves all depths.
    The concat hits exactly 128 lanes at the default (depth 4, k 4): no
    lane padding anywhere.
    """
    parts = []
    for d in range(spec.depth):
        av = _corner_cat(xs[d], spec, d, spec.k)
        parts.append(_upsample_to_0(av, spec, d, phase[d]).astype(dtype))
    return jnp.concatenate(parts, axis=-1)


def _av0_adjoint(spec: LatticeSpec, y0: jnp.ndarray,
                 phase: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Adjoint of ``_av0`` (in f32): (cells_0, lanes) -> per-depth flat."""
    outs = []
    w = 8 * spec.k
    for d in range(spec.depth):
        part = _downsample_from_0(
            y0[:, d * w:(d + 1) * w].astype(jnp.float32), spec, d, phase[d])
        outs.append(_corner_scatter_back(part, spec, d, spec.k))
    return tuple(outs)


def _gram_middle(spec: LatticeSpec, z0: jnp.ndarray, phase,
                 dtype) -> jnp.ndarray:
    """C C^T applied in depth-0 row space: (cells_0, lanes) ->
    (cells_0, lanes).

    The cascade C (packed coeffs -> AV0) is lane-block-diagonal over
    depths, so C C^T = blockdiag_d of up_d . E_d E_d^T . down_d with
    E_d the per-depth corner expansion — the dual matvec never needs the
    packed-coefficient round trip (the two cascades that dominate the
    primal matvec's cost).  Exactly _av0 . _av0_adjoint.
    """
    return _av0(spec, _av0_adjoint(spec, z0, phase), phase, dtype)


def _take_rows_sorted(tab: jnp.ndarray, idx: jnp.ndarray,
                      is_sorted: bool) -> jnp.ndarray:
    """tab[idx] along axis 0 with an explicit sortedness hint (the slot
    cells are nondecreasing by construction; XLA can lower sorted gathers
    with better locality)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(
        tab, idx[:, None], dnums, (1, tab.shape[1]),
        indices_are_sorted=is_sorted, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP)


# ----------------------------------------------------------- row assembly
def _interp_layers(interp, d: int):
    """[(kernel, bias), ...] of the depth-d interpolator MLP."""
    p = interp.params["params"][f"interp_{d}"]
    return [(p[f"Dense_{i}"]["kernel"], p[f"Dense_{i}"]["bias"])
            for i in range(len(p))]


def _blockdiag8(layers):
    """Per-corner MLP -> one MXU matmul chain: kron(I8, W) block-diagonal
    weights apply the same small Dense to all 8 corners at once, keeping
    every temp 2-D with >=128 lanes (a (C, 8, 16) temp would pad its
    16-lane axis 8x; (C, 128) pads nothing)."""
    return [(jnp.kron(jnp.eye(8, dtype=w.dtype), w), jnp.tile(b, 8))
            for w, b in layers]


def _raw_blockdiag(layers8, x, tan_consts):
    """Evaluate ``1 + MLP`` over 8 corners at once, with optional forward
    tangents.

    ``x``: (C, 8*in) interleaved per-corner inputs.  ``tan_consts``: for
    each requested tangent, the CONSTANT first-layer pre-activation row
    (the tangent of the input is the same indicator in every corner block,
    so its image under the block-diagonal first layer is one broadcast
    row — no extra matmul).  Returns (raw (C, 8*out), [tangents]).
    """
    h = x
    tans: List[jnp.ndarray] = []
    last = len(layers8) - 1
    for li, (w, b) in enumerate(layers8):
        pre = h @ w + b
        t_pre = [jnp.broadcast_to(c, pre.shape) for c in tan_consts] \
            if li == 0 else [t @ w for t in tans]
        if li < last:
            s = jax.nn.sigmoid(pre)
            h = pre * s                       # silu
            ds = s * (1.0 + pre * (1.0 - s))  # silu'
            tans = [ds * t for t in t_pre]
        else:
            h = pre
            tans = t_pre
    return 1.0 + h, tans


def _window_grad(t: jnp.ndarray):
    """C1 bump window prod (1-t_a^2)^2 and its gradient, (..., 3)."""
    u = jnp.clip(1.0 - t * t, 0.0, None)
    u2 = u * u
    w = jnp.prod(u2, axis=-1)
    du = -4.0 * t * u
    g = jnp.stack([du[..., a] * u2[..., (a + 1) % 3] * u2[..., (a + 2) % 3]
                   for a in range(3)], axis=-1)
    return w, g


def _corner_offsets() -> np.ndarray:
    return np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                    -1).reshape(8, 3).astype(np.float32)


def assemble_rows(spec: LatticeSpec, interp, features_dense_fc,
                  act_fc, xyz_sorted: jnp.ndarray, mask_sorted: jnp.ndarray,
                  pt_cell0: jnp.ndarray, pt_dest: jnp.ndarray,
                  slot_cells_pt: jnp.ndarray,
                  gr_coords: jnp.ndarray, gr_depth: jnp.ndarray,
                  gr_active: jnp.ndarray, slot_cells_gr: jnp.ndarray,
                  voxel_size: float, approx_grad: bool):
    """Build the per-slot basis blocks.

    ``features_dense_fc[d]``: (n_cells_d, 8*Cb) per-cell corner features
    (from ``_corner_cat`` of densely scattered basis features).
    ``act_fc[d]``: (n_cells_d, 8) corner-activity (inactive corner voxels
    contribute zero basis — mirrors idx==-1 masking in fields/support.py).

    Returns (B_pt (p_rows, s_pt, lanes), w-mask rows (p_rows, s_pt),
             B_gr (3, s_gr, lanes), gr window basis value rows for rhs).
    """
    k, depth = spec.k, spec.depth
    offs = jnp.asarray(_corner_offsets())
    raw_layers = [_interp_layers(interp, d) for d in range(depth)]
    layers8 = [_blockdiag8(ls) for ls in raw_layers]
    # constant first-layer tangent rows: the z0 tangent is the same axis
    # indicator in every corner block -> its first-layer image is one
    # tiled row of W1 (see _raw_blockdiag)
    tan_consts = [[jnp.tile(raw_layers[d][0][0][a], 8) for a in range(3)]
                  for d in range(depth)]

    # ---------------- point rows ----------------
    def pt_chunk(args):
        x, c0, m, dest_cell = args                     # (C,3),(C,3),(C,),(depth,C)
        lanes_parts = []
        for d in range(depth):
            vs_d = voxel_size * (2.0 ** d)
            cell_d = (c0 >> d).astype(jnp.float32)     # exact integer cell
            z0 = (x / vs_d)[:, None, :] - cell_d[:, None, :] - offs[None]
            fc = jnp.take(features_dense_fc[d], dest_cell[d], axis=0)
            cb = fc.shape[-1] // 8
            xin = jnp.concatenate([z0, fc.reshape(-1, 8, cb)],
                                  axis=-1).reshape(-1, 8 * (3 + cb))
            raw, _ = _raw_blockdiag(layers8[d], xin, [])   # (C, 8k)
            act = jnp.take(act_fc[d], dest_cell[d], axis=0)  # (C, 8)
            w, _ = _window_grad(z0)
            wk = jnp.repeat(w * act, k, axis=-1)           # (C, 8k)
            lanes_parts.append(raw * wk)
        out = jnp.concatenate(lanes_parts, axis=-1)    # (C, lanes)
        return jnp.where(m[:, None], out, 0.0)

    ncap = xyz_sorted.shape[0]
    chunk = min(1 << 15, ncap)
    nb = ncap // chunk
    cells_pt_per_point = []
    for d in range(depth):
        # flat dense cell per point = its slot's cell (same by construction)
        cells_pt_per_point.append(
            jnp.take(slot_cells_pt[d], pt_dest % spec.s_pt))
    cells_pp = jnp.stack(cells_pt_per_point)           # (depth, n)
    rows = jax.lax.map(
        pt_chunk,
        (xyz_sorted.reshape(nb, chunk, 3), pt_cell0.reshape(nb, chunk, 3),
         mask_sorted.reshape(nb, chunk),
         jnp.moveaxis(cells_pp.reshape(depth, nb, chunk), 1, 0)))
    rows = rows.reshape(ncap, spec.lanes)
    b_pt = jnp.zeros((spec.p_rows * spec.s_pt, spec.lanes)).at[
        pt_dest].add(jnp.where(mask_sorted[:, None], rows, 0.0),
                     mode="drop")
    w_pt = jnp.zeros((spec.p_rows * spec.s_pt,)).at[pt_dest].add(
        mask_sorted.astype(jnp.float32), mode="drop")
    b_pt = b_pt.reshape(spec.p_rows, spec.s_pt, spec.lanes)
    w_pt = jnp.minimum(w_pt, 1.0).reshape(spec.p_rows, spec.s_pt)

    # ---------------- gradient rows ----------------
    def gr_chunk(args):
        c, dd, act_row, dest_cell = args
        # center world position = c * vs_dd
        scale = jnp.exp2(dd.astype(jnp.float32)) * voxel_size
        x = c.astype(jnp.float32) * scale[:, None]
        vals, grads = [], []
        for d in range(depth):
            vs_d = voxel_size * (2.0 ** d)
            rel = dd - d
            cell_d = jnp.where(
                rel[:, None] >= 0,
                c << jnp.maximum(rel, 0)[:, None],
                c >> jnp.maximum(-rel, 0)[:, None]).astype(jnp.float32)
            z0 = (x / vs_d)[:, None, :] - cell_d[:, None, :] - offs[None]
            fc = jnp.take(features_dense_fc[d], dest_cell[d], axis=0)
            cb = fc.shape[-1] // 8
            xin = jnp.concatenate([z0, fc.reshape(-1, 8, cb)],
                                  axis=-1).reshape(-1, 8 * (3 + cb))
            act = jnp.take(act_fc[d], dest_cell[d], axis=0)   # (C, 8)
            raw, draws = _raw_blockdiag(
                layers8[d], xin, [] if approx_grad else tan_consts[d])
            if approx_grad:
                draws = [jnp.zeros_like(raw)] * 3
            w, dw = _window_grad(z0)                          # (C,8),(C,8,3)
            wa = w * act
            val = raw * jnp.repeat(wa, k, axis=-1)
            vals.append(val)
            comp = []
            for a in range(3):
                db = (raw * jnp.repeat(dw[..., a] * act, k, axis=-1)
                      + draws[a] * jnp.repeat(wa, k, axis=-1)) / vs_d
                comp.append(db)
            grads.append(jnp.stack(comp, 0))           # (3, C, 8k)
        val = jnp.concatenate(vals, axis=-1)           # (C, lanes)
        grd = jnp.concatenate(grads, axis=-1)          # (3, C, lanes)
        am = act_row.astype(jnp.float32)
        return val * am[:, None], grd * am[None, :, None]

    sgr = spec.s_gr
    gchunk = sgr
    for g in (1 << 14, 1 << 13, 1 << 12):   # largest pow2 divisor <= 16k
        if sgr % g == 0:
            gchunk = g
            break
    gnb = max(sgr // gchunk, 1)
    val_g, b_gr = jax.lax.map(
        gr_chunk,
        (gr_coords.reshape(gnb, gchunk, 3), gr_depth.reshape(gnb, gchunk),
         gr_active.reshape(gnb, gchunk),
         jnp.moveaxis(slot_cells_gr.reshape(depth, gnb, gchunk), 1, 0)))
    val_g = val_g.reshape(sgr, spec.lanes)
    b_gr = jnp.moveaxis(b_gr, 1, 0).reshape(3, sgr, spec.lanes)
    return b_pt, w_pt, val_g, b_gr


# ------------------------------------------------------------------- solve
def lattice_solve(spec: LatticeSpec, interp,
                  basis_features: Tuple[jnp.ndarray, ...],
                  xyz_sorted: jnp.ndarray, mask_sorted: jnp.ndarray,
                  pt_cell0: jnp.ndarray, pt_dest: jnp.ndarray,
                  slot_cells_pt: jnp.ndarray, slot_cells_gr: jnp.ndarray,
                  gr_coords: jnp.ndarray, gr_depth: jnp.ndarray,
                  gr_active: jnp.ndarray, gr_targets: jnp.ndarray,
                  vox_cell: Tuple[jnp.ndarray, ...],
                  vox_active: Tuple[jnp.ndarray, ...],
                  voxel_size: float,
                  pos_weight: float, normal_weight: float,
                  reg_weight: float, tol: float, max_iters: int,
                  approx_grad: bool, *,
                  slot_cell0_pt: jnp.ndarray, slot_cell0_gr: jnp.ndarray,
                  gr_perm: Optional[jnp.ndarray] = None,
                  phase=None,  # ignored: plans are zero-phase (nested)
                  compute_dtype: str = "float32",
                  formulation: str = "primal",
                  cascade_engine: str = "xla",
                  return_dense: bool = False,
                  return_stats: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Fit flat per-depth coefficients (cap_d * K,) — same output
    convention as KernelField.solve_non_fused, same math, dense engine.

    ``gr_targets``: (s_gr, 3) gradient targets (already includes the
    residual normal prior; weights applied here).

    ``return_dense``: additionally return the packed per-depth dense
    coefficient lattices (the raw CG solution; cells outside the active
    voxel set are exactly zero, since their operator columns vanish
    under the act_fc masking and their rhs is zero) so the lattice
    evaluator (fields/lattice_eval.py) skips re-scattering the solution
    for meshing.  ONLY the packed lattices are returned (~165 MB at the
    1M-point bench): returning the ~2.6 GB corner feature tables as jit
    outputs extended their lifetime across the CG loop and pushed the
    bench-scale solve peak over v5e HBM (measured RESOURCE_EXHAUSTED).
    Return shape becomes (alphas, xs_packed).

    The CG matvec uses the fused AV0 formulation: one (cells_0, lanes)
    support buffer built from dense shifts/upsamples, ONE sorted row
    gather + ONE sorted row scatter per family per direction (instead of
    ``depth`` of each), with the row blocks held in ``compute_dtype``
    (bf16 on TPU: half the HBM traffic of the dominant streams, f32
    accumulation everywhere).

    ``return_stats``: additionally return ``(iters, rel_res)`` CG
    convergence diagnostics (appended last).  Uses the raw PCG loop
    instead of ``custom_linear_solve`` — inference callers only (the
    while_loop is not reverse-differentiable); the stats let callers
    detect an unconverged solve instead of silently consuming it (the
    round-4 dense-parity regression was exactly that: 40 iters at
    tol=1e-5 returned rel_res ~1e-2 and two rounding trajectories of
    the same unconverged system differed by 3.8% in field value).
    """
    from ..solver.pcg import pcg, solve_spd

    def run_solver(mv, rhs_, pc):
        if return_stats:
            return pcg(mv, rhs_, precond=pc, tol=tol,
                       max_iters=max_iters)
        return solve_spd(mv, rhs_, precond=pc, tol=tol,
                         max_iters=max_iters), None, None

    depth, k = spec.depth, spec.k
    cdt = jnp.dtype(compute_dtype)
    # both slot families are sorted by depth-0 cell: pt slots enumerate
    # sorted point keys; gr slots are sorted at plan time (gr_perm
    # realigns the hierarchy-ordered gradient targets)
    gr_sorted = True
    if gr_perm is not None:
        gr_targets = jnp.take(gr_targets, gr_perm, axis=0)

    # dense per-cell corner features + corner activity (one-time)
    features_dense_fc, act_fc = [], []
    for d in range(depth):
        cb = basis_features[d].shape[-1]
        nc = spec.n_cells(d)
        fd = jnp.zeros((nc, cb)).at[vox_cell[d]].add(
            jnp.where(vox_active[d][:, None], basis_features[d], 0.0))
        features_dense_fc.append(_corner_cat(fd.reshape(-1), spec, d, cb))
        ad = jnp.zeros((nc,)).at[vox_cell[d]].add(
            vox_active[d].astype(jnp.float32))
        act_fc.append(_corner_cat(ad, spec, d, 1))

    b_pt, m_pt, val_g, b_gr = assemble_rows(
        spec, interp, features_dense_fc, act_fc, xyz_sorted, mask_sorted,
        pt_cell0, pt_dest, slot_cells_pt, gr_coords, gr_depth, gr_active,
        slot_cells_gr, voxel_size, approx_grad)
    del val_g
    # Pin the assembled blocks: without the barrier XLA rematerializes
    # these multi-GB loop-invariant tensors (and their whole assembly
    # chain) inside every CG iteration to save HBM.
    b_pt, m_pt, b_gr = jax.lax.optimization_barrier(
        (b_pt.astype(cdt), m_pt, b_gr.astype(cdt)))

    n_pts = jnp.maximum(jnp.sum(mask_sorted.astype(jnp.float32)), 1.0)
    m_vox = jnp.maximum(jnp.sum(gr_active.astype(jnp.float32)), 1.0)
    w_pt = m_pt.astype(jnp.float32) * (pos_weight / n_pts)    # (p_rows, s_pt)
    w_gr = gr_active.astype(jnp.float32) * (
        normal_weight / m_vox * voxel_size ** 2)              # (s_gr,)

    f32 = jnp.float32
    # Fused-AV0 matvec: per iteration, ONE (cells_0, depth*8k) support
    # buffer built by the zero-phase upsample cascade (one-hot MXU
    # permutation matmuls + dense streaming — no tensor narrower than its
    # packing), ONE 128-lane row gather per family (measured 17 ns/row vs
    # 35 ns/row for 32-lane), einsums on the MXU, ONE sorted 128-lane row
    # scatter-add per family into depth-0 resolution (23 ns/row vs 134
    # ns/row at 32 lanes), then the adjoint cascade back to packed
    # per-depth coefficients.
    n_c0 = spec.n_cells(0)

    if cascade_engine in ("pallas", "pallas-fwd"):
        from . import lattice_pallas as LP
        if not LP.supports(spec, cdt):
            from ..utils.profiling import log_engine_demotion
            log_engine_demotion(
                "pallas-cascade", "xla-cascade",
                f"plan {spec.dims[0]} x depth {spec.depth} exceeds the "
                "kernel's static feasibility bounds (supports())")
            cascade_engine = "xla"
    if cascade_engine in ("pallas", "pallas-fwd"):
        fwd_cascade = functools.partial(LP.av0_cascade_pallas, spec)
    elif cascade_engine == "xla-conv":
        fwd_cascade = functools.partial(_av0_cascade_conv, spec)
    else:
        fwd_cascade = functools.partial(_av0_cascade, spec)
    if cascade_engine == "pallas":
        adj_cascade = functools.partial(LP.av0_adjoint_cascade_pallas,
                                        spec, compute_dtype=cdt)
    elif cascade_engine == "xla-conv":
        adj_cascade = functools.partial(_av0_adjoint_cascade_conv, spec)
    else:
        import os as _os_adj
        adj_stream = cdt if _os_adj.environ.get(
            "NKSR_ADJ_BF16", "0") == "1" else jnp.float32
        adj_cascade = functools.partial(_av0_adjoint_cascade, spec,
                                        stream_dtype=adj_stream)

    def apply_A(xs):
        """rows = A x for both row families."""
        av0 = jax.lax.optimization_barrier(fwd_cascade(xs, cdt))
        av_pt = _take_rows_sorted(av0, slot_cell0_pt, True)
        av_gr = _take_rows_sorted(av0, slot_cell0_gr, gr_sorted)
        t_pt = jnp.einsum('rsl,sl->rs', b_pt, av_pt,
                          preferred_element_type=f32)
        t_gr = jnp.einsum('rsl,sl->rs', b_gr, av_gr,
                          preferred_element_type=f32)
        return t_pt, t_gr

    def apply_AT(t_pt, t_gr):
        y_pt = jnp.einsum('rsl,rs->sl', b_pt, t_pt.astype(cdt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', b_gr, t_gr.astype(cdt),
                          preferred_element_type=f32)
        z0 = jnp.zeros((n_c0, spec.lanes), f32)
        z0 = z0.at[slot_cell0_pt].add(y_pt, indices_are_sorted=True,
                                      mode="drop")
        z0 = z0.at[slot_cell0_gr].add(y_gr, indices_are_sorted=gr_sorted,
                                      mode="drop")
        return adj_cascade(z0)

    def matvec(xs):
        t_pt, t_gr = apply_A(xs)
        y = apply_AT(w_pt * t_pt, w_gr[None, :] * t_gr)
        return jax.tree_util.tree_map(
            lambda yi, xi: yi + reg_weight * xi, y, xs)

    # ---- dual (Gram/row-space) formulation --------------------------
    # The primal normal matrix A^T W A + reg I over the ~24M redundant
    # multilevel coefficients has near-null modes (fine-depth combos that
    # cancel coarse ones) whose Jacobi-scaled eigenvalues ~ reg/diag —
    # measured kappa ~ 1e5 and CG stalls (scripts/cg_convergence_study).
    # Substituting x = A^T W^{1/2} u solves the ROW-space system
    #     (W^{1/2} A A^T W^{1/2} + reg I) u = W^{1/2} y
    # instead (same pieces, same per-iteration cost, exact same x): the
    # redundancy modes vanish and the spectrum is the kernel Gram's —
    # the reference's own formulation (models/nksr_net.py:105-112).
    # Rows of (B C) hit pairwise-distinct coefficients lane-by-lane, so
    # diag(Gram)_r = w_r * ||b_r||^2 exactly — the Jacobi precond is one
    # einsum.  CG vectors are (p_rows, s_pt)+(3, s_gr): ~6x smaller.
    if formulation == "dual":
        sw_pt = jnp.sqrt(w_pt)
        sw_gr = jnp.sqrt(w_gr)
        phase0 = tuple((0, 0, 0) for _ in range(depth))
        import os as _os
        middle = _os.environ.get("NKSR_DUAL_MIDDLE", "gram")

        def dual_matvec(u):
            u_pt, u_gr = u
            if middle == "gram":
                # rows -> z0 -> C C^T z0 -> rows: stays in depth-0 row
                # space; skips both packed-coefficient cascades
                y_pt = jnp.einsum('rsl,rs->sl', b_pt,
                                  (sw_pt * u_pt).astype(cdt),
                                  preferred_element_type=f32)
                y_gr = jnp.einsum('rsl,rs->sl', b_gr,
                                  (sw_gr[None, :] * u_gr).astype(cdt),
                                  preferred_element_type=f32)
                z0 = jnp.zeros((n_c0, spec.lanes), f32)
                z0 = z0.at[slot_cell0_pt].add(
                    y_pt, indices_are_sorted=True, mode="drop")
                z0 = z0.at[slot_cell0_gr].add(
                    y_gr, indices_are_sorted=gr_sorted, mode="drop")
                av0 = jax.lax.optimization_barrier(
                    _gram_middle(spec, z0, phase0, cdt))
                av_pt = _take_rows_sorted(av0, slot_cell0_pt, True)
                av_gr = _take_rows_sorted(av0, slot_cell0_gr, gr_sorted)
                t_pt = jnp.einsum('rsl,sl->rs', b_pt, av_pt,
                                  preferred_element_type=f32)
                t_gr = jnp.einsum('rsl,sl->rs', b_gr, av_gr,
                                  preferred_element_type=f32)
            else:
                xs_ = apply_AT(sw_pt * u_pt, sw_gr[None, :] * u_gr)
                t_pt, t_gr = apply_A(xs_)
            return (sw_pt * t_pt + reg_weight * u_pt,
                    sw_gr[None, :] * t_gr + reg_weight * u_gr)

        rhs_d = (jnp.zeros((spec.p_rows, spec.s_pt), f32),
                 sw_gr[None, :] * jnp.swapaxes(gr_targets, 0, 1))
        rowsq_pt = jnp.sum(b_pt.astype(f32) ** 2, axis=-1)
        rowsq_gr = jnp.sum(b_gr.astype(f32) ** 2, axis=-1)
        diag_d = jax.lax.optimization_barrier(
            (w_pt * rowsq_pt + reg_weight,
             w_gr[None, :] * rowsq_gr + reg_weight))

        def precond_d(r):
            return jax.tree_util.tree_map(lambda ri, di: ri / di,
                                          r, diag_d)

        (u_pt, u_gr), it_d, res_d = run_solver(dual_matvec, rhs_d,
                                               precond_d)
        xs = apply_AT(sw_pt * u_pt, sw_gr[None, :] * u_gr)
        alphas = []
        for d in range(depth):
            cap = vox_cell[d].shape[0]
            rows = jnp.take(xs[d].reshape(-1, k), vox_cell[d], axis=0)
            rows = jnp.where(vox_active[d][:, None], rows, 0.0)
            alphas.append(rows.reshape(cap * k))
        out = (tuple(alphas),)
        if return_dense:
            out = out + (tuple(xs),)
        if return_stats:
            out = out + ((it_d, res_d),)
        return out if len(out) > 1 else out[0]

    # ---- primal formulation -----------------------------------------
    # rhs = A_g^T W_g targets (value rows have target 0)
    rhs = apply_AT(jnp.zeros((spec.p_rows, spec.s_pt), f32),
                   w_gr[None, :] * jnp.swapaxes(gr_targets, 0, 1))

    # Jacobi diagonal: sum_rows w * basis^2 per (cell, k) — the adjoint
    # cascade applied to the squared-basis row sums
    dz = jnp.zeros((n_c0, spec.lanes), f32)
    dz = dz.at[slot_cell0_pt].add(
        jnp.einsum('rsl,rs->sl', b_pt.astype(f32) ** 2, w_pt),
        indices_are_sorted=True, mode="drop")
    dz = dz.at[slot_cell0_gr].add(
        jnp.einsum('rsl,rs->sl', b_gr.astype(f32) ** 2,
                   w_gr[None].repeat(3, 0)),
        indices_are_sorted=gr_sorted, mode="drop")
    diag = jax.tree_util.tree_map(
        lambda a: a + reg_weight, _av0_adjoint_cascade(spec, dz))
    diag = jax.lax.optimization_barrier(diag)   # precond reads it per iter

    def precond(r):
        return jax.tree_util.tree_map(lambda ri, di: ri / di, r, diag)

    # CG leaves are PACKED flat buffers (n_d*k/128, 128): byte-identical
    # to flat (n_d*k,) in row-major order, but a native 128-lane tile —
    # every in-loop op (cascade matmuls, axpys, precond) is lane-exact
    xs0 = tuple(jnp.zeros((spec.n_cells(d) * k // 128, 128))
                for d in range(depth))
    rhs = jax.tree_util.tree_map(lambda r, x: r + 0.0 * x, rhs, xs0)
    xs, it_p, res_p = run_solver(matvec, rhs, precond)

    # extract per-voxel flat (cap_d * k,) coefficients
    alphas = []
    for d in range(depth):
        cap = vox_cell[d].shape[0]
        rows = jnp.take(xs[d].reshape(-1, k), vox_cell[d], axis=0)
        rows = jnp.where(vox_active[d][:, None], rows, 0.0)
        alphas.append(rows.reshape(cap * k))
    out = (tuple(alphas),)
    if return_dense:
        out = out + (tuple(xs),)
    if return_stats:
        out = out + ((it_p, res_p),)
    return out if len(out) > 1 else out[0]
