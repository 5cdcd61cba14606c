"""Pallas TPU kernels for the fused-AV0 lattice cascade.

The CG matvec's dominant phase is building the fused support buffer
``av0`` (cells_0, depth*8k) from per-depth coefficient lattices and the
adjoint path back (see fields/lattice.py `_av0_cascade` /
`_av0_adjoint_cascade`).  The XLA formulation streams every intermediate
level through HBM (measured 66.8 ms/apply at bench scale vs a ~2 ms
write bound for its 1.36 GB output).  These kernels produce each output
tile directly from the (small) per-depth coefficient windows it needs,
in one pass: HBM traffic = one read of the coefficients + one write of
the output.

Reference contract: csrc/kernel_eval.cu evaluates the multi-level
kernel field by walking each query's ancestor voxels; here the dense
zero-phase nesting (cell_d = cell_0 >> d, plan_lattice) turns that walk
into static window reads, which is what makes a TPU tiling possible.

Layout per depth d (all static):
  out[x, y, z, 8k*d + 4k*i + 2k*j + k*l + kk]
      = coeff_d[(x>>d)+i, (y>>d)+j, (z>>d)+l, kk]
for corners (i, j, l) in {0,1}^3 and kk < k — exactly
`_av0_cascade`'s lane order (corner index c = 4i+2j+l, `_OFFS2`).

Design (third iteration, each forced by a measured failure):
  1. A planar per-(depth, corner-group) output layout needed a final
     (cells_0, lanes) interleave pass.  Any XLA expression of that
     interleave materializes arrays with minor dim 2k=8, which the TPU
     (8, 128) tile layout pads 16x — 21.8 GB of HLO temps at the 1M-pt
     bench plan (HBM OOM).  So the kernels place lanes IN-KERNEL: the
     z/corner expansion one-hots map straight into final lane positions
     (column z*lanes + 8k*d + ...), and the kernel output is the final
     (x0, y0, z0*lanes) buffer — reshaping that to (cells_0, lanes) is
     a pure bitcast (minor dim stays z0*lanes).
  2. Holding full (y0, z0*lanes) rows for all depths at once blew the
     ~16 MB scoped-VMEM stack at bench shapes (22.3 MB, compile-time
     OOM), so the grid is blocked over y as well: (x0, y0/h, depth).
  3. One kernel per depth would write the output (or, on the adjoint,
     read it) depth times over.  Instead depth is the INNERMOST grid
     axis with the output block's index map constant in it: the block
     stays resident in VMEM across the depth steps, each depth
     accumulates its disjoint lanes (`@pl.when(d == dd)` branches keep
     every shape static), and the buffer is written back to HBM once.

Coefficient windows are tiny ((2, (h>>d)+1, zd*k) per block) and read
via pl.Element offsets — no haloed copies.  Out-of-range ancestor
reads (last row/col) hit zero padding / zero one-hot columns —
equivalent to the XLA path's zero-shifted windows everywhere an active
cell can read (the dense lattice keeps a >=2-cell inactive margin;
plan_lattice).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))   # g = 2i + j
# Mosaic scoped-VMEM stack budget per kernel invocation (measured ~16 MB
# usable on v5e; blocks are double-buffered so each counts twice).
_VMEM_LIMIT = 14 * 2 ** 20


# ----------------------------------------------------------- constants
@functools.lru_cache(maxsize=None)
def _zc4(zd: int, z0: int, k: int, d: int, lanes: int) -> np.ndarray:
    """(4*zd*k, z0*lanes) one-hot: row-block g = 2i+j; row zc*k + kk
    maps to FINAL lane column z*lanes + 8k*d + (4i+2j+l)*k + kk where
    zc = (z>>d)+l (zero column when zc >= zd — the z edge)."""
    m = np.zeros((4 * zd * k, z0 * lanes), np.float32)
    for g, (i, j) in enumerate(_CORNERS):
        base = g * zd * k
        for z in range(z0):
            for l in (0, 1):
                zc = (z >> d) + l
                if zc >= zd:
                    continue
                for kk in range(k):
                    m[base + zc * k + kk,
                      z * lanes + 8 * k * d + (4 * i + 2 * j + l) * k
                      + kk] = 1.0
    return m


def _pad8(n: int) -> int:
    return -8 * (-n // 8)


def _pick_h(spec, nb_out: int, nb_zc: int) -> Optional[int]:
    """Largest y-block height h that (a) divides y0, (b) is a multiple
    of lcm(8, 2^(depth-1)) (Mosaic sublane alignment + the broadcast
    y-upsample), and (c) keeps the worst per-invocation VMEM under the
    scoped-stack budget."""
    x0, y0, z0 = spec.dims[0]
    W = z0 * spec.lanes
    align = max(8, 1 << (spec.depth - 1))
    cands = [h for h in range(align, y0 + 1, align) if y0 % h == 0]
    zc_tot = sum(4 * spec.dims[d][2] * spec.k * W * nb_zc
                 for d in range(spec.depth))
    for h in sorted(cands, reverse=True):
        win = sum(2 * 2 * _pad8((h >> d) + 1) * spec.dims[d][2]
                  * spec.k * nb_zc for d in range(spec.depth))
        halo = sum(2 * 2 * ((h >> d) + 1) * spec.dims[d][2]
                   * spec.k * 4 for d in range(spec.depth))
        zdk0 = spec.dims[0][2] * spec.k
        # fwd: out block (dbl-buf) + one-hots + windows + f32 matmul temp
        fwd = 2 * h * W * nb_out + zc_tot + win + h * W * 4 \
            + h * 4 * zdk0 * 4
        # adj: z4 in block (dbl-buf) + one-hots + halo outs + f32 temps
        adj = 2 * h * W * nb_out + zc_tot + halo + h * 4 * zdk0 * 4 \
            + h * W * 2
        if max(fwd, adj) < _VMEM_LIMIT:
            return h
    return None


def supports(spec, dtype=jnp.bfloat16) -> bool:
    """Static feasibility of the fused cascade kernels for this plan +
    compute dtype (fall back to the XLA cascade otherwise)."""
    x0, y0, z0 = spec.dims[0]
    align = 1 << (spec.depth - 1)
    if x0 % align or y0 % align:
        return False
    if (z0 * spec.lanes) % 128:
        return False
    nb = jnp.dtype(dtype).itemsize
    return _pick_h(spec, nb, nb) is not None


def _auto_interpret(interpret):
    """None -> interpreter on CPU backends (tests), Mosaic on TPU."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


# ------------------------------------------------------------- forward
def _kernel_fwd(depth: int, h: int, out_dtype, *refs):
    """Grid (x0, y0/h, depth), depth innermost.  refs = (in_0..in_{D-1},
    zc_0..zc_{D-1}, out).  The out block's index map is constant in the
    depth axis, so it stays VMEM-resident while every depth accumulates
    its own (disjoint) lanes; one HBM write per (x, y-block)."""
    ins = refs[:depth]
    zcs = refs[depth:2 * depth]
    out = refs[2 * depth]
    d = pl.program_id(2)
    for dd in range(depth):
        @pl.when(d == dd)
        def _(dd=dd):
            a3 = ins[dd][:]                  # (2, ny8, zd*k)
            sy = h >> dd
            # corner groups g = 2i+j: x-shift picks plane i, y-shift
            # slices rows [j, j+sy); concat along K so ONE matmul does
            # all four lane placements.
            acat = jnp.concatenate(
                [a3[i, j:j + sy, :] for (i, j) in _CORNERS], axis=-1)
            b = jax.lax.dot_general(
                acat, zcs[dd][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (sy, z0*lanes)
            if dd:
                f = 1 << dd
                b = jnp.broadcast_to(
                    b[:, None, :], (sy, f, b.shape[-1])
                ).reshape(h, b.shape[-1])
            b = b.astype(out_dtype)
            if dd == 0:
                out[0] = b
            else:
                out[0] += b                  # disjoint lanes: exact


def _check_h_override(spec, h: int) -> int:
    """Validate a test-only y-block-height override (must divide y0 and
    respect the sublane/upsample alignment `_pick_h` enforces)."""
    y0 = spec.dims[0][1]
    align = max(8, 1 << (spec.depth - 1))
    if y0 % h or h % align:
        raise ValueError(f"h_override {h} invalid for y0={y0}, "
                         f"align={align}")
    return h


def av0_cascade_pallas(spec, xs: Sequence[jnp.ndarray], dtype,
                       interpret=None, h_override=None) -> jnp.ndarray:
    """Fused (cells_0, depth*8k) support buffer — Pallas engine.

    ``xs``: per-depth PACKED flat coefficients (n_d*k/128, 128) (same
    convention as `_av0_cascade`).  Returns (cells_0, lanes) in
    ``dtype``.  ``h_override`` (tests only) forces the y-block height so
    the multi-block path (nyb>1) is reachable on small specs.
    """
    depth, k = spec.depth, spec.k
    x0, y0, z0 = spec.dims[0]
    W = z0 * spec.lanes
    cdt = jnp.dtype(dtype)
    h = _pick_h(spec, cdt.itemsize, cdt.itemsize) \
        if h_override is None else _check_h_override(spec, h_override)
    if h is None or (W % 128) or x0 % (1 << (depth - 1)):
        raise ValueError("plan shape unsupported by the Pallas cascade "
                         "(gate with supports())")
    nyb = y0 // h
    ins, in_specs = [], []
    for d in range(depth):
        xd, yd, zd = spec.dims[d]
        ny8 = _pad8((h >> d) + 1)
        # zero-pad: +1 x-row (corner window of the last row), and y up
        # to the furthest padded window read.
        ypad = max((nyb - 1) * (h >> d) + ny8, yd + 1) - yd
        dense = jnp.pad(xs[d].reshape(xd, yd, zd * k),
                        ((0, 1), (0, ypad), (0, 0))).astype(cdt)
        ins.append(dense)
        in_specs.append(pl.BlockSpec(
            (pl.Element(2), pl.Element(ny8), pl.Element(zd * k)),
            (lambda x, t, d_, dd=d: (x >> dd, t * (h >> dd), 0)),
            memory_space=pltpu.VMEM))
    zcs = [jnp.asarray(_zc4(spec.dims[d][2], z0, k, d, spec.lanes),
                       cdt) for d in range(depth)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * depth

    kern = functools.partial(_kernel_fwd, depth, h, cdt)
    av0 = pl.pallas_call(
        kern,
        grid=(x0, nyb, depth),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, W), lambda x, t, d: (x, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x0, y0, W), cdt),
        interpret=_auto_interpret(interpret),
    )(*ins, *zcs)
    # (x0, y0, z0*lanes) -> (cells_0, lanes): minor dim stays a lane
    # multiple — a pure bitcast, no relayout.
    return av0.reshape(spec.n_cells(0), spec.lanes)


# ------------------------------------------------------------- adjoint
def _kernel_adj(depth: int, h: int, zdks: Tuple[int, ...], *refs):
    """Grid (x0, y0/h, depth), depth innermost.  refs = (z4, zcT_0..
    zcT_{D-1}, out_0..out_{D-1}).  The z4 input block's index map is
    constant in depth — fetched once per (x, y-block), every depth
    contracts it against its own lane-selection one-hot.  Each depth's
    halo block is block-private; the caller folds x/y/i overlaps."""
    z4 = refs[0]
    zcTs = refs[1:1 + depth]
    outs = refs[1 + depth:]
    d = pl.program_id(2)
    for dd in range(depth):
        @pl.when(d == dd)
        def _(dd=dd):
            zdk = zdks[dd]
            sy = h >> dd
            p = z4[0]                             # (h, z0*lanes)
            c4 = jax.lax.dot_general(
                p, zcTs[dd][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (h, 4*zdk)
            if dd:
                f = 1 << dd
                c4 = c4.reshape(sy, f, 4 * zdk).sum(axis=1)
            # Mosaic has no scatter-add/pad: build each i-row with
            # static concats (j=0 occupies rows [0, sy), j=1 rows
            # [1, sy+1)) and store with static leading indices.
            zrow = jnp.zeros((1, zdk), jnp.float32)
            for i in (0, 1):
                acc = None
                for j in (0, 1):
                    g = 2 * i + j
                    c = c4[:, g * zdk:(g + 1) * zdk]       # (sy, zdk)
                    full = jnp.concatenate(
                        [c, zrow] if j == 0 else [zrow, c], axis=0)
                    acc = full if acc is None else acc + full
                outs[dd][0, 0, i] = acc


def av0_adjoint_cascade_pallas(spec, z0_buf: jnp.ndarray,
                               interpret=None, compute_dtype=None,
                               h_override=None
                               ) -> Tuple[jnp.ndarray, ...]:
    """Adjoint of ``av0_cascade_pallas``: (cells_0, lanes) -> per-depth
    PACKED flat coefficient buffers (n_d*k/128, 128) f32.

    ``compute_dtype``: dtype z is read at inside the kernel (the solve
    passes its cdt; bf16 halves the dominant HBM read and matches the
    forward's bf16 placement rounding).  Accumulation is always f32.
    ``h_override``: tests only — see ``av0_cascade_pallas``.
    """
    depth, k = spec.depth, spec.k
    x0, y0, z0 = spec.dims[0]
    W = z0 * spec.lanes
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else z0_buf.dtype
    h = _pick_h(spec, cdt.itemsize, cdt.itemsize) \
        if h_override is None else _check_h_override(spec, h_override)
    if h is None or (W % 128) or x0 % (1 << (depth - 1)):
        raise ValueError("plan shape unsupported by the Pallas cascade "
                         "(gate with supports())")
    nyb = y0 // h
    z4 = z0_buf.reshape(x0, y0, W).astype(cdt)
    zcTs = [jnp.asarray(_zc4(spec.dims[d][2], z0, k, d, spec.lanes).T,
                        cdt) for d in range(depth)]
    zdks = tuple(spec.dims[d][2] * k for d in range(depth))

    in_specs = [pl.BlockSpec((1, h, W), lambda x, t, d: (x, t, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * depth
    out_specs, out_shapes = [], []
    for d in range(depth):
        sy = h >> d
        out_specs.append(pl.BlockSpec(
            (1, 1, 2, sy + 1, zdks[d]),
            (lambda x, t, d_: (x, t, 0, 0, 0)),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (x0, nyb, 2, sy + 1, zdks[d]), jnp.float32))

    kern = functools.partial(_kernel_adj, depth, h, zdks)
    halos = pl.pallas_call(
        kern,
        grid=(x0, nyb, depth),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_auto_interpret(interpret),
    )(z4, *zcTs)

    # fold halo blocks into dense per-depth lattices: collapse the
    # f=2^d fine x-rows sharing an ancestor, stitch y-blocks (adjacent
    # blocks share one ancestor row), then shift-add the i=1 / j=1
    # halos; contributions past the lattice edge are the adjoint of
    # zero-fill reads — dropped.
    outs = []
    for d in range(depth):
        xd, yd, zd = spec.dims[d]
        zdk = zdks[d]
        sy = h >> d
        blk = halos[d]                       # (x0, nyb, 2, sy+1, zdk)
        if d:
            f = 1 << d
            blk = blk.reshape(x0 >> d, f, nyb, 2, sy + 1, zdk).sum(1)
        ny_tot = (y0 >> d) + 1
        accy = jnp.zeros((blk.shape[0], 2, ny_tot, zdk), jnp.float32)
        for t in range(nyb):
            accy = accy.at[:, :, t * sy:t * sy + sy + 1].add(blk[:, t])
        sx = x0 >> d
        main, halo = accy[:, 0], accy[:, 1]
        acc = jnp.zeros((xd, ny_tot, zdk), jnp.float32)
        acc = acc.at[:sx].add(main)
        nh = min(sx + 1, xd) - 1
        acc = acc.at[1:nh + 1].add(halo[:nh])
        nc = min(ny_tot, yd)
        dense = jnp.zeros((xd, yd, zdk), jnp.float32)
        dense = dense.at[:, :nc].add(acc[:, :nc])
        outs.append(dense.reshape(-1, 128))
    return tuple(outs)
