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
  out[x, y, z, 32*d + 16*i + 8*j + 4*l + kk]
      = coeff_d[(x>>d)+i, (y>>d)+j, (z>>d)+l, kk]
for corners (i, j, l) in {0,1}^3 and kk < k — exactly
`_av0_cascade`'s lane order (corner index c = 4i+2j+l, `_OFFS2`).

Grid: one step per depth-0 x-row.  Per step and depth the kernel reads
a (2, (Y0>>d)+1, Zd*k) coefficient window (pl.Element offsets — no
haloed copies), applies the z/corner expansion as one one-hot matmul on
the MXU, upsamples y by a row-broadcast reshape, and lane-places the
eight corners with static stores.  Out-of-range ancestor reads (last
row/col) hit the zero columns of the one-hot — equivalent to the XLA
path's zero-shifted windows everywhere an active cell can read (the
dense lattice keeps a >=2-cell inactive margin; plan_lattice).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ----------------------------------------------------------- constants
@functools.lru_cache(maxsize=None)
def _z_expand(zd: int, z0: int, k: int, d: int) -> np.ndarray:
    """(zd*k, z0*2*k) one-hot: column z*(2k) + l*k + kk reads row
    zc*k + kk where zc = (z>>d)+l (zero column when zc >= zd)."""
    m = np.zeros((zd * k, z0 * 2 * k), np.float32)
    for z in range(z0):
        for l in range(2):
            zc = (z >> d) + l
            if zc >= zd:
                continue
            for kk in range(k):
                m[zc * k + kk, (z * 2 + l) * k + kk] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _y_upsample(y0: int, d: int) -> np.ndarray:
    """(y0>>d, y0) one-hot transposed upsampler: U.T[yy>>d, yy] = 1 —
    used as rows @ U-style (sy, L) -> (y0, L) via U @ C with
    U[yy, yy>>d] = 1."""
    sy = y0 >> d
    u = np.zeros((y0, sy), np.float32)
    for yy in range(y0):
        u[yy, yy >> d] = 1.0
    return u


def _kernel_fwd(spec_dims, k: int, depth: int, out_dtype, upsample_mode,
                *refs):
    """pallas kernel body: refs = (in_0..in_{D-1}, zc_0..zc_{D-1},
    out_0..out_{4*depth-1}).

    Each output is one PLANAR (1, y0, z0*2k) buffer per (depth, corner
    group g = 2i+j) — stored whole, in one 2D store.  Mosaic cannot
    shape-cast the (y0, z0*2k) -> (y0, z0, 2k) minor split needed to
    interleave lanes in-kernel (and a per-z store loop makes Mosaic
    compile time explode at bench shapes), so the final (cells_0,
    lanes) interleave is ONE bandwidth-bound XLA pass in the caller."""
    ins = refs[:depth]
    zcs = refs[depth:2 * depth]
    outs = refs[2 * depth:]
    y0 = outs[0].shape[1]
    for d in range(depth):
        a3 = ins[d][:]                       # (2, ny_d, zd*k)
        zc = zcs[d][:]                       # (zd*k, z0*2k)
        # corner/z expansion on the MXU: (2, ny, zd*k) @ (zd*k, z0*2k)
        b = jax.lax.dot_general(
            a3, zc, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (2, ny, z0*2k)
        sy = y0 >> d
        for i in (0, 1):
            for j in (0, 1):
                c = b[i, j:j + sy, :]             # (sy, z0*2k)
                if d == 0:
                    p = c
                elif upsample_mode == "reshape":
                    f = 1 << d
                    p = jnp.broadcast_to(
                        c[:, None, :], (sy, f, c.shape[-1])
                    ).reshape(y0, c.shape[-1])
                else:
                    u = jnp.asarray(_y_upsample(y0, d), jnp.float32)
                    p = jax.lax.dot_general(
                        u, c, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                outs[4 * d + 2 * i + j][0] = p.astype(out_dtype)


def supports(spec) -> bool:
    """Static feasibility: the y-broadcast upsample needs y0 divisible
    by 2^(depth-1), and one x-row of output (the block) must fit VMEM
    comfortably alongside the coefficient windows (~16 MB/core)."""
    x0, y0, z0 = spec.dims[0]
    if y0 % (1 << (spec.depth - 1)):
        return False
    out_block = y0 * z0 * spec.lanes * 4          # f32 worst case
    # coefficient windows are padded to ny%8 (Mosaic block constraint);
    # the adjoint also keeps a (4, y0, z0*2k) f32 scratch resident
    wins = sum(2 * (-8 * (-((y0 >> d) + 1) // 8) + 1)
               * spec.dims[d][2] * spec.k * 4
               for d in range(spec.depth))
    wins += 4 * y0 * z0 * 2 * spec.k * 4
    # v5e VMEM is large enough for a double-buffered bench-scale row
    # (6.7 MB f32); the bound below is validated by
    # scripts/measure_pallas_cascade.py on the chip
    return 2 * (out_block + wins) < 48 * 2 ** 20


def _auto_interpret(interpret):
    """None -> interpreter on CPU backends (tests), Mosaic on TPU."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def av0_cascade_pallas(spec, xs: Sequence[jnp.ndarray], dtype,
                       upsample_mode: str = "reshape",
                       interpret=None) -> jnp.ndarray:
    """Fused (cells_0, depth*8k) support buffer — Pallas engine.

    ``xs``: per-depth PACKED flat coefficients (n_d*k/128, 128) (same
    convention as `_av0_cascade`).  Returns (cells_0, lanes) in
    ``dtype``.
    """
    depth, k = spec.depth, spec.k
    x0, y0, z0 = spec.dims[0]
    dense = []
    for d in range(depth):
        xd, yd, zd = spec.dims[d]
        # +1 zero row in x and y: the corner window of the last row
        # reads one past the end (the XLA path's zero-shifted windows).
        # y is padded further so the read WINDOW height is a multiple
        # of 8 — Mosaic requires a block's second-to-last dim to be
        # %8 (or the full array extent), and real plans' coarse dims
        # carry margins so ny != yd+1 (bench: (408..)/(208..)).
        ny8 = -8 * (-((y0 >> d) + 1) // 8)
        ypad = max(yd + 1, ny8) - yd
        dense.append(jnp.pad(xs[d].reshape(xd, yd, zd * k),
                             ((0, 1), (0, ypad), (0, 0))))
    zcs = [jnp.asarray(_z_expand(spec.dims[d][2], z0, k, d), jnp.float32)
           for d in range(depth)]

    in_specs = []
    for d in range(depth):
        xd, yd, zd = spec.dims[d]
        ny8 = -8 * (-((y0 >> d) + 1) // 8)
        # all dims must be Element (mixed Element/block specs are
        # rejected by current Mosaic); the z*k dim reads the full range
        in_specs.append(pl.BlockSpec(
            (pl.Element(2), pl.Element(ny8), pl.Element(zd * k)),
            (lambda x, dd=d: (x >> dd, 0, 0)),
            memory_space=pltpu.VMEM))
    for d in range(depth):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kern = functools.partial(_kernel_fwd, spec.dims, k, depth,
                             jnp.dtype(dtype), upsample_mode)
    planes = pl.pallas_call(
        kern,
        grid=(x0,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, y0, z0 * 2 * k),
                                lambda x: (x, 0, 0),
                                memory_space=pltpu.VMEM)] * (4 * depth),
        out_shape=[jax.ShapeDtypeStruct((x0, y0, z0 * 2 * k),
                                        jnp.dtype(dtype))] * (4 * depth),
        interpret=_auto_interpret(interpret),
    )(*dense, *zcs)
    # lane interleave (one fused XLA pass, ~2x the output bytes): plane
    # (d, g) holds lanes [8kd + 2kg, 8kd + 2k(g+1)) of each cell — the
    # concat order below IS the _av0_cascade lane order (_OFFS2)
    av0 = jnp.concatenate(
        [p.reshape(x0, y0, z0, 2 * k) for p in planes], axis=-1)
    return av0.reshape(spec.n_cells(0), spec.lanes)


# ------------------------------------------------------------- adjoint
def _kernel_adj(spec_dims, k: int, depth: int, upsample_mode, *refs):
    """Adjoint body: 4*depth PLANAR inputs (1, y0, z0*2k) f32 (one per
    (depth, corner group), de-interleaved from (cells_0, lanes) by one
    XLA pass in the caller — the mirror of _kernel_fwd's output
    layout) -> per-depth halo blocks (1, 2, ny_d, zd*k) f32
    (block-private; caller folds halos)."""
    planes = refs[:4 * depth]
    zcs = refs[4 * depth:5 * depth]
    outs = refs[5 * depth:]
    y0 = planes[0].shape[1]
    for d in range(depth):
        zc = zcs[d][:]                        # (zd*k, z0*2k)
        sy = y0 >> d
        # Mosaic has no scatter-add / pad primitives: build each i-row
        # with static concats (j=0 occupies rows [0, sy), j=1 rows
        # [1, sy+1)) and store with a static leading index.
        for i in (0, 1):
            acc_i = None
            for j in (0, 1):
                p = planes[4 * d + 2 * i + j][0]   # (y0, z0*2k)
                # contract z/corner first (K = z0*2k keeps the MXU
                # busy), THEN y-downsample the small (y0, zd*k) result
                c = jax.lax.dot_general(
                    p, zc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (y0, zd*k)
                if d > 0:
                    f = 1 << d
                    c = c.reshape(sy, f, c.shape[-1]).sum(axis=1)
                zrow = jnp.zeros((1, c.shape[-1]), jnp.float32)
                full = jnp.concatenate(([c, zrow] if j == 0 else
                                        [zrow, c]), axis=0)  # (ny, zdk)
                acc_i = full if acc_i is None else acc_i + full
            outs[d][0, i] = acc_i


def av0_adjoint_cascade_pallas(spec, z0_buf: jnp.ndarray,
                               interpret=None
                               ) -> Tuple[jnp.ndarray, ...]:
    """Adjoint of ``av0_cascade_pallas``: (cells_0, lanes) -> per-depth
    PACKED flat coefficient buffers (n_d*k/128, 128) f32."""
    depth, k = spec.depth, spec.k
    x0, y0, z0 = spec.dims[0]
    # de-interleave (cells_0, lanes) into 4*depth planar buffers (one
    # fused XLA pass; the mirror of av0_cascade_pallas's concat)
    z4 = z0_buf.reshape(x0, y0, z0, spec.lanes).astype(jnp.float32)
    planes = [
        z4[..., 2 * k * g:2 * k * (g + 1)].reshape(x0, y0, z0 * 2 * k)
        for g in range(4 * depth)]
    zcs = [jnp.asarray(_z_expand(spec.dims[d][2], z0, k, d), jnp.float32)
           for d in range(depth)]

    in_specs = [pl.BlockSpec((1, y0, z0 * 2 * k),
                             lambda x: (x, 0, 0),
                             memory_space=pltpu.VMEM)] * (4 * depth)
    for d in range(depth):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_specs, out_shapes = [], []
    for d in range(depth):
        ny = (y0 >> d) + 1
        zdk = spec.dims[d][2] * k
        out_specs.append(pl.BlockSpec((1, 2, ny, zdk),
                                      lambda x: (x, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((x0, 2, ny, zdk),
                                               jnp.float32))

    kern = functools.partial(_kernel_adj, spec.dims, k, depth, "reshape")
    halos = pl.pallas_call(
        kern,
        grid=(x0,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_auto_interpret(interpret),
    )(*planes, *zcs)

    # fold halo blocks into dense per-depth lattices:
    #   dense[(x>>d)+i, (y>>d... already folded to)+j...] — x rows first
    # collapse the f=2^d fine x-rows sharing an ancestor, then shift-add
    # the i=1 and j-trailing halos.
    outs = []
    for d in range(depth):
        xd, yd, zd = spec.dims[d]
        zdk = zd * k
        h = halos[d]                               # (x0, 2, ny, zdk)
        sy = y0 >> d
        ny = sy + 1
        if d > 0:
            f = 1 << d
            h = h.reshape(x0 >> d, f, 2, ny, zdk).sum(axis=1)
        sx = x0 >> d
        # rows (x>>d)+i: main part i=0 at rows [0, sx), halo i=1 at
        # rows [1, sx+1); contributions past the lattice edge are the
        # adjoint of zero-fill reads — dropped.
        main = h[:, 0]                             # (sx, ny, zdk)
        halo = h[:, 1]
        acc = jnp.zeros((xd, ny, zdk), jnp.float32)
        acc = acc.at[:sx].add(main)
        nh = min(sx + 1, xd) - 1
        acc = acc.at[1:nh + 1].add(halo[:nh])
        nc = min(ny, yd)
        dense = jnp.zeros((xd, yd, zdk), jnp.float32)
        dense = dense.at[:, :nc].add(acc[:, :nc])
        outs.append(dense.reshape(-1, 128))
    return tuple(outs)
