"""Dense-lattice UNet inference: the sparse-conv network as conv3d.

The sparse UNet (models/network.py) runs each 27-tap submanifold
convolution as 27 row gathers + matmuls; at 1M-point bench scale those
gathers cost ~3.5 s of the reconstruct (scripts/measure_e2e_phases.py).
On the dense solve lattice (fields/lattice.py planning) the SAME weights
evaluate as XLA 3-D convolutions — MXU-native, zero gathers:

  * features live on the per-depth dense lattices; inactive cells are
    zeroed after every masked GroupNorm, which makes the dense program
    EXACTLY equal to the submanifold semantics (a sparse conv reads 0
    for absent neighbors; here absent cells hold 0 by construction);
  * stride-2 down/up convolutions are reshape-einsums between nested
    lattices (zero-phase origins make local parent/child index maps the
    plain l >> 1 / 2l + o, see plan_lattice);
  * the heads gather once per depth at the voxel lists.

Numerical parity with the sparse UNet is pinned by
tests/test_pipeline.py::TestDenseUNet (same params, same outputs to f32
tolerance).  Used by the Reconstructor host path when the lattice plan
exists (NKSR_DENSE_UNET gates it).

Reference contract served: ``network.unet(feat, enc_svh, ...)``
(/root/reference/models/nksr_net.py:74-78) under teacher forcing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class DenseUNetTables(NamedTuple):
    """Host-built dense index tables (all (cap,) int32 into per-depth
    dense lattices; pad rows clamp to 0 and are masked by *_active)."""
    enc_cell: Tuple[jnp.ndarray, ...]     # per depth: encoder voxel cells
    enc_active: Tuple[jnp.ndarray, ...]
    dec_cell: Tuple[jnp.ndarray, ...]     # per depth: decoder voxel cells
    dec_active: Tuple[jnp.ndarray, ...]


def build_tables(spec, origins, enc_grids, enc_caps, dec_grids, dec_caps):
    """Map voxel coordinate lists to dense lattice cells (host numpy)."""
    from ..native import flat_cells

    def cells(grids, caps):
        out_c, out_a = [], []
        for d in range(spec.depth):
            cap = caps[d]
            n = min(len(grids[d].keys), cap)
            c = np.zeros((cap, 3), np.int64)
            c[:n] = grids[d].coords[:n]
            out_c.append(jnp.asarray(
                flat_cells(c, 0, origins[d], spec.dims[d])))
            a = np.zeros(cap, bool)
            a[:n] = True
            out_a.append(jnp.asarray(a))
        return tuple(out_c), tuple(out_a)

    ec, ea = cells(enc_grids, enc_caps)
    if dec_grids is enc_grids:
        dc, da = ec, ea
    else:
        dc, da = cells(dec_grids, dec_caps)
    return DenseUNetTables(enc_cell=ec, enc_active=ea,
                           dec_cell=dc, dec_active=da)


# ------------------------------------------------------------- primitives
def _conv27(x, w27, b, dims, cdt):
    """Submanifold 27-tap conv as conv3d.  x: (cells, Cin) dense-flat;
    w27: (27, Cin, Cout) in stencil_offsets(3) tap order (offset o ->
    tap ((ox+1)*3+(oy+1))*3+(oz+1)), which IS the row-major (3,3,3)
    kernel layout of a SAME-padded cross-correlation.

    Output stays in ``cdt``: with bf16 compute the f32 conv output paid
    a doubled write stream per conv (~10 ms each at the 1M-point bench);
    the MXU still accumulates in f32 internally, and GroupNorm computes
    its statistics in f32 regardless of activation dtype."""
    X, Y, Z = dims
    cin, cout = w27.shape[1], w27.shape[2]
    k = w27.reshape(3, 3, 3, cin, cout).astype(cdt)
    out = jax.lax.conv_general_dilated(
        x.reshape(1, X, Y, Z, cin).astype(cdt), k,
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        preferred_element_type=cdt)
    return out.reshape(X * Y * Z, cout) + b.astype(cdt)


def _group_norm(x, mask, scale, bias, num_groups=8):
    """MaskedGroupNorm (models/network.py) on dense-flat features.

    Statistics accumulate in f32 even for bf16 activations (an 8.6M-row
    bf16 sum would lose the mean to cancellation); the normalization is
    applied elementwise in the activation dtype."""
    f32 = jnp.float32
    c = x.shape[-1]
    g = min(num_groups, c)
    xg = x.reshape(x.shape[0], g, c // g)
    m32 = mask[:, None, None].astype(f32)
    n = jnp.maximum(jnp.sum(m32) * (c // g), 1.0)
    xg32 = xg.astype(f32)
    mean = jnp.sum(xg32 * m32, axis=(0, 2), keepdims=True) / n
    var = jnp.sum(((xg32 - mean) ** 2) * m32, axis=(0, 2),
                  keepdims=True) / n
    inv = jax.lax.rsqrt(var + 1e-5)
    xg = (xg - mean.astype(x.dtype)) * inv.astype(x.dtype)
    x = xg.reshape(x.shape)
    return jnp.where(mask[:, None],
                     x * scale.astype(x.dtype) + bias.astype(x.dtype),
                     jnp.zeros((), x.dtype))


def _conv_block(p, x, mask, dims, cdt):
    h = _conv27(x, p["SparseConv_0"]["kernel"], p["SparseConv_0"]["bias"],
                dims, cdt)
    h = jax.nn.silu(_group_norm(h, mask, p["MaskedGroupNorm_0"]["scale"],
                                p["MaskedGroupNorm_0"]["bias"]))
    h = _conv27(h, p["SparseConv_1"]["kernel"], p["SparseConv_1"]["bias"],
                dims, cdt)
    h = jax.nn.silu(_group_norm(h, mask, p["MaskedGroupNorm_1"]["scale"],
                                p["MaskedGroupNorm_1"]["bias"]))
    if x.shape[-1] == h.shape[-1]:
        h = h + x
    return jnp.where(mask[:, None], h, 0.0)


def _down(x_f, w8, b, dims_f, dims_c, cdt):
    """Stride-2 child-gather conv: out_c[p] = sum_o x_f[2p+o] @ w8[o]
    (child_offsets order o = ox*4+oy*2+oz = row-major (2,2,2))."""
    xf, yf, zf = dims_f
    xc, yc, zc = dims_c
    cin = x_f.shape[-1]
    a = x_f.reshape(xf, yf, zf, cin)
    a = jnp.pad(a, ((0, 2 * xc - xf), (0, 2 * yc - yf),
                    (0, 2 * zc - zf), (0, 0)))
    a = a.reshape(xc, 2, yc, 2, zc, 2, cin)
    k = w8.reshape(2, 2, 2, cin, -1).astype(cdt)
    out = jnp.einsum("xaybzci,abcio->xyzo", a.astype(cdt), k,
                     preferred_element_type=cdt)
    return out.reshape(xc * yc * zc, -1) + b.astype(cdt)


def _up(x_c, w8, dims_c, dims_f, cdt):
    """Transposed stride-2: child l takes parent l>>1 through the
    octant-(l&1 bits) weight (zero-phase origins make local == world
    octants; models/network.py up_<d>)."""
    xc, yc, zc = dims_c
    xf, yf, zf = dims_f
    cin = x_c.shape[-1]
    k = w8.reshape(2, 2, 2, cin, -1).astype(cdt)
    y = jnp.einsum("pi,abcio->pabco", x_c.astype(cdt), k,
                   preferred_element_type=cdt)
    cout = y.shape[-1]
    y = y.reshape(xc, yc, zc, 2, 2, 2, cout)
    y = jnp.moveaxis(y, (3, 4, 5), (1, 3, 5))     # (xc,2,yc,2,zc,2,C)
    y = y.reshape(2 * xc, 2 * yc, 2 * zc, cout)
    return y[:xf, :yf, :zf].reshape(xf * yf * zf, cout)


def _dense_head(p, rows):
    return rows @ p["kernel"] + p["bias"]


def _shift_read(a: jnp.ndarray, d, fill=0.0) -> jnp.ndarray:
    """out[i] = a[i + d] over the leading 3 axes (reads beyond -> fill)."""
    out = a
    for ax, s in enumerate(d):
        if s == 0:
            continue
        n = out.shape[ax]
        pad = [(0, 0)] * out.ndim
        sl = [slice(None)] * out.ndim
        if s > 0:
            sl[ax] = slice(s, None)
            pad[ax] = (0, s)
        else:
            sl[ax] = slice(0, n + s)
            pad[ax] = (-s, 0)
        out = jnp.pad(out[tuple(sl)], pad, constant_values=fill)
    return out


def packed_corner_splat(dims, loc, blocks, indices_sorted: bool
                        ) -> jnp.ndarray:
    """Trilinear 8-corner scatter-add as ONE wide-row scatter + 8 dense
    shifted adds.

    ``loc``: (N, 3) BASE cell local coords (out-of-grid rows drop — pad
    tails and masked rows must carry zero blocks).  ``blocks``: (N, 8, W)
    per-corner rows, already weighted.  Returns (X*Y*Z, W) accumulated.

    Why: the naive form is 8 scatters of W-wide rows (8N indexed rows);
    TPU scatter cost is per ROW, and narrow rows pay ~134 ns vs ~23 ns
    for 128-lane rows (BASELINE.md microbenchmarks) — measured 871 ms of
    the 1.5 s dense UNet at the 1M-point bench.  Packing all 8 corner
    blocks of a point into one (8W)-wide row keyed by the BASE cell cuts
    indexed rows 8x; corner placement then becomes 8 dense shifted adds
    (out[c] += buf[c - off, o]), a streaming pass XLA fuses.  Corner
    contributions that would land outside the grid are never read —
    exactly the per-corner bounds drop of the naive form (bases of live
    points are in-grid by plan construction)."""
    X, Y, Z = dims
    nc = X * Y * Z
    n, _, w = blocks.shape
    # pad the per-corner block so the scattered row width is a power of
    # two >= 64: measured per-row scatter cost at 1M sorted rows is
    # 214 ns (W=56) / 176 (32) / 158 (24) vs 69 (64) / 51 (128) — the
    # sub-64 / non-pow2 widths fall off a cliff
    wp = max(8, 1 << int(np.ceil(np.log2(w))))
    if w < wp:
        blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, wp - w)))
    ok = jnp.all((loc >= 0) & (loc < jnp.asarray([X, Y, Z])), axis=-1)
    bid = jnp.where(ok, (loc[:, 0] * Y + loc[:, 1]) * Z + loc[:, 2], nc)
    buf = jnp.zeros((nc + 1, 8 * wp)).at[bid].add(
        blocks.reshape(n, 8 * wp), mode="drop",
        indices_are_sorted=indices_sorted)
    buf = buf[:-1].reshape(X, Y, Z, 8, wp)
    offs = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                    -1).reshape(8, 3)
    acc = None
    for o in range(8):
        part = _shift_read(buf[:, :, :, o, :],
                           tuple(-int(v) for v in offs[o]))
        acc = part if acc is None else acc + part
    return acc.reshape(nc, wp)[:, :w]


def encode_points(cfg, params, dims, origins, xyz, point_feat, point_mask,
                  base0=None, splat_sorted: bool = False):
    """Point encoder on the depth-0 dense lattice: trilinear 8-corner
    splat of (features, offsets, density) + the 2-layer MLP.

    ``base0``: host-computed depth-0 base cells (int32, WORLD coords) —
    preferred over the device ``floor(xyz / voxel_size)``: the host plan
    (host_build/pack64 sort, fields/lattice flat cells) is built from the
    numpy floor, and a boundary-point rounding divergence between numpy
    and XLA f32 division would silently mis-scatter.  Passing the plan's
    own cells makes host and device agree by construction.

    ``splat_sorted``: caller guarantees points are depth-0-cell-sorted
    with the pad tail mapped past the lattice end, turning each of the 8
    per-corner scatters into a sorted scatter (measured 884 ms -> sorted
    rows at bench scale, BASELINE.md round-2 split).
    """
    enc = params["params"]["encoder"]
    voxel_size = cfg.voxel_size
    g = xyz / voxel_size
    if base0 is None:
        base = jnp.floor(g).astype(jnp.int32)
    else:
        base = base0
    frac = g - base.astype(jnp.float32)
    offs = jnp.asarray(np.stack(np.meshgrid(*([np.arange(2)] * 3),
                                            indexing="ij"),
                                -1).reshape(8, 3), jnp.int32)
    corner = base[:, None, :] + offs[None]
    w = jnp.prod(jnp.where(offs[None].astype(bool), frac[:, None, :],
                           1.0 - frac[:, None, :]), axis=-1)
    X, Y, Z = dims[0]
    nc0 = X * Y * Z
    wm = jnp.where(point_mask[:, None], w, 0.0)
    offset = (xyz[:, None, :]
              - corner.astype(jnp.float32) * voxel_size) / voxel_size
    pf = point_feat if point_feat is not None else \
        jnp.zeros((xyz.shape[0], 0))
    raw = jnp.concatenate([
        jnp.broadcast_to(pf[:, None, :],
                         (xyz.shape[0], 8, pf.shape[-1])), offset], -1)
    # ONE wide-row scatter keyed by the base cell + 8 dense shifted adds
    # (packed_corner_splat) — narrow per-corner scatters paid per-row
    # cost 8x over (measured 871 ms of the dense UNet at bench scale)
    rw = raw * wm[..., None]
    blocks = jnp.concatenate([rw, wm[..., None]], axis=-1)  # (N, 8, C+1)
    acc3 = packed_corner_splat(dims[0], base - origins[0][None, :],
                               blocks, splat_sorted)
    vox = acc3[:, :-1] / (acc3[:, -1:] + 1e-8)
    wsum_flat = acc3[:, -1]
    density = jnp.log1p(wsum_flat)[:, None]
    h = jnp.concatenate([vox, density], axis=-1)
    h = jax.nn.silu(h @ enc["Dense_0"]["kernel"] + enc["Dense_0"]["bias"])
    return h @ enc["Dense_1"]["kernel"] + enc["Dense_1"]["bias"]


# ------------------------------------------------------------ full forward
def dense_unet_apply(cfg, params, spec, origins, tables: DenseUNetTables,
                     xyz, point_feat, point_mask, splat_sorted=False,
                     base0=None):
    """Encoder + UNet + heads on the dense lattice (teacher-forced
    structure: decoder == the provided dec voxel lists).

    Returns (basis_features, normal_features, structure_features,
    udf_features) with the SAME per-voxel row layouts as the sparse
    ``NKSRNetwork`` outputs.
    """
    depth = spec.depth
    cdt = jnp.dtype(cfg.conv_dtype)
    up = params["params"]["unet"]

    # dense occupancy masks from the voxel lists
    occ = []
    for d in range(depth):
        m = jnp.zeros((spec.n_cells(d),), bool).at[
            tables.enc_cell[d]].max(tables.enc_active[d], mode="drop")
        occ.append(m)

    # ---------------- encoder: trilinear point splat + MLP --------------
    h = encode_points(cfg, params, spec.dims, origins, xyz, point_feat,
                      point_mask, base0=base0, splat_sorted=splat_sorted)
    f = jnp.where(occ[0][:, None], h, 0.0).astype(cdt)

    # ---------------- encoder path ---------------------------------------
    enc_feats = []
    for d in range(depth):
        f = _conv_block(up[f"enc_{d}"], f, occ[d], spec.dims[d], cdt)
        enc_feats.append(f)
        if d < depth - 1:
            f = _down(f, up[f"down_{d}"], up[f"down_b_{d}"],
                      spec.dims[d], spec.dims[d + 1], cdt)
            f = jnp.where(occ[d + 1][:, None], f, 0.0)

    # ---------------- decoder path (teacher-forced: cand == enc grids) ---
    basis_feats: list = [None] * depth
    normal_feats: list = [None] * depth
    struct_feats: list = [None] * depth
    udf_feats: list = [None] * depth
    g = enc_feats[depth - 1]
    for d in range(depth - 1, -1, -1):
        g = _conv_block(up[f"dec_{d}"], g, occ[d], spec.dims[d], cdt)
        # heads: gather rows once per depth, then small matmuls
        cand_rows = jnp.take(g, tables.enc_cell[d], axis=0)
        cand_rows = jnp.where(tables.enc_active[d][:, None], cand_rows, 0.)
        struct_feats[d] = _dense_head(up[f"struct_{d}"], cand_rows)
        udf_feats[d] = _dense_head(up[f"udf_{d}"], cand_rows)
        if tables.dec_cell[d] is tables.enc_cell[d]:
            dec_rows = cand_rows
            dec_act = tables.enc_active[d]
        else:
            dec_rows = jnp.take(g, tables.dec_cell[d], axis=0)
            dec_act = tables.dec_active[d]
            dec_rows = jnp.where(dec_act[:, None], dec_rows, 0.0)
        basis_feats[d] = _dense_head(up[f"basis_{d}"], dec_rows)
        nf = _dense_head(up[f"normal_{d}"], dec_rows)
        normal_feats[d] = jnp.where(dec_act[:, None], nf, 0.0)
        if d > 0:
            h = _up(g, up[f"up_{d}"], spec.dims[d], spec.dims[d - 1], cdt)
            g = jnp.where(occ[d - 1][:, None],
                          h + enc_feats[d - 1], 0.0)
    return (tuple(basis_feats), tuple(normal_feats),
            tuple(struct_feats), tuple(udf_feats))
