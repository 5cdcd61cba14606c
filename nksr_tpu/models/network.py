"""The NKSR network, TPU-native: point encoder + structure-predicting
sparse-conv UNet + kernel interpolators + sdf/udf decoders.

Rebuilds the (unvendored) reference wheel's ``NKSRNetwork`` from its usage
contract (/root/reference/models/nksr_net.py:34-38,73-78,92-139; hparams at
/root/reference/configs/default/train.yaml:8-30):

  * ``encoder(xyz, feat, svh, 0)``  -> per-voxel features at the finest level
  * ``unet(feat, enc_svh, adaptive_depth, gt_decoder_svh)``
        -> (features, dec_svh, udf_svh) where the UNet *predicts the decoder
           hierarchy itself* (teacher-forced from the GT hierarchy during the
           structure schedule)
  * ``interpolators``  -> per-depth learned kernel basis MLPs
  * ``sdf_decoder`` / ``udf_decoder``  -> MLP heads for neural fields

TPU-first design: every grid has a static capacity; pruning/subdivision are
masked sorted-set operations (core.coords), convolutions are neighbor-table
gathers + MXU matmuls (ops.gather_scatter), and the whole forward is a
single static-shape XLA program — no host sync, no dynamic allocation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..core.grid import SparseGrid, point_splat_coords
from ..core.svh import SparseFeatureHierarchy, VOXEL_REFINED
from ..ops import gather_scatter as gs


def _glorot():
    return nn.initializers.glorot_uniform()


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics ignore padding voxels."""
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = min(self.num_groups, c)
        xg = x.reshape(x.shape[0], g, c // g)
        m = mask[:, None, None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(m) * (c // g), 1.0)
        mean = jnp.sum(xg * m, axis=(0, 2), keepdims=True) / n
        var = jnp.sum(((xg - mean) ** 2) * m, axis=(0, 2), keepdims=True) / n
        xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
        x = xg.reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return jnp.where(mask[:, None], x * scale + bias, 0.0)


class SparseConv(nn.Module):
    """Submanifold sparse conv over a precomputed neighbor table.

    ``compute_dtype='bfloat16'`` runs the gathers + MXU matmuls in bf16
    (half the HBM traffic, native MXU rate) with f32 accumulation;
    params and outputs stay f32.
    """
    features: int
    taps: int = 27
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", _glorot(),
                       (self.taps, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = jnp.dtype(self.compute_dtype)
        if dt != x.dtype:
            return gs.gather_conv(x.astype(dt), nbr, w.astype(dt),
                                  b).astype(jnp.float32)
        return gs.gather_conv(x, nbr, w, b)


class ConvBlock(nn.Module):
    """conv-norm-act x2 with residual (when channel counts allow)."""
    features: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, nbr, mask):
        h = SparseConv(self.features, compute_dtype=self.compute_dtype)(
            x, nbr)
        h = nn.silu(MaskedGroupNorm()(h, mask))
        h = SparseConv(self.features, compute_dtype=self.compute_dtype)(
            h, nbr)
        h = nn.silu(MaskedGroupNorm()(h, mask))
        if x.shape[-1] == self.features:
            h = h + x
        return jnp.where(mask[:, None], h, 0.0)


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    final_bias: bool = True

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.silu(nn.Dense(h)(x))
        return nn.Dense(self.out, use_bias=self.final_bias)(x)


class PointEncoder(nn.Module):
    """Splat oriented points into finest-level voxels -> per-voxel features.

    Reference contract: ``network.encoder(xyz, feat, svh, depth_offset)``
    (/root/reference/models/nksr_net.py:73).
    """
    features: int

    @nn.compact
    def __call__(self, xyz, point_feat, point_mask, grid: SparseGrid,
                 splat_idx=None):
        n = xyz.shape[0]
        corner, w = point_splat_coords(grid, xyz)          # (N,8,3), (N,8)
        idx = splat_idx if splat_idx is not None else \
            grid.lookup(corner.reshape(-1, 3)).reshape(n, 8)
        centers = grid.grid_to_world(corner)               # (N,8,3)
        offset = (xyz[:, None, :] - centers) / grid.voxel_size
        pf = point_feat if point_feat is not None else jnp.zeros((n, 0))
        raw = jnp.concatenate([
            jnp.broadcast_to(pf[:, None, :], (n, 8, pf.shape[-1])),
            offset,
        ], axis=-1)                                        # (N,8,F0)
        wm = jnp.where(point_mask[:, None], w, 0.0)
        seg = jnp.where(idx >= 0, idx, grid.capacity).reshape(-1)
        acc = jnp.zeros((grid.capacity + 1, raw.shape[-1])).at[seg].add(
            (raw * wm[..., None]).reshape(-1, raw.shape[-1]))
        wsum = jnp.zeros((grid.capacity + 1,)).at[seg].add(wm.reshape(-1))
        vox = acc[:-1] / (wsum[:-1, None] + 1e-8)
        density = jnp.log1p(wsum[:-1])[:, None]
        h = jnp.concatenate([vox, density], axis=-1)
        h = nn.silu(nn.Dense(self.features)(h))
        h = nn.Dense(self.features)(h)
        return jnp.where(grid.active_mask()[:, None], h, 0.0)


class Interpolators(nn.Module):
    """Per-depth learned kernel basis ("interpolators" in the reference,
    config at /root/reference/configs/default/train.yaml:23-26).

    ``basis(d, x_loc, F)``: local offset in voxel units (support |x|<1) and
    the voxel's basis feature -> ``kernel_dim`` basis values, windowed by a
    C1 bump so the kernel has compact support (the property that makes the
    Gram system sparse, /root/reference/README.md:17).
    """
    depth: int
    kernel_dim: int = 4
    n_hidden: int = 2
    hidden_dim: int = 16

    def setup(self):
        self.mlps = [MLP(hidden=(self.hidden_dim,) * self.n_hidden,
                         out=self.kernel_dim, name=f"interp_{d}")
                     for d in range(self.depth)]

    def raw(self, d: int, x_loc: jnp.ndarray, feat: jnp.ndarray):
        """Un-windowed basis: 1 + MLP(x_loc, feat) -> (..., K).

        The constant 1 makes the untrained kernel a plain C1 bump RBF, so
        the solve is well-posed from initialization.
        """
        return 1.0 + self.mlps[d](jnp.concatenate([x_loc, feat], axis=-1))

    def basis(self, d: int, x_loc: jnp.ndarray, feat: jnp.ndarray):
        """x_loc: (..., 3) in voxel units; feat: (..., Cb) -> (..., K)."""
        t = jnp.clip(1.0 - x_loc * x_loc, 0.0, None)
        window = jnp.prod(t * t, axis=-1)                  # C1 bump, w(0)=1
        return self.raw(d, x_loc, feat) * window[..., None]

    def __call__(self, x_loc, feat):  # for init only
        return tuple(self.basis(d, x_loc, feat) for d in range(self.depth))


@struct.dataclass
class NetworkOutput:
    """Feature struct mirroring the reference's unet output
    (/root/reference/models/nksr_net.py:92-139)."""
    basis_features: Tuple[jnp.ndarray, ...]      # per dec depth (C_d, Cb)
    normal_features: Tuple[jnp.ndarray, ...]     # per dec depth (C_d, 3)
    structure_features: Tuple[jnp.ndarray, ...]  # per cand depth (C_d, 3)
    udf_features: Tuple[jnp.ndarray, ...]        # per cand depth (C_d, U)


class SparseUNet(nn.Module):
    """Sparse-conv UNet over the SVH that also predicts the decoder
    hierarchy (structure prediction + teacher forcing, reference contract
    /root/reference/models/nksr_net.py:74-78,218-226)."""
    depth: int
    f_maps: int = 32
    adaptive_depth: int = 1
    basis_dim: int = 16
    udf_dim: int = 16
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, feat0: jnp.ndarray, enc_svh: SparseFeatureHierarchy,
                 gt_svh: Optional[SparseFeatureHierarchy],
                 use_gt_structure: bool,
                 dec_capacities: Sequence[int],
                 tables=None):
        D = self.depth
        stencil = gs.stencil_offsets(3)

        # all encoder-hierarchy lookup tables in one segmented sort-join —
        # or host-precomputed (core/host_build.build_unet_tables), making
        # the graph sort-free; memoized per grid object so decoder levels
        # sharing an encoder grid (teacher forcing with the splat
        # hierarchy) reuse them
        if tables is not None:
            enc_nbr, enc_child = tables.nbr, tables.child
        else:
            enc_nbr, enc_child = gs.svh_tables(enc_svh.grids, stencil)
        nbr_cache = {id(g.key_hi): t
                     for g, t in zip(enc_svh.grids, enc_nbr)}

        def get_nbr(grid):
            key = id(grid.key_hi)
            if key not in nbr_cache:
                nbr_cache[key] = gs.neighbor_table(grid, stencil)
            return nbr_cache[key]

        # ---------------------------------------------------- encoder path
        enc_feats = []
        f = feat0
        for d in range(D):
            g_d = enc_svh.grids[d]
            f = ConvBlock(self.f_maps, compute_dtype=self.compute_dtype,
                          name=f"enc_{d}")(
                f, enc_nbr[d], g_d.active_mask())
            enc_feats.append(f)
            if d < D - 1:
                # stride-2 down conv: each parent gathers its 8 children
                w = self.param(f"down_{d}", _glorot(),
                               (8, self.f_maps, self.f_maps))
                b = self.param(f"down_b_{d}", nn.initializers.zeros,
                               (self.f_maps,))
                f = gs.gather_conv(f, enc_child[d], w, b)
                f = jnp.where(enc_svh.grids[d + 1].active_mask()[:, None],
                              f, 0.0)

        # ---------------------------------------------------- decoder path
        dec_grids: list = [None] * D
        cand_grids: list = [None] * D
        struct_logits: list = [None] * D
        basis_feats: list = [None] * D
        normal_feats: list = [None] * D
        udf_feats: list = [None] * D

        cand = enc_svh.grids[D - 1]
        g = enc_feats[D - 1]
        for d in range(D - 1, -1, -1):
            cand_grids[d] = cand
            nbr = get_nbr(cand)
            g = ConvBlock(self.f_maps, compute_dtype=self.compute_dtype,
                          name=f"dec_{d}")(
                g, nbr, cand.active_mask())

            logits = nn.Dense(3, name=f"struct_{d}")(g)
            struct_logits[d] = logits
            udf_feats[d] = nn.Dense(self.udf_dim, name=f"udf_{d}")(g)

            if use_gt_structure:
                assert gt_svh is not None
                # Teacher forcing: decoder grid IS the GT grid; features
                # gathered from the candidate grid where present.
                dec = gt_svh.grids[d]
                status = gt_svh.evaluate_voxel_status(cand.coords, d)
                status = jnp.where(cand.active_mask(), status, 0)
            else:
                status = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                status = jnp.where(cand.active_mask(), status, 0)
                keep = status > 0
                dec = SparseGrid.from_coords(
                    cand.coords, keep, dec_capacities[d], cand.voxel_size,
                    cand.origin)
            dec_grids[d] = dec

            # heads live on the (pruned / GT) decoder grid
            if dec.key_hi is cand.key_hi:   # same grid object: no remap
                gd = g
            else:
                di = cand.lookup(dec.coords)
                gd = gs.take_rows(g, di)
                gd = jnp.where(dec.active_mask()[:, None], gd, 0.0)
            basis_feats[d] = nn.Dense(self.basis_dim, name=f"basis_{d}")(gd)
            # zero-init: predicted normals start exactly at the splatted
            # input-normal prior (models/pipeline.py residual head)
            nf = nn.Dense(3, kernel_init=nn.initializers.zeros,
                          name=f"normal_{d}")(gd)
            normal_feats[d] = jnp.where(dec.active_mask()[:, None], nf, 0.0)

            if d > 0:
                if use_gt_structure and gt_svh is not None and \
                        (tables is not None or
                         gt_svh.grids[d - 1].key_hi is
                         enc_svh.grids[d - 1].key_hi):
                    # teacher-forced with host tables (sort-free inference)
                    # or teacher grid IS the encoder grid: candidates are
                    # the encoder splat grid (a superset of any teacher
                    # hierarchy built from the same points); skip the
                    # children-sort rebuild and reuse its neighbor table
                    nxt = enc_svh.grids[d - 1]
                else:
                    # children of refined voxels -> next candidate grid
                    refine = (status == VOXEL_REFINED) & cand.active_mask()
                    offs = jnp.asarray(gs.child_offsets())
                    cc = cand.coords[:, None, :] * 2 + offs[None]
                    cmask = jnp.broadcast_to(refine[:, None], cc.shape[:2])
                    nxt = SparseGrid.from_coords(
                        cc.reshape(-1, 3), cmask.reshape(-1),
                        dec_capacities[d - 1], cand.voxel_size * 0.5,
                        cand.origin)
                # transposed conv: child takes parent's features through an
                # octant-specific weight, plus the encoder skip connection
                pidx = cand.lookup(jnp.floor_divide(nxt.coords, 2))
                pfeat = gs.take_rows(g, pidx)
                w_up = self.param(f"up_{d}", _glorot(),
                                  (8, self.f_maps, self.f_maps))
                oct = gs.octant_id(nxt.coords)
                # octant-specific weights WITHOUT materializing per-voxel
                # (N, C, F) weight gathers: 8 dense matmuls + masked sum
                h = 0.0
                for o in range(8):
                    yo = jnp.dot(pfeat, w_up[o],
                                 preferred_element_type=jnp.float32)
                    h = h + jnp.where((oct == o)[:, None], yo, 0.0)
                eidx = enc_svh.grids[d - 1].lookup(nxt.coords)
                skip = gs.take_rows(enc_feats[d - 1], eidx)
                g = jnp.where(nxt.active_mask()[:, None], h + skip, 0.0)
                cand = nxt

        dec_svh = SparseFeatureHierarchy(
            grids=tuple(dec_grids), voxel_size=enc_svh.voxel_size)
        udf_svh = SparseFeatureHierarchy(
            grids=tuple(cand_grids), voxel_size=enc_svh.voxel_size)
        out = NetworkOutput(
            basis_features=tuple(basis_feats),
            normal_features=tuple(normal_feats),
            structure_features=tuple(struct_logits),
            udf_features=tuple(udf_feats),
        )
        return out, dec_svh, udf_svh


class NKSRNetwork(nn.Module):
    """Bundles encoder + unet + interpolators + decoders (reference wheel
    top-level module, used at /root/reference/models/nksr_net.py:35)."""
    tree_depth: int = 4
    f_maps: int = 32
    adaptive_depth: int = 1
    kernel_dim: int = 4
    basis_dim: int = 16
    udf_dim: int = 16
    interp_hidden: int = 16
    interp_layers: int = 2
    compute_dtype: str = "float32"

    def setup(self):
        self.encoder = PointEncoder(self.f_maps)
        self.unet = SparseUNet(depth=self.tree_depth, f_maps=self.f_maps,
                               adaptive_depth=self.adaptive_depth,
                               basis_dim=self.basis_dim,
                               udf_dim=self.udf_dim,
                               compute_dtype=self.compute_dtype)
        self.interpolators = Interpolators(
            depth=self.tree_depth, kernel_dim=self.kernel_dim,
            n_hidden=self.interp_layers, hidden_dim=self.interp_hidden)
        self.sdf_decoder = MLP(hidden=(2 * self.basis_dim,) * 2, out=1)
        self.udf_decoder = MLP(hidden=(2 * self.udf_dim,) * 2, out=1)

    def __call__(self, xyz, point_feat, point_mask,
                 enc_svh: SparseFeatureHierarchy,
                 gt_svh: Optional[SparseFeatureHierarchy],
                 use_gt_structure: bool,
                 dec_capacities: Sequence[int],
                 tables=None, point_splat_idx=None):
        if self.is_initializing():
            # materialize params of submodules that are driven functionally
            # by the fields layer (interpolators, sdf/udf decoders)
            z3 = jnp.zeros((1, 3))
            for d in range(self.tree_depth):
                self.interpolators.basis(d, z3, jnp.zeros((1, self.basis_dim)))
            self.sdf_decoder(jnp.zeros((1, self.basis_dim)))
            self.udf_decoder(jnp.zeros((1, self.udf_dim)))
        feat0 = self.encoder(xyz, point_feat, point_mask, enc_svh.grids[0],
                             splat_idx=point_splat_idx)
        out, dec_svh, udf_svh = self.unet(
            feat0, enc_svh, gt_svh, use_gt_structure, dec_capacities,
            tables=tables)
        return out, dec_svh, udf_svh

    # functional sub-entry points (mirror reference submodule access)
    def basis(self, d, x_loc, feat):
        return self.interpolators.basis(d, x_loc, feat)

    def decode_sdf(self, h):
        return self.sdf_decoder(h)[..., 0]

    def decode_udf(self, h):
        return self.udf_decoder(h)[..., 0]
