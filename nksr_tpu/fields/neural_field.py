"""NeuralField / LayerField / PCNNField — the non-kernel field heads.

Contracts from reference usage:
  * NeuralField(svh, decoder, features) with ``set_level_set`` — the
    'neural' geometry head and the UDF mask head
    (/root/reference/models/nksr_net.py:114-133).
  * LayerField(svh, adaptive_depth) — non-learned occupancy mask field
    (/root/reference/models/nksr_net.py:132).
  * PCNNField(xyz, color) — nearest-point texture field
    (/root/reference/examples/recons_colored_mesh.py:28-32).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.grid import SparseGrid, point_splat_coords
from ..core.svh import SparseFeatureHierarchy
from ..ops.gather_scatter import take_rows
from .kernel_field import FieldEval


@struct.dataclass
class DecoderFn:
    """Functional handle on an MLP decoder submodule."""
    params: Any
    module: Any = struct.field(pytree_node=False)

    def __call__(self, h):
        return self.module.apply(self.params, h)


@struct.dataclass
class NeuralField:
    """f(x) = decoder( sum_d trilinear-interpolated features at x )."""
    svh: SparseFeatureHierarchy
    features: Tuple[jnp.ndarray, ...]
    decoder: DecoderFn
    level_set: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(()))
    mask_field: Optional[Any] = None
    texture_field: Optional[Any] = None

    def _pooled(self, x: jnp.ndarray, sup_idx=None) -> jnp.ndarray:
        from ..core import coords as C
        weights = []
        if sup_idx is None:
            # one segmented sort-join for all depths (in-graph path);
            # host-orchestrated callers pass precomputed ``sup_idx``
            sets, queries = [], []
            for d in range(self.svh.depth):
                g = self.svh.grids[d]
                corner, w = point_splat_coords(g, x)
                sets.append((g.key_hi, g.key_lo, g.num_voxels))
                queries.append(C.pack(corner.reshape(-1, 3)))
                weights.append(w)
            idxs = C.multi_search_sorted(sets, queries)
            sup_idx = tuple(idxs[d].reshape(x.shape[0], 8)
                            for d in range(self.svh.depth))
        else:
            for d in range(self.svh.depth):
                _, w = point_splat_coords(self.svh.grids[d], x)
                weights.append(w)
        h = 0.0
        for d in range(self.svh.depth):
            idx = sup_idx[d]
            f = take_rows(self.features[d], idx)
            w = jnp.where(idx >= 0, weights[d], 0.0)
            h = h + jnp.einsum("qs,qsc->qc", w, f)
        return h

    def evaluate_f(self, x: jnp.ndarray, grad: bool = False,
                   sup_idx=None) -> FieldEval:
        def value(pts):
            out = self.decoder(self._pooled(pts, sup_idx=sup_idx))
            return out[..., 0] if out.ndim > 1 else out
        if grad:
            v, vjp = jax.vjp(value, x)
            (g,) = vjp(jnp.ones_like(v))
            return FieldEval(value=v, gradient=g)
        return FieldEval(value=value(x))

    def set_level_set(self, v) -> "NeuralField":
        return self.replace(level_set=jnp.asarray(v, jnp.float32))

    def evaluate_mask(self, x: jnp.ndarray) -> jnp.ndarray:
        """UDF mask: positive where udf(x) < level_set (near the surface)."""
        return self.level_set - self.evaluate_f(x).value

    def set_mask_field(self, field) -> "NeuralField":
        return self.replace(mask_field=field)

    def set_texture_field(self, field) -> "NeuralField":
        return self.replace(texture_field=field)

    def evaluate_f_bar(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.evaluate_f(x).value
        if self.mask_field is None:
            return f
        m = self.mask_field.evaluate_mask(x)
        return jnp.where(m > 0, f, -self.svh.voxel_size)

    def extract_dual_mesh(self, mise_iter: int = 0, grid_upsample: int = 1,
                          max_points=None, max_quads=None):
        from ..meshing.dual_mc import extract_dual_mesh
        return extract_dual_mesh(self, mise_iter=mise_iter,
                                 grid_upsample=grid_upsample,
                                 max_points=max_points, max_quads=max_quads)


@struct.dataclass
class LayerField:
    """Occupancy mask from the hierarchy itself: positive anywhere the
    field has basis support (union over all depths).  Points outside any
    voxel's support have f == 0 by compact support; the mask relabels them
    as empty space so ``evaluate_f_bar`` is negative in the far field."""
    svh: SparseFeatureHierarchy
    adaptive_depth: int = struct.field(pytree_node=False, default=1)

    def evaluate_mask(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..core import coords as C
        sets, queries = [], []
        for d in range(self.svh.depth):
            g = self.svh.grids[d]
            corner, _ = point_splat_coords(g, x)
            sets.append((g.key_hi, g.key_lo, g.num_voxels))
            queries.append(C.pack(corner.reshape(-1, 3)))
        idxs = C.multi_search_sorted(sets, queries)
        inside = jnp.zeros(x.shape[0], bool)
        for d in range(self.svh.depth):
            inside = inside | jnp.any(
                idxs[d].reshape(x.shape[0], 8) >= 0, axis=-1)
        return jnp.where(inside, 1.0, -1.0)

    def evaluate_f(self, x: jnp.ndarray, grad: bool = False) -> FieldEval:
        v = self.evaluate_mask(x)
        return FieldEval(value=v,
                         gradient=jnp.zeros_like(x) if grad else None)


@struct.dataclass
class PCNNField:
    """Nearest-point attribute (color) field over a reference cloud.

    Nearest neighbor is found TPU-style: look up the 27 surrounding cells
    of a bucketing grid (one representative point per cell kept at build
    time via the sorted-set machinery) and take the closest.
    """
    xyz: jnp.ndarray           # (N, 3) reference points
    attr: jnp.ndarray          # (N, C) attributes (e.g. rgb)
    grid: SparseGrid           # bucket grid over xyz
    cell_point: jnp.ndarray    # (capacity,) index of one point per cell

    @staticmethod
    def build(xyz: jnp.ndarray, attr: jnp.ndarray, mask: jnp.ndarray,
              cell_size, capacity: int) -> "PCNNField":
        ijk = jnp.round(xyz / cell_size).astype(jnp.int32)
        g = SparseGrid.from_coords(ijk, mask, capacity, cell_size)
        idx = g.lookup(ijk)
        seg = jnp.where(mask & (idx >= 0), idx, capacity)
        # keep the point with the smallest index per cell (deterministic)
        order = jnp.arange(xyz.shape[0], dtype=jnp.int32)
        cell_point = jnp.full((capacity + 1,), jnp.iinfo(jnp.int32).max,
                              jnp.int32).at[seg].min(order)[:-1]
        return PCNNField(xyz=xyz, attr=attr, grid=g, cell_point=cell_point)

    def evaluate_f(self, x: jnp.ndarray, grad: bool = False) -> FieldEval:
        import numpy as np
        offs = jnp.asarray(
            np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                                 indexing="ij"), -1).reshape(-1, 3),
            jnp.int32)
        ijk = jnp.round(x / self.grid.voxel_size).astype(jnp.int32)
        cells = ijk[:, None, :] + offs[None]
        cidx = self.grid.lookup(cells.reshape(-1, 3)).reshape(
            x.shape[0], -1)
        pidx = jnp.where(cidx >= 0,
                         jnp.take(self.cell_point, jnp.clip(cidx, 0),
                                  axis=0), -1)
        cand = take_rows(self.xyz, pidx)                 # (Q, 27, 3)
        d2 = jnp.sum((cand - x[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(pidx >= 0, d2, jnp.inf)
        best = jnp.argmin(d2, axis=-1)
        bidx = jnp.take_along_axis(pidx, best[:, None], axis=1)[:, 0]
        val = take_rows(self.attr, bidx)
        return FieldEval(value=val)
