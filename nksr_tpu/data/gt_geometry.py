"""Ground-truth geometry providers for scene-scale supervision.

Rebuilds the reference GT-geometry layer
(/root/reference/dataset/av_gt_geometry.py): a dense oriented point set
that answers ``query_sdf`` (via the IMLS op, the sdfgen stand-in), and a
TSDF-volume variant that additionally answers ``query_classification``
(0 = near-surface, 1 = empty space, 2 = unknown — av_gt_geometry.py:141-173)
by trilinear-nearest sampling of a precomputed volume.  Both support
spatial crops for the chunked training pipelines.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import knn as K
from ..ops import sdf as SDF

NEAR_SURFACE = 0
EMPTY_SPACE = 1
UNKNOWN = 2


class DensePointsGroundTruthGeometry:
    """GT = a dense oriented point cloud; SDF queries via the sdfgen op.

    ``mode='vote'`` (default) mirrors the reference AV GT path exactly:
    majority-vote SDF with per-point adaptive radius, nb_points=8,
    stdv=3.0, adaptive_knn=8 (/root/reference/dataset/av_gt_geometry.py:
    63-78).  ``mode='imls'`` is the smooth IMLS estimator (better for
    synthetic clean data)."""

    def __init__(self, xyz: np.ndarray, normal: np.ndarray,
                 voxel_size: float = 0.1, mode: str = "vote"):
        self.xyz = np.asarray(xyz, np.float32)
        self.normal = np.asarray(normal, np.float32)
        self.voxel_size = float(voxel_size)
        self.mode = mode
        self._table = None
        self._ref_std = None

    def torch_attr(self):  # API parity: (xyz, normal, aux)
        return self.xyz, self.normal, None

    def _get_table(self):
        if self._table is None:
            n = self.xyz.shape[0]
            cap = 1 << max(8, int(np.ceil(np.log2(max(n // 8, 1)))))
            self._table = K.build_buckets(
                jnp.asarray(self.xyz), jnp.ones(n, bool),
                4.0 * self.voxel_size, cap, 32)
        return self._table

    def _get_ref_std(self):
        """Cached per-point adaptive radius (self-kNN mean distance,
        reference sdf_from_points.cu:177-184)."""
        if self._ref_std is None:
            self._ref_std = SDF.reference_self_std(
                self._get_table(), jnp.asarray(self.xyz), 8)
        return self._ref_std

    def query_sdf(self, queries) -> jnp.ndarray:
        """Positive INSIDE (negated sdfgen output, reference sign
        convention at models/loss.py:85, av_gt_geometry.py:72)."""
        q = jnp.asarray(queries)
        if self.mode == "vote":
            return -SDF.sdf_from_points(
                q, jnp.asarray(self.xyz), jnp.asarray(self.normal), None,
                table=self._get_table(), nb_points=8, stdv=3.0,
                imls=False, ref_std=self._get_ref_std())
        return -SDF.sdf_from_points(q, jnp.asarray(self.xyz),
                                    jnp.asarray(self.normal), None,
                                    table=self._get_table())

    def query_classification(self, queries) -> jnp.ndarray:
        q = jnp.asarray(queries)
        d = jnp.abs(self.query_sdf(q))
        return jnp.where(d < 2 * self.voxel_size, NEAR_SURFACE,
                         UNKNOWN).astype(jnp.int32)

    def crop(self, lo, hi) -> "DensePointsGroundTruthGeometry":
        keep = np.all((self.xyz >= lo) & (self.xyz <= hi), axis=1)
        return DensePointsGroundTruthGeometry(
            self.xyz[keep], self.normal[keep], self.voxel_size,
            mode=self.mode)


class PointTSDFVolumeGroundTruthGeometry(DensePointsGroundTruthGeometry):
    """Adds a dense TSDF/weight volume for empty-space classification."""

    def __init__(self, xyz, normal, tsdf: np.ndarray, weight: np.ndarray,
                 origin, voxel_size: float):
        super().__init__(xyz, normal, voxel_size)
        self.tsdf = np.asarray(tsdf, np.float32)        # (X, Y, Z)
        self.weight = np.asarray(weight, np.float32)
        self.origin = np.asarray(origin, np.float32)

    def _sample_nearest(self, vol: np.ndarray, queries) -> jnp.ndarray:
        q = (jnp.asarray(queries) - self.origin) / self.voxel_size
        ijk = jnp.round(q).astype(jnp.int32)
        shape = jnp.asarray(vol.shape, jnp.int32)
        inb = jnp.all((ijk >= 0) & (ijk < shape), axis=-1)
        ijk = jnp.clip(ijk, 0, shape - 1)
        flat = (ijk[:, 0] * vol.shape[1] + ijk[:, 1]) * vol.shape[2] \
            + ijk[:, 2]
        vals = jnp.take(jnp.asarray(vol).reshape(-1), flat)
        return jnp.where(inb, vals, jnp.nan)

    def query_classification(self, queries) -> jnp.ndarray:
        """0 near-surface, 1 observed-empty, 2 unknown
        (av_gt_geometry.py:141-173 semantics)."""
        t = self._sample_nearest(self.tsdf, queries)
        w = self._sample_nearest(self.weight, queries)
        near = jnp.abs(t) < 2 * self.voxel_size
        observed = (w > 0.5) & ~jnp.isnan(w)
        empty = observed & (t >= 2 * self.voxel_size)
        return jnp.where(near & observed, NEAR_SURFACE,
                         jnp.where(empty, EMPTY_SPACE,
                                   UNKNOWN)).astype(jnp.int32)

    def crop(self, lo, hi) -> "PointTSDFVolumeGroundTruthGeometry":
        keep = np.all((self.xyz >= lo) & (self.xyz <= hi), axis=1)
        lo_i = np.floor((np.asarray(lo) - self.origin)
                        / self.voxel_size).astype(int)
        hi_i = np.ceil((np.asarray(hi) - self.origin)
                       / self.voxel_size).astype(int) + 1
        lo_i = np.clip(lo_i, 0, np.asarray(self.tsdf.shape) - 1)
        hi_i = np.clip(hi_i, 1, np.asarray(self.tsdf.shape))
        sl = tuple(slice(a, b) for a, b in zip(lo_i, hi_i))
        return PointTSDFVolumeGroundTruthGeometry(
            self.xyz[keep], self.normal[keep], self.tsdf[sl],
            self.weight[sl], self.origin + lo_i * self.voxel_size,
            self.voxel_size)

    @staticmethod
    def from_points(xyz, normal, voxel_size: float, padding: int = 4
                    ) -> "PointTSDFVolumeGroundTruthGeometry":
        """Bake a TSDF volume from the oriented cloud (for datasets that
        ship only points)."""
        lo = xyz.min(0) - padding * voxel_size
        hi = xyz.max(0) + padding * voxel_size
        dims = np.ceil((hi - lo) / voxel_size).astype(int) + 1
        dims = np.minimum(dims, 256)  # bound host memory
        gx, gy, gz = [np.arange(d) * voxel_size + o
                      for d, o in zip(dims, lo)]
        grid = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"),
                        -1).reshape(-1, 3).astype(np.float32)
        g = DensePointsGroundTruthGeometry(xyz, normal, voxel_size,
                                           mode="imls")
        out = []
        for i in range(0, grid.shape[0], 1 << 16):
            out.append(np.asarray(g.query_sdf(grid[i:i + (1 << 16)])))
        sdf = np.concatenate(out).reshape(tuple(dims))
        weight = np.ones_like(sdf)
        return PointTSDFVolumeGroundTruthGeometry(
            xyz, normal, sdf, weight, lo, voxel_size)


_GT_CLASSES = {
    "DensePoints": DensePointsGroundTruthGeometry,
    "PointTSDFVolume": PointTSDFVolumeGroundTruthGeometry,
}


def get_class(name: str):
    """Registry (av_gt_geometry.py:207-213)."""
    return _GT_CLASSES[name]
