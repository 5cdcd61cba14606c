"""A single sparse voxel grid level (static-capacity, sorted-key set).

TPU-native stand-in for the per-level grid object of the reference's
``nksr.svh.SparseFeatureHierarchy`` (contract from usage:
``grid.active_grid_coords()``, ``grid.grid_to_world(ijk_float)``,
``grid.voxel_size`` — /root/reference/models/loss.py:36-46).

Convention: voxel ``(i, j, k)`` at a level with voxel size ``s`` has its
*center* at world position ``ijk * s + origin`` (node-centered, VDB-like).
A point splats to the 8 voxel centers surrounding it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import coords as C


@struct.dataclass
class SparseGrid:
    """Sorted set of active voxels at one hierarchy level."""

    key_hi: jnp.ndarray      # (capacity,) uint32, sorted; INVALID past n
    key_lo: jnp.ndarray      # (capacity,) uint32
    coords: jnp.ndarray      # (capacity, 3) int32, zeros past n
    num_voxels: jnp.ndarray  # () int32 live count
    voxel_size: jnp.ndarray  # () float32
    origin: jnp.ndarray      # (3,) float32

    # ---------------------------------------------------------------- attrs
    @property
    def capacity(self) -> int:
        return self.key_hi.shape[0]

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.num_voxels

    def active_grid_coords(self) -> jnp.ndarray:
        """(capacity, 3) int32 ijk of active voxels (zeros past num_voxels)."""
        return self.coords

    # ------------------------------------------------------------ transforms
    def grid_to_world(self, ijk: jnp.ndarray) -> jnp.ndarray:
        return ijk.astype(jnp.float32) * self.voxel_size + self.origin

    def world_to_grid(self, xyz: jnp.ndarray) -> jnp.ndarray:
        return (xyz - self.origin) / self.voxel_size

    def voxel_centers(self) -> jnp.ndarray:
        return self.grid_to_world(self.coords)

    # --------------------------------------------------------------- queries
    def lookup(self, ijk: jnp.ndarray) -> jnp.ndarray:
        """Index of each (..., 3) int32 voxel in this grid, -1 if absent."""
        return C.lookup_coords(self.key_hi, self.key_lo, self.num_voxels, ijk)

    def contains_point(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """True where xyz lies inside the cube of some active voxel."""
        ijk = jnp.round(self.world_to_grid(xyz)).astype(jnp.int32)
        return self.lookup(ijk) >= 0

    # -------------------------------------------------------------- builders
    @staticmethod
    def from_coords(ijk: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                    voxel_size, origin=None) -> "SparseGrid":
        """Build a grid from (possibly duplicated) int32 ijk coords."""
        hi, lo, out_coords, n = C.unique_coords(ijk, mask, capacity)
        if origin is None:
            origin = jnp.zeros((3,), jnp.float32)
        return SparseGrid(
            key_hi=hi, key_lo=lo, coords=out_coords, num_voxels=n,
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            origin=jnp.asarray(origin, jnp.float32),
        )

    @staticmethod
    def empty(capacity: int, voxel_size, origin=None) -> "SparseGrid":
        if origin is None:
            origin = jnp.zeros((3,), jnp.float32)
        return SparseGrid(
            key_hi=jnp.full((capacity,), C.INVALID_HI),
            key_lo=jnp.full((capacity,), C.INVALID_LO),
            coords=jnp.zeros((capacity, 3), jnp.int32),
            num_voxels=jnp.zeros((), jnp.int32),
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            origin=jnp.asarray(origin, jnp.float32),
        )


def splat_coords(grid_xyz: jnp.ndarray):
    """8 surrounding voxel coords + trilinear weights for continuous grid pos.

    ``grid_xyz``: (N, 3) float position in *grid units* (world/voxel_size).
    Returns (corner_ijk (N, 8, 3) int32, weights (N, 8) float32).
    """
    base = jnp.floor(grid_xyz).astype(jnp.int32)
    frac = grid_xyz - base.astype(jnp.float32)
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(2), jnp.arange(2), jnp.arange(2), indexing="ij"),
        axis=-1).reshape(8, 3).astype(jnp.int32)
    corner = base[:, None, :] + offs[None, :, :]
    w = jnp.prod(jnp.where(offs[None].astype(bool), frac[:, None, :],
                           1.0 - frac[:, None, :]), axis=-1)
    return corner, w


def point_splat_coords(grid: SparseGrid, xyz: jnp.ndarray):
    """Coords+weights of the 8 voxel *centers* around each world point."""
    g = grid.world_to_grid(xyz)  # centers live at integer grid coords
    return splat_coords(g)
