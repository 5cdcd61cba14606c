"""API-parity module: ``nksr_tpu.svh.SparseFeatureHierarchy``
(reference: ``nksr.svh``, /root/reference/models/loss.py:12)."""

from .core.svh import (SparseFeatureHierarchy, VOXEL_EMPTY, VOXEL_LEAF,
                       VOXEL_REFINED)
from .core.grid import SparseGrid

__all__ = ["SparseFeatureHierarchy", "SparseGrid", "VOXEL_EMPTY",
           "VOXEL_LEAF", "VOXEL_REFINED"]
