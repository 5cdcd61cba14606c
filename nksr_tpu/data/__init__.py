from .base import DatasetSpec, RandomSafeDataset, list_collate
from .datasets import (ShapeNetDataset, AVDataset, MatterportDataset,
                       Points2SurfDataset, PointCloudDataset,
                       CombinedDataset, build_dataset)
from .loader import PrefetchLoader, to_device_batch
from .io import read_ply, read_ply_full, write_ply
from .gt_geometry import (DensePointsGroundTruthGeometry,
                          PointTSDFVolumeGroundTruthGeometry, get_class)
from . import transforms

__all__ = ["DatasetSpec", "RandomSafeDataset", "list_collate",
           "ShapeNetDataset", "AVDataset", "MatterportDataset",
           "Points2SurfDataset", "PointCloudDataset", "CombinedDataset",
           "build_dataset",
           "PrefetchLoader", "to_device_batch", "read_ply", "read_ply_full",
           "write_ply", "transforms", "DensePointsGroundTruthGeometry",
           "PointTSDFVolumeGroundTruthGeometry", "get_class"]
