"""nksr_tpu — TPU-native neural kernel surface reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
nv-tlabs/NKSR (reference studied at /root/reference): sparse voxel
hierarchies, a structure-predicting sparse-conv UNet, learned-kernel
implicit fields solved with preconditioned CG, dual marching cubes meshing,
and chunked / multi-chip scale-out — all built around XLA's static-shape,
no-atomics compilation model.
"""

__version__ = "0.1.0"

from .core import SparseGrid, SparseFeatureHierarchy
from .recon import Reconstructor, get_estimate_normal_preprocess_fn
from . import fields
from . import configs
from . import svh

__all__ = ["SparseGrid", "SparseFeatureHierarchy", "Reconstructor",
           "get_estimate_normal_preprocess_fn", "fields", "configs", "svh",
           "__version__"]
