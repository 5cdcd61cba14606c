"""nksr_tpu — TPU-native neural kernel surface reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
nv-tlabs/NKSR (reference studied at /root/reference): sparse voxel
hierarchies, a structure-predicting sparse-conv UNet, learned-kernel
implicit fields solved with preconditioned CG, dual marching cubes meshing,
and chunked / multi-chip scale-out — all built around XLA's static-shape,
no-atomics compilation model.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache — TPU backends ONLY: our static-shape
# graphs contain many large sorts whose (remote) TPU compiles take
# minutes, and TPU executables serialize safely.  XLA:CPU executables do
# NOT round-trip reliably here (deserializing them segfaulted twice in
# this sandbox — they embed host-CPU feature assumptions and the sandbox
# migrates between hosts), so CPU runs always compile fresh.
# Opt out entirely with NKSR_TPU_NO_COMPILE_CACHE=1.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if not _os.environ.get("NKSR_TPU_NO_COMPILE_CACHE") and "cpu" not in _plat:
    _cache_dir = _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/nksr_tpu_xla"))
    try:
        import jax as _jax
        # the env var alone is NOT reliable here: the axon sitecustomize
        # imports jax before this package runs, so the option must be set
        # through the live config — but only when the user hasn't already
        # configured a cache dir programmatically
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .core import SparseGrid, SparseFeatureHierarchy
from .recon import Reconstructor, get_estimate_normal_preprocess_fn
from . import fields
from . import configs
from . import svh

__all__ = ["SparseGrid", "SparseFeatureHierarchy", "Reconstructor",
           "get_estimate_normal_preprocess_fn", "fields", "configs", "svh",
           "__version__"]
