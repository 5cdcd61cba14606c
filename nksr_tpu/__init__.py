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

def _host_cpu_tag() -> str:
    """Fingerprint of the host CPU's feature set.

    XLA:CPU AOT cache entries embed the compile machine's features; after
    a sandbox migration to a different CPU, replaying them can SIGILL /
    segfault (observed: test_train segfaulted off a stale cache).  Keying
    the cache directory by the feature set makes each host start clean.
    """
    import zlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return format(zlib.crc32(line.encode()) & 0xFFFFFFFF,
                                  "08x")
    except OSError:
        pass
    import platform
    return format(zlib.crc32(platform.processor().encode()) & 0xFFFFFFFF,
                  "08x")


# Persistent XLA compilation cache: our static-shape graphs contain many
# large sorts whose (remote) TPU compiles take minutes; the cache makes
# every repeated shape free.  Opt out with NKSR_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("NKSR_TPU_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser(f"~/.cache/nksr_tpu_xla_{_host_cpu_tag()}"))
    try:
        import jax as _jax
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
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
