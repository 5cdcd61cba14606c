"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

Set NKSR_TPU_TEST_TPU=1 to run the suite on real TPU hardware instead.
"""

import os
import sys

if not os.environ.get("NKSR_TPU_TEST_TPU"):
    # Force CPU: the sandbox pre-sets JAX_PLATFORMS=axon (tunneled TPU),
    # which would send every tiny test compile over the wire.
    # NOTE the env var alone is NOT enough — the axon PJRT plugin stomps
    # the env-derived config at registration (verified: with
    # JAX_PLATFORMS=cpu in the env, jax.default_backend() was still
    # 'tpu').  An explicit config.update after import wins as long as no
    # backend has initialized yet.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


# NO persistent compilation cache on CPU: XLA:CPU executables do not
# round-trip reliably in this environment — deserializing cached entries
# segfaulted (both stale cross-host entries and same-run entries).  TPU
# runs (NKSR_TPU_TEST_TPU=1) still get the package's TPU-only cache.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The suite compiles hundreds of XLA:CPU programs; on this 1-core,
    RAM-tight sandbox the accumulated executables eventually push LLVM
    compiles into segfault territory (observed near the end of full-suite
    runs while a TPU training job held ~2 GB).
    """
    yield
    import jax
    jax.clear_caches()
    gc.collect()
