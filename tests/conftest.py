"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

Set NKSR_TPU_TEST_TPU=1 to run the suite on real TPU hardware instead.
"""

import os

if not os.environ.get("NKSR_TPU_TEST_TPU"):
    # Force CPU: the sandbox pre-sets JAX_PLATFORMS=axon (tunneled TPU),
    # which would send every tiny test compile over the wire.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: repeated suite runs skip all XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/nksr_tpu_xla_tests"))

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
