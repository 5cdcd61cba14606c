"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

Set NKSR_TPU_TEST_TPU=1 to run the suite on real TPU hardware instead.
"""

import os
import sys
import zlib

if not os.environ.get("NKSR_TPU_TEST_TPU"):
    # Force CPU: the sandbox pre-sets JAX_PLATFORMS=axon (tunneled TPU),
    # which would send every tiny test compile over the wire.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


def _cpu_tag() -> str:
    # keep in sync with nksr_tpu._host_cpu_tag (must run BEFORE importing
    # the package, which sets its own cache dir via setdefault)
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


# persistent compilation cache: repeated suite runs skip all XLA compiles.
# Keyed by the host CPU's feature set — replaying AOT artifacts compiled
# on a different CPU can SIGILL (sandboxes migrate between hosts).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser(f"~/.cache/nksr_tpu_xla_tests_{_cpu_tag()}"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
