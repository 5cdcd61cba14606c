"""Tracing/profiling utilities (reference aux subsystem, SURVEY.md §5).

The reference wraps phases in chrome-trace blocks driven by PT_PROFILE env
vars; here the same phase names ride jax.profiler:

  * ``phase("forward")``  — named TraceAnnotation context
  * ``trace_run(dir)``    — whole-run trace capture when NKSR_PROFILE=1
  * ``device_memory_snapshot()`` — live/peak HBM use
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


def drain(tree) -> None:
    """TRUE device-completion barrier: fetch one element of one leaf.

    ``jax.block_until_ready`` is NOT a reliable completion barrier on
    tunneled/remote device platforms (measured here on the ``axon`` TPU
    proxy: it returns in ~50 ms while the dispatched computation runs for
    seconds; only a device-to-host copy actually waits).  Every wall-clock
    measurement in this repo must use ``drain`` instead.
    """
    import numpy as _np
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            _np.asarray(jax.device_get(leaf.ravel()[:1]))
            return


_DEMOTIONS_LOGGED: set = set()


def log_engine_demotion(wanted: str, got: str, why: str) -> None:
    """Loud, once-per-process notice that a fast engine was demoted
    (Pallas -> XLA, dense UNet -> gather conv, dense mesher -> host,
    predicted-dense -> per-level host).  Silent demotions make benchmark
    numbers lie about which path ran; this is the single chokepoint."""
    key = (wanted, got)
    if key in _DEMOTIONS_LOGGED:
        return
    _DEMOTIONS_LOGGED.add(key)
    import sys
    print(f"[nksr_tpu] engine demotion: {wanted} -> {got} ({why})",
          file=sys.stderr, flush=True)


@contextlib.contextmanager
def phase(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_run(log_dir: str = "/tmp/nksr_trace"):
    """Capture a full profiler trace when NKSR_PROFILE=1 (else no-op)."""
    if os.environ.get("NKSR_PROFILE"):
        jax.profiler.start_trace(log_dir)
        try:
            yield log_dir
        finally:
            jax.profiler.stop_trace()
    else:
        yield None


def device_memory_snapshot() -> Dict[str, float]:
    """Per-device live memory stats in MB (XLA allocator view)."""
    out = {}
    for d in jax.devices():
        try:
            st = d.memory_stats()
        except Exception:
            continue
        if st:
            out[str(d)] = {
                "bytes_in_use_mb": st.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": st.get("peak_bytes_in_use", 0) / 1e6,
                "bytes_limit_mb": st.get("bytes_limit", 0) / 1e6,
            }
    return out


class StepTimer:
    """Lightweight steps/sec meter for training loops."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.t0 = None

    def tick(self) -> Optional[float]:
        self.n += 1
        if self.n == self.warmup:
            self.t0 = time.perf_counter()
        if self.t0 is None or self.n <= self.warmup:
            return None
        return (self.n - self.warmup) / (time.perf_counter() - self.t0)
