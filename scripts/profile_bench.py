"""Trace one bench-scale (1M-pt) host-path reconstruct; rank device ops.

Run AFTER the jits are warm (compiles cached in-process): the script
does warmup reps first, then captures a jax.profiler trace of one
steady-state reconstruct and prints the top ops by device time plus the
host-side phase laps (NKSR_TIMING=1).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("NKSR_TIMING", "1")

import numpy as np  # noqa: E402

LOG = open("/tmp/nksr_profbench.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    print(msg, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from bench import synthetic_scene
    from nksr_tpu import Reconstructor
    from nksr_tpu.utils.profiling import drain
    import jax

    xyz, nrm = synthetic_scene(n)
    recon = Reconstructor()
    kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-4,
              solver_max_iters=32, structure="splat")

    t0 = time.time()
    f = recon.reconstruct(xyz, nrm, **kw)
    drain(f.alpha)
    log(f"compile+first: {time.time()-t0:.1f}s")
    for rep in range(2):
        t0 = time.perf_counter()
        f = recon.reconstruct(xyz, nrm, **kw)
        drain(f.alpha)
        log(f"steady: {time.perf_counter()-t0:.2f}s")

    trace_dir = "/tmp/nksr_trace_bench"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    f = recon.reconstruct(xyz, nrm, **kw)
    drain(f.alpha)
    log(f"traced rep: {time.perf_counter()-t0:.2f}s")
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    log(f"trace files: {files}")
    if not files:
        return
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for fp in files:
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                tot[name] += e["dur"] / 1e3
                cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:50]
    for name, ms in top:
        log(f"{ms:10.1f}ms x{cnt[name]:<6d} {name[:100]}")


if __name__ == "__main__":
    main()
