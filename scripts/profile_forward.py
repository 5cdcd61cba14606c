"""Profile the compiled forward on TPU; parse trace to rank ops by time.

Writes progress lines to /tmp/nksr_prof.log (append, flushed) so progress
is visible despite pipe buffering.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.nksr_jax_cache")

import numpy as np
import jax
from nksr_tpu.utils.profiling import drain
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

LOG = open("/tmp/nksr_prof.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    print(msg, flush=True)


def main():
    from nksr_tpu.models import pipeline as P

    caps = (262144, 65536, 16384, 8192)
    cfg = P.PipelineConfig(
        voxel_size=0.02, tree_depth=4, adaptive_depth=1, f_maps=16,
        basis_dim=8, udf_dim=8, capacities=caps, solver_max_iters=16,
        solver_tol=1e-4, structure_mode="splat")
    log("init...")
    params = P.init_params(cfg, jax.random.PRNGKey(0))
    n = 65536
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz, nrm, mask = jnp.asarray(0.5 * v), jnp.asarray(v), jnp.ones(n, bool)

    fwd = jax.jit(lambda p, x, m, f:
                  P.forward(cfg, p, x, m, f).field.alpha[0].sum())
    t0 = time.time()
    drain(fwd(params, xyz, mask, nrm))
    log(f"compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    drain(fwd(params, xyz, mask, nrm))
    log(f"steady: {time.time()-t0:.2f}s")

    trace_dir = "/tmp/nksr_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    drain(fwd(params, xyz, mask, nrm))
    jax.profiler.stop_trace()
    log("trace captured")

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    log(f"trace files: {files}")
    if not files:
        files = glob.glob(f"{trace_dir}/**/*", recursive=True)
        log(f"all files: {files[:20]}")
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # sum durations by op name on device lanes
    tot = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            tot[name] += e["dur"] / 1e3  # ms
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for name, ms in top:
        log(f"{ms:10.1f}ms  {name[:110]}")


if __name__ == "__main__":
    main()
