"""Compile (once, into the persistent cache) + measure the fully in-graph
forward at bench-like sizes. Logs to /tmp/nksr_ingraph.log."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from nksr_tpu.utils.profiling import drain
import jax.numpy as jnp

LOG = open("/tmp/nksr_ingraph.log", "a", buffering=1)


def log(m):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {m}\n")


def main():
    from nksr_tpu.models import pipeline as P
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cap0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    caps = (cap0, cap0 // 4, cap0 // 16, cap0 // 32)
    cfg = P.PipelineConfig(
        voxel_size=0.1, tree_depth=4, adaptive_depth=1,
        capacities=caps, solver_max_iters=32, solver_tol=1e-4,
        structure_mode="splat")
    params = P.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xy = rng.uniform(-20, 20, (n, 2)).astype(np.float32)
    z = (np.sin(0.3 * xy[:, 0]) * np.cos(0.25 * xy[:, 1])).astype(
        np.float32)
    xyz = jnp.asarray(np.c_[xy, z])
    nrm = jnp.asarray(np.tile([0, 0, 1.0], (n, 1)).astype(np.float32))
    mask = jnp.ones(n, bool)
    log(f"start n={n} caps={caps}")
    fwd = jax.jit(lambda p, x, m, f:
                  P.forward(cfg, p, x, m, f).field.alpha[0].sum())
    t0 = time.time()
    drain(fwd(params, xyz, mask, nrm))
    log(f"compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        out = fwd(params, xyz, mask, nrm)
    drain(out)
    log(f"steady {(time.time()-t0)/3:.2f}s  ({n/((time.time()-t0)/3):.0f} pts/s)")


if __name__ == "__main__":
    main()
