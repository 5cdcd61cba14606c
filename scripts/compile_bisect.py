"""Bisect TPU compile time: which subgraph is slow to compile?

Each phase logs to /tmp/nksr_bisect.log. Run repeatedly — the persistent
compilation cache skips phases that already compiled.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.nksr_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

LOG = open("/tmp/nksr_bisect.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def main():
    from nksr_tpu.models import pipeline as P
    from nksr_tpu.core.svh import SparseFeatureHierarchy as SVH
    from nksr_tpu.models.network import Interpolators
    from nksr_tpu.fields import support as S, InterpolatorFn, KernelField

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    caps = (262144, 65536, 16384, 8192)
    cfg = P.PipelineConfig(
        voxel_size=0.02, tree_depth=4, adaptive_depth=1, f_maps=16,
        basis_dim=8, udf_dim=8, capacities=caps, solver_max_iters=16,
        solver_tol=1e-4, structure_mode="splat")
    params = P.init_params(cfg, jax.random.PRNGKey(0))
    n = 65536
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz, nrm, mask = jnp.asarray(0.5 * v), jnp.asarray(v), jnp.ones(n, bool)
    log(f"--- bisect {which} start")

    def timed(name, fn, *a):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        tc = time.time() - t0
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        log(f"{name}: first {tc:.1f}s steady {time.time()-t0:.2f}s")
        return out

    svh_fn = jax.jit(lambda x, m: SVH.build_point_splatting(
        x, m, cfg.voxel_size, 4, caps))
    if which in ("all", "svh"):
        timed("svh", lambda x, m: svh_fn(x, m).grids[0].key_hi, xyz, mask)
    svh = svh_fn(xyz, mask)

    net = cfg.network()
    if which in ("all", "net"):
        net_fn = jax.jit(lambda p, x, f, m, s: net.apply(
            p, x, f, m, s, s, True, caps)[0].basis_features[0])
        timed("net", net_fn, params, xyz, nrm, mask, svh)

    if which in ("all", "solve"):
        out, dec, udf = jax.jit(lambda p, x, f, m, s: net.apply(
            p, x, f, m, s, s, True, caps))(params, xyz, nrm, mask, svh)
        interp = InterpolatorFn(
            params={"params": params["params"]["interpolators"]},
            module=Interpolators(depth=4, kernel_dim=4, n_hidden=2,
                                 hidden_dim=16))

        def solve_fn(feats, nf, x, m, d):
            field = KernelField(svh=d, features=feats, interp=interp,
                                kernel_dim=4)
            centers = d.get_voxel_centers(0)
            cm = d.grids[0].active_mask()
            M = jnp.maximum(cm.sum().astype(jnp.float32), 1.)
            pos_w = jnp.where(m, 1e4 / m.sum(), 0.)
            nw = jnp.where(cm, 1e4 / M * cfg.voxel_size ** 2, 0.)
            f2 = field.solve_non_fused(x, pos_w, centers, nw, -nf[0],
                                       solver_tol=1e-4, max_iters=16)
            return f2.alpha[0]
        timed("solve", jax.jit(solve_fn), out.basis_features,
              out.normal_features, xyz, mask, dec)
    log(f"--- bisect {which} done")


if __name__ == "__main__":
    main()
