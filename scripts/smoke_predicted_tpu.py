"""TPU smoke + timing of the host-orchestrated predicted-structure path.

Untrained structure heads prune everything, so boost them (like the parity
test) to get a representative mixed leaf/refined workload at scene scale.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synthetic_scene  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import jax
    from nksr_tpu.utils.profiling import drain
    import jax.numpy as jnp
    from nksr_tpu import Reconstructor

    xyz, nrm = synthetic_scene(n)
    recon = Reconstructor()

    def boost(path, leaf):
        ps = jax.tree_util.keystr(path)
        if "struct_" in ps and "kernel" in ps:
            return leaf * 30.0
        if "struct_" in ps and "bias" in ps:
            return jnp.asarray([0.0, 0.5, 0.3], leaf.dtype)
        return leaf
    recon.network.params = jax.tree_util.tree_map_with_path(
        boost, recon.network.params)

    kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-4,
              solver_max_iters=32, structure="predicted")

    t0 = time.perf_counter()
    f = recon.reconstruct(xyz, nrm, **kw)
    drain(f.field.alpha)
    t_first = time.perf_counter() - t0
    print(f"first call (incl compile): {t_first:.1f}s", flush=True)
    for d, g in enumerate(f.host_grids):
        print(f"  dec level {d}: {len(g.keys)} voxels", flush=True)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        f = recon.reconstruct(xyz, nrm, **kw)
        drain(f.field.alpha)
    dt = (time.perf_counter() - t0) / reps
    print(f"steady state: {dt:.2f}s  ({n / dt:,.0f} pts/s)", flush=True)


if __name__ == "__main__":
    main()
