"""Split the lattice-path reconstruct cost: fixed (network + assembly)
vs per-CG-iteration.  Times the host splat path at two max_iters
settings; the slope is the marginal CG iteration cost on the real chip.

Usage:  python scripts/measure_lattice_split.py [n_points]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

LOG = open("/tmp/nksr_lattice_split.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from bench import synthetic_scene
    from nksr_tpu import Reconstructor
    from nksr_tpu.utils.profiling import drain

    xyz, nrm = synthetic_scene(n)
    recon = Reconstructor()
    results = {}
    for iters in (2, 32):
        kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-12,
                  solver_max_iters=iters, structure="splat")
        t0 = time.time()
        f = recon.reconstruct(xyz, nrm, **kw)
        drain(f.alpha)
        log(f"iters={iters}: first (compile) {time.time()-t0:.1f}s")
        reps = 3
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f = recon.reconstruct(xyz, nrm, **kw)
            drain(f.alpha)
            times.append(time.perf_counter() - t0)
        results[iters] = min(times)   # min: tunnel noise is additive
        log(f"iters={iters}: steady min {min(times):.2f}s "
            f"(reps: {' '.join(f'{t:.2f}' for t in times)})")
    per_iter = (results[32] - results[2]) / 30.0
    log(f"per-CG-iteration: {per_iter*1e3:.0f} ms; "
        f"fixed (host+net+assembly+2 iters): {results[2]:.2f}s")


if __name__ == "__main__":
    main()
