"""Micro-reproducer: dual vs primal lattice solve on a tiny sphere.

Prints CG exit residuals/iters for both formulations and the field
mismatch, to separate under-convergence from operator bugs.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/debug_dual.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import importlib
    from nksr_tpu import Reconstructor
    from nksr_tpu.models import pipeline as P
    PC = importlib.import_module("nksr_tpu.solver.pcg")

    # instrument: record exit iters/residual of every solve
    orig_pcg = PC.pcg
    log = []

    def pcg_spy(matvec, b, precond=None, tol=1e-5, max_iters=100):
        x, i, rr = orig_pcg(matvec, b, precond=precond, tol=tol,
                            max_iters=max_iters)
        jax.debug.print("pcg exit: iters={i} rel_res={r}", i=i, r=rr)
        return x, i, rr

    PC.pcg = pcg_spy

    rng = np.random.default_rng(3)
    v = rng.normal(size=(500, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz, nrm = 0.5 * v, v
    probe = 0.45 * v[:100]

    vals = {}
    for form in ("primal", "dual"):
        log.clear()
        cfg = P.PipelineConfig(tree_depth=2, f_maps=8, basis_dim=8,
                               udf_dim=8, solver_max_iters=400,
                               solver_tol=1e-10,
                               solver_formulation=form)
        recon = Reconstructor(config=cfg)
        f = recon.reconstruct(xyz, nrm, voxel_size=0.15,
                              detail_level=None, structure="splat")
        vals[form] = np.asarray(f.evaluate_f(probe).value)
        print(f"{form}: exits {log}", flush=True)

    p, d = vals["primal"], vals["dual"]
    scale = np.abs(p).mean()
    print(f"|primal| {scale:.5f}  |dual| {np.abs(d).mean():.5f}")
    print(f"rel mismatch {np.abs(p - d).mean() / scale:.4f}")
    print(f"corr {np.corrcoef(p, d)[0, 1]:.5f}")
    print(f"lstsq scale d~p: {np.dot(d, p) / np.dot(p, p):.4f}")


if __name__ == "__main__":
    main()
