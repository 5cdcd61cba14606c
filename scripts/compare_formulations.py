"""Primal vs dual lattice-solve convergence at equal iteration budgets.

Reconstructs a small analytic terrain under each formulation at several
max_iters budgets, probing field values against a deep-converged dual
reference.  Decides the default formulation and the bench iteration
budget.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/compare_formulations.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from nksr_tpu import Reconstructor
    from nksr_tpu.models.pipeline import PipelineConfig

    rng = np.random.default_rng(7)
    n = 20000
    xy = rng.uniform(-2.5, 2.5, (n, 2)).astype(np.float32)
    h = (np.sin(1.2 * xy[:, 0]) * np.cos(xy[:, 1])
         + 0.2 * np.sin(4 * xy[:, 0])).astype(np.float32)
    xyz = np.concatenate([xy, h[:, None]], 1)
    dx = 1.2 * np.cos(1.2 * xy[:, 0]) * np.cos(xy[:, 1]) \
        + 0.8 * np.cos(4 * xy[:, 0])
    dy = -np.sin(1.2 * xy[:, 0]) * np.sin(xy[:, 1])
    nrm = np.stack([-dx, -dy, np.ones(n)], 1).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    # probes exactly ON the analytic surface: |f|/||grad f|| estimates the
    # geometric error of the reconstructed zero level set in scene units,
    # with no dependence on any "reference" solve being converged
    probes = np.zeros((2000, 3), np.float32)
    probes[:, :2] = rng.uniform(-2.2, 2.2, (2000, 2))
    probes[:, 2] = (np.sin(1.2 * probes[:, 0]) * np.cos(probes[:, 1])
                    + 0.2 * np.sin(4 * probes[:, 0]))

    def surf_err(formulation, iters):
        """Exact mesh-vertex error: the terrain is a height field, so
        |v_z - h(v_x, v_y)| is true distance (up to slope factor)."""
        cfg = PipelineConfig(solver_formulation=formulation,
                             solver_max_iters=iters, solver_tol=1e-12)
        r = Reconstructor(config=cfg)
        f = r.reconstruct(xyz, nrm, voxel_size=0.1, structure="splat")
        mesh = f.extract_dual_mesh()
        v = np.asarray(mesh.v)
        used = np.unique(np.asarray(mesh.f))
        v = v[used]
        inner = (np.abs(v[:, 0]) < 2.2) & (np.abs(v[:, 1]) < 2.2)
        v = v[inner]
        hz = (np.sin(1.2 * v[:, 0]) * np.cos(v[:, 1])
              + 0.2 * np.sin(4 * v[:, 0]))
        d = np.abs(v[:, 2] - hz)
        return float(d.mean()), float(np.quantile(d, 0.9)), len(v)

    for form in ("dual", "primal"):
        for iters in (8, 16, 32, 64, 128):
            m, q90, nv = surf_err(form, iters)
            print(f"  {form:7s} iters {iters:3d}: vert err mean "
                  f"{m:.4f} q90 {q90:.4f}  ({nv} verts, voxel=0.1)",
                  flush=True)


if __name__ == "__main__":
    main()
