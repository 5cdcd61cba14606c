"""Locate boundary (unmatched) edges in the MISE-subdivided host mesh.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/debug_mise_holes.py
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

    rng = np.random.default_rng(33)
    v = rng.normal(size=(1500, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = 0.5 * v
    nrm = v.astype(np.float32)

    cfg = PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8,
                         udf_dim=8, solver_max_iters=60, solver_tol=1e-5)
    recon = Reconstructor(config=cfg)
    hf = recon.reconstruct(xyz, nrm, voxel_size=0.1, detail_level=None,
                           structure="splat")
    for mi in (0, 1):
        mesh = hf.extract_dual_mesh(mise_iter=mi)
        f = mesh.f
        edges = np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        uniq, counts = np.unique(edges, axis=0, return_counts=True)
        closed = (counts == 2).mean()
        print(f"mise_iter={mi}: V={len(mesh.v)} F={len(f)} "
              f"closed={closed:.4f}")
        bad = uniq[counts != 2]
        if len(bad):
            pts = mesh.v[bad.reshape(-1)]
            r = np.linalg.norm(pts, axis=1)
            print(f"  boundary edges: {len(bad)}, vert radius "
                  f"min/mean/max = {r.min():.3f}/{r.mean():.3f}/"
                  f"{r.max():.3f}  (surface at 0.5)")
            cnts = np.unique(counts, return_counts=True)
            print(f"  edge-count histogram: {cnts}")


if __name__ == "__main__":
    main()
