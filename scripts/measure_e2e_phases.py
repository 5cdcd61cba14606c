"""End-to-end phase breakdown on the real chip: reconstruct (with
NKSR_TIMING sync laps) + extract_dual_mesh(mise_iter=1), at bench scale.

This is the honest points->mesh workload the reference's README claim
covers (/root/reference/README.md:20, examples/recons_simple.py:25-27).

Usage: python scripts/measure_e2e_phases.py [n_points] [structure]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["NKSR_TIMING"] = "1"
os.environ.setdefault("NKSR_TIMING_SYNC", "1")

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    structure = sys.argv[2] if len(sys.argv) > 2 else "splat"
    from bench import synthetic_scene
    from nksr_tpu import Reconstructor
    from nksr_tpu.models.pipeline import PipelineConfig
    from nksr_tpu.utils.profiling import drain

    xyz, nrm = synthetic_scene(n)
    recon = Reconstructor(config=PipelineConfig(
        conv_dtype="bfloat16",
        solver_formulation=os.environ.get("NKSR_FORMULATION", "primal")))
    kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-4,
              solver_max_iters=int(os.environ.get("NKSR_ITERS", "32")),
              structure=structure)

    f = m = None
    for rep in range(2):
        label = "compile" if rep == 0 else "steady"
        # release the previous rep's field FIRST: its lattice-eval tables
        # (AV0 + corner features, ~4 GB HBM at bench scale) would
        # otherwise stay live across the next solve and OOM it
        f = m = None  # noqa: F841
        t0 = time.perf_counter()
        f = recon.reconstruct(xyz, nrm, **kw)
        drain(f.alpha)
        t1 = time.perf_counter()
        print(f"[{label}] reconstruct: {t1 - t0:.2f}s", flush=True)
        m = f.extract_dual_mesh(mise_iter=1)
        t2 = time.perf_counter()
        print(f"[{label}] extract_dual_mesh(mise_iter=1): {t2 - t1:.2f}s "
              f"({m.v.shape[0]} verts, {m.f.shape[0]} tris)", flush=True)
        print(f"[{label}] TOTAL points->mesh: {t2 - t0:.2f}s "
              f"= {n / (t2 - t0):,.0f} pts/s", flush=True)


if __name__ == "__main__":
    main()
