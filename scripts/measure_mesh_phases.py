"""Time extract_dual_mesh_dense phase-by-phase WITH drains between the
device dispatches (the NKSR_TIMING laps attribute async execution to the
next sync point; this script inserts explicit barriers).

Usage: python scripts/measure_mesh_phases.py [n_points] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from bench import synthetic_scene
    from nksr_tpu import Reconstructor
    from nksr_tpu.utils.profiling import drain
    from nksr_tpu.meshing import lattice_mc as LM

    xyz, nrm = synthetic_scene(n)
    from nksr_tpu.models.pipeline import PipelineConfig
    recon = Reconstructor(config=PipelineConfig(conv_dtype="bfloat16"))
    t0 = time.time()
    hf = recon.reconstruct(xyz, nrm, detail_level=None, voxel_size=0.1,
                           solver_tol=1e-4, solver_max_iters=16,
                           structure="splat")
    drain(hf.field.alpha)
    log(f"reconstruct (compile+run): {time.time()-t0:.1f}s")

    ctx = hf.lattice_ctx
    spec = ctx.spec
    f = 2  # mise_iter=1
    tables = ctx.tables()
    origins = jnp.asarray(ctx.origins.astype(np.int32))

    for rep in range(reps):
        t0 = time.time()
        cand, corner_mask, n_c = LM._candidate_fn(spec, f)(tables.shell0)
        drain(n_c)
        t1 = time.time()
        cap_c = LM._next_cap(int(n_c))
        v_dense = LM._corner_eval_fn(spec, f, cap_c, ctx.voxel_size,
                                     ctx.compute_dtype, ctx.approx_grad)(
            ctx.interp_params, tables, origins, corner_mask)
        drain(v_dense[:1, :1, :1])
        t2 = time.time()
        cap_v = LM._next_cap(cap_c // 4)
        cap_q = LM._next_cap(cap_c // 4)
        out = LM._topology_fn(spec, f, cap_v, cap_q, ctx.voxel_size)(
            v_dense, cand, origins)
        drain(out[2])
        t3 = time.time()
        nv = int(out[2])
        verts = np.asarray(out[0][:nv])
        log(f"rep {rep}: candidates {t1-t0:.3f}s (cap_c {cap_c}) | "
            f"corner_eval {t2-t1:.3f}s | topology {t3-t2:.3f}s "
            f"({nv} verts)")
        # newton wave
        t4 = time.time()
        v, _, g = ctx.eval_batched(verts, grad=True)
        t5 = time.time()
        log(f"rep {rep}: newton eval {t5-t4:.3f}s ({len(verts)} queries)")


if __name__ == "__main__":
    main()
