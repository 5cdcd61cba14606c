"""Check the captured lattice CG operator is symmetric positive definite.

CG stalling/oscillating (seen in cg_convergence_study) is the classic
symptom of a non-SPD operator; this captures the same small-scene matvec
and tests <u, Av> == <v, Au> and <u, Au> > 0 on random vectors.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/check_matvec_spd.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

CAP = {}


def main():
    import importlib
    from nksr_tpu import Reconstructor
    P = importlib.import_module("nksr_tpu.solver.pcg")

    orig = P.solve_spd

    def capture(matvec, b, precond=None, tol=1e-5, max_iters=100):
        CAP["matvec"], CAP["b"], CAP["precond"] = matvec, b, precond
        return orig(matvec, b, precond=precond, tol=tol, max_iters=max_iters)

    P.solve_spd = capture

    rng = np.random.default_rng(7)
    n = 8000
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    h = (np.sin(1.2 * xy[:, 0]) * np.cos(xy[:, 1])).astype(np.float32)
    xyz = np.concatenate([xy, h[:, None]], 1)
    dx = 1.2 * np.cos(1.2 * xy[:, 0]) * np.cos(xy[:, 1])
    dy = -np.sin(1.2 * xy[:, 0]) * np.sin(xy[:, 1])
    nrm = np.stack([-dx, -dy, np.ones(n)], 1).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    recon = Reconstructor()
    with jax.disable_jit():
        recon.reconstruct(xyz, nrm, voxel_size=0.1, solver_max_iters=1,
                          solver_tol=1e-4, structure="splat")
    mv = jax.jit(CAP["matvec"])
    b = CAP["b"]
    pc = jax.jit(CAP["precond"])

    td = lambda a, c: sum(
        float(jnp.sum(x.astype(jnp.float64) * y.astype(jnp.float64)))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(c)))

    def rand_like(tree, seed):
        r = np.random.default_rng(seed)
        return jax.tree_util.tree_map(
            lambda t: jnp.asarray(r.normal(size=t.shape)
                                  .astype(np.float32)), tree)

    print("symmetry <u,Av> vs <v,Au>:")
    for s in range(3):
        u, v = rand_like(b, 10 + s), rand_like(b, 20 + s)
        uav, vau = td(u, mv(v)), td(v, mv(u))
        rel = abs(uav - vau) / max(abs(uav), 1e-30)
        print(f"  seed {s}: {uav:+.6e} vs {vau:+.6e}  rel diff {rel:.2e}")

    print("positive definiteness <u,Au>:")
    for s in range(3):
        u = rand_like(b, 30 + s)
        uau = td(u, mv(u))
        print(f"  seed {s}: {uau:+.6e}")

    print("precond symmetry (Jacobi should be diagonal):")
    u, v = rand_like(b, 40), rand_like(b, 41)
    upv, vpu = td(u, pc(v)), td(v, pc(u))
    print(f"  {upv:+.6e} vs {vpu:+.6e}")

    # power iteration for lambda_max, inverse estimate via CG count
    u = rand_like(b, 50)
    for _ in range(20):
        au = mv(u)
        nrm2 = np.sqrt(td(au, au))
        u = jax.tree_util.tree_map(lambda t: t / nrm2, au)
    lam_max = td(u, mv(u)) / td(u, u)
    print(f"lambda_max ~ {lam_max:.3e}")
    # diag-preconditioned operator: power iteration on D^-1/2 A D^-1/2
    # approximated by M = pc o mv (similar spectrum)
    u = rand_like(b, 51)
    for _ in range(20):
        au = pc(mv(u))
        nrm2 = np.sqrt(td(au, au))
        u = jax.tree_util.tree_map(lambda t: t / nrm2, au)
    lam_max_pc = td(u, pc(mv(u))) / td(u, u)
    print(f"lambda_max(D^-1 A) ~ {lam_max_pc:.3e}")


if __name__ == "__main__":
    main()
