"""Dual (Gram/row-space) formulation deep-dive: capture the dual matvec
on a tiny scene, check SPD-ness, and track the PRIMAL solution error of
the dual CG iterates (the 2-norm residual can plateau while x = A^T W^.5 u
converges — or expose a real operator bug).

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/debug_dual2.py
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
    from nksr_tpu.models import pipeline as P
    PC = importlib.import_module("nksr_tpu.solver.pcg")
    import nksr_tpu.fields.lattice as LAT

    orig = PC.solve_spd

    def capture(matvec, b, precond=None, tol=1e-5, max_iters=100):
        CAP.setdefault("runs", []).append((matvec, b, precond))
        return orig(matvec, b, precond=precond, tol=tol,
                    max_iters=max_iters)

    PC.solve_spd = capture
    LAT.solve_spd = capture

    rng = np.random.default_rng(3)
    v = rng.normal(size=(500, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz, nrm = 0.5 * v, v

    cfg = P.PipelineConfig(tree_depth=2, f_maps=8, basis_dim=8,
                           udf_dim=8, solver_max_iters=2,
                           solver_tol=1e-10,
                           solver_formulation="dual",
                           solver_compute_dtype="float32")
    recon = Reconstructor(config=cfg)
    with jax.disable_jit():
        recon.reconstruct(xyz, nrm, voxel_size=0.1, detail_level=None,
                          structure="splat")
    mv, b, pc = CAP["runs"][-1]
    mv = jax.jit(mv)
    td = lambda a, c: sum(
        float(jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(c)))

    # ---- symmetry / positivity probes
    def rand_like(tree, seed):
        r = np.random.default_rng(seed)
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(r.normal(size=x.shape).astype(np.float32)),
            tree)

    for s in range(3):
        u = rand_like(b, 10 + s)
        w = rand_like(b, 20 + s)
        uAw = td(u, mv(w))
        wAu = td(w, mv(u))
        uAu = td(u, mv(u))
        print(f"sym rel err {abs(uAw - wAu) / max(abs(uAw), 1e-12):.2e}  "
              f"uAu {uAu:.3e}", flush=True)

    # ---- CG with primal-x tracking
    axpy = lambda a, x, y: jax.tree_util.tree_map(
        lambda p, q: a * p + q, x, y)
    x = jax.tree_util.tree_map(jnp.zeros_like, b)
    r = b
    z = pc(r) if pc else r
    p = z
    rz = td(r, z)
    bn = np.sqrt(td(b, b))
    xs_hist = []
    for i in range(400):
        mp = mv(p)
        alpha = rz / (td(p, mp) + 1e-30)
        x = axpy(alpha, p, x)
        r = axpy(-alpha, mp, r)
        z = pc(r) if pc else r
        rz_new = td(r, z)
        beta = rz_new / (rz + 1e-30)
        p = axpy(beta, p, z)
        rz = rz_new
        if (i + 1) in (1, 2, 4, 8, 16, 32, 64, 128, 256, 400):
            rel = np.sqrt(td(r, r)) / bn
            xs_hist.append((i + 1, rel, jax.tree_util.tree_map(
                lambda a: np.asarray(a), x)))
            print(f"it {i+1:3d} rel_res {rel:.3e}", flush=True)
    # primal-x convergence: compare u at successive checkpoints via the
    # A^T W^.5 map is not directly available here; instead check Cauchy
    # behavior of u itself
    ref = xs_hist[-1][2]
    rn = np.sqrt(sum(float((np.asarray(l) ** 2).sum())
                     for l in jax.tree_util.tree_leaves(ref)))
    for it, rel, xi in xs_hist[:-1]:
        d = jax.tree_util.tree_map(lambda a, c: a - c, xi, ref)
        dn = np.sqrt(sum(float((np.asarray(l) ** 2).sum())
                         for l in jax.tree_util.tree_leaves(d)))
        print(f"it {it:3d}: |u - u_400| / |u_400| = {dn / rn:.3e}")


if __name__ == "__main__":
    main()
