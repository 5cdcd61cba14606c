"""CG convergence study on a real (small) lattice solve, CPU.

Captures the matvec/rhs/preconditioner that ``lattice_solve`` hands to
``solve_spd`` during a reconstruct, then replays PCG eagerly while
recording per-iteration residual AND solution error vs a well-converged
reference (400 iters).  Answers:
  * how many iterations the default Jacobi needs for 1e-3/1e-4 solution
    accuracy (is the bench's max_iters=32 cap binding?)
  * what an improved preconditioner would be worth.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/cg_convergence_study.py
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
        return orig(matvec, b, precond=precond, tol=tol,
                    max_iters=max_iters)

    P.solve_spd = capture
    import nksr_tpu.fields.lattice as LAT
    LAT.solve_spd = capture          # lattice imports it by name at call

    rng = np.random.default_rng(7)
    n = 30000
    # bumpy terrain patch - same character as the bench scene
    xy = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    h = (np.sin(1.2 * xy[:, 0]) * np.cos(xy[:, 1])
         + 0.2 * np.sin(4 * xy[:, 0])).astype(np.float32)
    xyz = np.concatenate([xy, h[:, None]], 1)
    dx = 1.2 * np.cos(1.2 * xy[:, 0]) * np.cos(xy[:, 1]) \
        + 0.8 * np.cos(4 * xy[:, 0])
    dy = -np.sin(1.2 * xy[:, 0]) * np.sin(xy[:, 1])
    nrm = np.stack([-dx, -dy, np.ones(n)], 1).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    recon = Reconstructor()
    # disable_jit so the capture sees concrete arrays (the solve normally
    # runs inside one jit); max_iters=2 keeps the eager solve cheap
    with jax.disable_jit():
        recon.reconstruct(xyz, nrm, voxel_size=0.08, solver_max_iters=2,
                          solver_tol=1e-4, structure="splat")
    assert "matvec" in CAP, "lattice solve not captured"
    mv, b, precond = CAP["matvec"], CAP["b"], CAP["precond"]
    mv = jax.jit(mv)
    precond_j = jax.jit(precond)

    td = lambda a, c: sum(
        float(jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(c)))
    axpy = lambda al, x, y: jax.tree_util.tree_map(
        lambda u, v: al * u + v, x, y)

    def run_pcg(pc, iters, xref=None, label=""):
        x = jax.tree_util.tree_map(jnp.zeros_like, b)
        r = b
        z = pc(r)
        p = z
        rz = td(r, z)
        bn = np.sqrt(td(b, b))
        hist = []
        for i in range(iters):
            mp = mv(p)
            alpha = rz / (td(p, mp) + 1e-30)
            x = axpy(alpha, p, x)
            r = axpy(-alpha, mp, r)
            z = pc(r)
            rz_new = td(r, z)
            beta = rz_new / (rz + 1e-30)
            p = axpy(beta, p, z)
            rz = rz_new
            rel = np.sqrt(td(r, r)) / bn
            err = None
            if xref is not None:
                d = jax.tree_util.tree_map(lambda u, v: u - v, x, xref)
                err = np.sqrt(td(d, d) / max(td(xref, xref), 1e-30))
            hist.append((rel, err))
            if (i + 1) % 8 == 0 or i < 4:
                e = f"  err {err:.2e}" if err is not None else ""
                print(f"  [{label}] it {i+1:3d} rel_res {rel:.2e}{e}",
                      flush=True)
        return x, hist

    print("reference solve (400 its, Jacobi)...")
    xref, _ = run_pcg(precond_j, 400, label="ref")

    print("\nJacobi (current default):")
    _, hj = run_pcg(precond_j, 48, xref=xref, label="jacobi")

    print("\nno preconditioner:")
    _, hn = run_pcg(lambda r: r, 48, xref=xref, label="none")

    print("\nsummary: iters to reach solution error 1e-2 / 1e-3:")
    for name, h in [("jacobi", hj), ("none", hn)]:
        i2 = next((i + 1 for i, (_, e) in enumerate(h) if e < 1e-2), None)
        i3 = next((i + 1 for i, (_, e) in enumerate(h) if e < 1e-3), None)
        r32 = h[31][0] if len(h) > 31 else None
        e32 = h[31][1] if len(h) > 31 else None
        print(f"  {name:8s} err<1e-2 @ {i2}, err<1e-3 @ {i3}, "
              f"at it32: rel_res {r32:.2e} err {e32:.2e}")


if __name__ == "__main__":
    main()
