"""Pallas cascade on the real chip: correctness probe + bench-shape
timing vs the XLA cascade.

Usage: python scripts/measure_pallas_cascade.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open("/tmp/nksr_pallas_cascade.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    print(msg, flush=True)


def main():
    from nksr_tpu.fields import lattice as LAT
    from nksr_tpu.fields import lattice_pallas as LP
    from nksr_tpu.utils.profiling import drain

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    log(f"== pallas cascade probe backend={jax.default_backend()}")

    # ---- small-spec correctness on the chip (Mosaic, not interpret)
    spec = LAT.LatticeSpec(dims=((24, 24, 16), (16, 16, 8), (8, 8, 8)),
                           k=4, depth=3, adaptive_depth=1,
                           s_pt=8, p_rows=4, s_gr=8, n_pts_cap=8)
    rng = np.random.default_rng(3)
    xs = tuple(jnp.asarray(rng.normal(
        size=(spec.n_cells(d) * 4 // 128, 128)).astype(np.float32))
        for d in range(3))
    try:
        t0 = time.time()
        got = np.asarray(LP.av0_cascade_pallas(spec, xs, jnp.float32,
                                               interpret=False))
        log(f"fwd small compile+run {time.time()-t0:.1f}s")
        ref = np.asarray(LAT._av0_cascade(spec, xs, jnp.float32))
        x0, y0, z0 = spec.dims[0]
        X, Y, Z = np.meshgrid(np.arange(x0), np.arange(y0),
                              np.arange(z0), indexing="ij")
        inter = np.ones((x0, y0, z0), bool)
        for d in range(3):
            xd, yd, zd = spec.dims[d]
            inter &= ((X >> d) < xd - 1) & ((Y >> d) < yd - 1) \
                & ((Z >> d) < zd - 1)
        m = inter.reshape(-1)
        md = float(np.abs(ref[m] - got[m]).max())
        log(f"fwd small interior maxdiff: {md}")
        if md > 1e-5:
            log("CORRECTNESS FAIL — stopping")
            return
    except Exception as e:
        log(f"fwd small FAIL: {type(e).__name__}: {str(e)[:500]}")
        return

    try:
        t0 = time.time()
        z = jnp.asarray(rng.normal(
            size=(spec.n_cells(0), spec.lanes)).astype(np.float32))
        adj = LP.av0_adjoint_cascade_pallas(spec, z, interpret=False)
        fwd = LP.av0_cascade_pallas(spec, xs, jnp.float32,
                                    interpret=False)
        lhs = float(jnp.sum(fwd * z))
        rhs = float(sum(jnp.sum(a * x) for a, x in zip(adj, xs)))
        log(f"adj small compile+run {time.time()-t0:.1f}s  "
            f"adjoint rel err: {abs(lhs-rhs)/max(abs(lhs),1e-9):.2e}")
    except Exception as e:
        log(f"adj small FAIL: {type(e).__name__}: {str(e)[:500]}")
        return

    # ---- bench-shape timing
    K = 4
    spec = LAT.LatticeSpec(
        dims=((408, 408, 32), (208, 208, 16), (104, 104, 8), (56, 56, 8)),
        k=K, depth=4, adaptive_depth=1,
        s_pt=1 << 18, p_rows=4, s_gr=1 << 20, n_pts_cap=1 << 20)
    cdt = jnp.bfloat16
    xs = tuple(jnp.asarray(rng.normal(
        size=(spec.n_cells(d) * K // 128, 128)).astype(np.float32))
        for d in range(4))
    z0b = jnp.asarray(rng.normal(
        size=(spec.n_cells(0), spec.lanes)).astype(np.float32))

    def small(tree):
        return sum(jnp.sum(t[..., :1].astype(jnp.float32)) for t in
                   jax.tree_util.tree_leaves(tree))

    variants = [
        ("pl_fwd", lambda: small(LP.av0_cascade_pallas(
            spec, xs, cdt, interpret=False))),
        ("pl_adj", lambda: small(LP.av0_adjoint_cascade_pallas(
            spec, z0b, interpret=False))),
        ("xla_fwd", lambda: small(LAT._av0_cascade(spec, xs, cdt))),
        ("xla_adj", lambda: small(LAT._av0_adjoint_cascade(spec, z0b))),
    ]
    for name, fn in variants:
        jf = jax.jit(fn)
        try:
            t0 = time.time()
            drain(jf())
            log(f"{name}: compile+run {time.time()-t0:.1f}s")
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                drain(jf())
                times.append(time.perf_counter() - t0)
            log(f"{name}: {min(times)*1e3:7.1f} ms   reps: "
                f"{' '.join(f'{x*1e3:.0f}' for x in times)}")
        except Exception as e:
            log(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
