"""Time the lattice CG matvec phase-by-phase at bench shapes on the real
chip.  Each variant is a separately jitted prefix of the fused-AV0 matvec
(scripts/probe_matvec_compile.py checks compile/memory; this measures
runtime).  Differences between successive variants attribute the cost.

Variants (cumulative):
  cascade   — _av0_cascade only (packed coeffs -> (cells_0, 128) bf16)
  gather    — + both sorted row gathers
  einsumA   — + 'rsl,sl->rs' contractions (apply_A complete)
  einsumAT  — + weighting + 'rsl,rs->sl' back-contractions
  scatter   — + the two sorted scatter-adds into z0
  full      — + _av0_adjoint_cascade + reg axpy  (the real matvec)

Usage: python scripts/measure_matvec_phases.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open("/tmp/nksr_matvec_phases.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    print(msg, flush=True)


def main():
    from nksr_tpu.fields import lattice as LAT
    from nksr_tpu.utils.profiling import drain

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    K = 4
    S_GR = 1 << 20
    S_PT = 1 << 18
    spec = LAT.LatticeSpec(
        dims=((408, 408, 32), (208, 208, 16), (104, 104, 8), (56, 56, 8)),
        k=K, depth=4, adaptive_depth=1,
        s_pt=S_PT, p_rows=4, s_gr=S_GR, n_pts_cap=1 << 20)
    cdt = jnp.bfloat16
    f32 = jnp.float32

    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(
        rng.normal(size=(spec.n_cells(d) * K // 128, 128))
        .astype(np.float32)) for d in range(4))
    cell0_pt = jnp.asarray(np.sort(
        rng.integers(0, spec.n_cells(0), size=S_PT).astype(np.int32)))
    cell0_gr = jnp.asarray(np.sort(
        rng.integers(0, spec.n_cells(0), size=S_GR).astype(np.int32)))
    b_pt = jnp.asarray(rng.normal(size=(4, S_PT, 128))
                       .astype(np.float32)).astype(cdt)
    b_gr = jnp.asarray(rng.normal(size=(3, S_GR, 128))
                       .astype(np.float32)).astype(cdt)
    w_pt = jnp.asarray(rng.random((4, S_PT)).astype(np.float32))
    w_gr = jnp.asarray(rng.random((S_GR,)).astype(np.float32))
    n_c0 = spec.n_cells(0)

    def small(tree):
        """Tiny DCE-proof digest of a pytree."""
        return sum(jnp.sum(t[..., :1].astype(f32)) for t in
                   jax.tree_util.tree_leaves(tree))

    def v_cascade(x):
        av0 = LAT._av0_cascade(spec, x, cdt)
        return small(av0)

    def _gathers(x):
        av0 = jax.lax.optimization_barrier(LAT._av0_cascade(spec, x, cdt))
        av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
        av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
        return av_pt, av_gr

    def v_gather(x):
        return small(_gathers(x))

    def _einA(x):
        av_pt, av_gr = _gathers(x)
        t_pt = jnp.einsum('rsl,sl->rs', b_pt, av_pt,
                          preferred_element_type=f32)
        t_gr = jnp.einsum('rsl,sl->rs', b_gr, av_gr,
                          preferred_element_type=f32)
        return t_pt, t_gr

    def v_einA(x):
        return small(_einA(x))

    def _einAT(x):
        t_pt, t_gr = _einA(x)
        y_pt = jnp.einsum('rsl,rs->sl', b_pt, (w_pt * t_pt).astype(cdt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', b_gr, (w_gr[None] * t_gr).astype(cdt),
                          preferred_element_type=f32)
        return y_pt, y_gr

    def v_einAT(x):
        return small(_einAT(x))

    def _scatter(x):
        y_pt, y_gr = _einAT(x)
        z0 = jnp.zeros((n_c0, spec.lanes), f32)
        z0 = z0.at[cell0_pt].add(y_pt, indices_are_sorted=True, mode="drop")
        z0 = z0.at[cell0_gr].add(y_gr, indices_are_sorted=True, mode="drop")
        return z0

    def v_scatter(x):
        return small(_scatter(x))

    def v_full(x):
        z0 = _scatter(x)
        outs = LAT._av0_adjoint_cascade(spec, z0)
        y = jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)
        return small(y)

    def _matvec(x):
        z0 = _scatter(x)
        outs = LAT._av0_adjoint_cascade(spec, z0)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)

    def v_loop10(x):
        """10 chained matvecs in a while_loop — captures the remat/
        layout penalties the CG loop pays that standalone calls don't."""
        def body(state):
            i, xs_ = state
            ys = _matvec(xs_)
            s = sum(jnp.sum(jnp.abs(y[:1, :1])) for y in ys) + 1.0
            ys = jax.tree_util.tree_map(lambda a: a / s, ys)
            return i + 1, ys
        _, out = jax.lax.while_loop(lambda s: s[0] < 10, body,
                                    (jnp.zeros((), jnp.int32), x))
        return small(out)

    variants = [("cascade", v_cascade), ("gather", v_gather),
                ("einsumA", v_einA), ("einsumAT", v_einAT),
                ("scatter", v_scatter), ("full", v_full),
                ("loop10", v_loop10)]
    prev = 0.0
    for name, fn in variants:
        jf = jax.jit(fn)
        t0 = time.time()
        drain(jf(xs))
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            drain(jf(xs))
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(f"{name}: {t*1e3:7.1f} ms   (delta {max(t-prev,0)*1e3:7.1f} ms)"
            f"   reps: {' '.join(f'{x*1e3:.0f}' for x in times)}")
        prev = t


if __name__ == "__main__":
    main()
