"""Time the DUAL lattice CG matvec at bench shapes on the real chip.

Variants:
  gram_mid    — _gram_middle alone (C C^T in depth-0 row space)
  dual_gram   — full dual matvec, gram middle (scatter->CC^T->gather)
  dual_packed — full dual matvec via the packed cascades (apply_AT o
                apply_A composition, the primal pieces)
  loop10_gram / loop10_packed — 10 chained matvecs in a while_loop
                (captures remat/layout penalties; /10 = per-iter cost)

Usage: python scripts/measure_dual_matvec.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open("/tmp/nksr_dual_matvec.log", "a", buffering=1)


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
    phase0 = tuple((0, 0, 0) for _ in range(4))
    rng = np.random.default_rng(0)
    cell0_pt = jnp.asarray(np.sort(
        rng.integers(0, spec.n_cells(0), size=S_PT).astype(np.int32)))
    cell0_gr = jnp.asarray(np.sort(
        rng.integers(0, spec.n_cells(0), size=S_GR).astype(np.int32)))
    b_pt = jnp.asarray(rng.normal(size=(4, S_PT, 128))
                       .astype(np.float32)).astype(cdt)
    b_gr = jnp.asarray(rng.normal(size=(3, S_GR, 128))
                       .astype(np.float32)).astype(cdt)
    sw_pt = jnp.asarray(rng.random((4, S_PT)).astype(np.float32))
    sw_gr = jnp.asarray(rng.random((S_GR,)).astype(np.float32))
    u0 = (jnp.asarray(rng.normal(size=(4, S_PT)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(3, S_GR)).astype(np.float32)))
    z0c = jnp.asarray(rng.normal(
        size=(spec.n_cells(0), spec.lanes)).astype(np.float32))
    n_c0 = spec.n_cells(0)
    reg = 1e-3

    def small(tree):
        return sum(jnp.sum(t[..., :1].astype(f32)) for t in
                   jax.tree_util.tree_leaves(tree))

    def _mv(u, middle):
        u_pt, u_gr = u
        y_pt = jnp.einsum('rsl,rs->sl', b_pt, (sw_pt * u_pt).astype(cdt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', b_gr,
                          (sw_gr[None] * u_gr).astype(cdt),
                          preferred_element_type=f32)
        z0 = jnp.zeros((n_c0, spec.lanes), f32)
        z0 = z0.at[cell0_pt].add(y_pt, indices_are_sorted=True,
                                 mode="drop")
        z0 = z0.at[cell0_gr].add(y_gr, indices_are_sorted=True,
                                 mode="drop")
        if middle == "gram":
            av0 = jax.lax.optimization_barrier(
                LAT._gram_middle(spec, z0, phase0, cdt))
        else:
            xs_ = LAT._av0_adjoint_cascade(spec, z0)
            av0 = jax.lax.optimization_barrier(
                LAT._av0_cascade(spec, xs_, cdt))
        av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
        av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
        t_pt = jnp.einsum('rsl,sl->rs', b_pt, av_pt,
                          preferred_element_type=f32)
        t_gr = jnp.einsum('rsl,sl->rs', b_gr, av_gr,
                          preferred_element_type=f32)
        return (sw_pt * t_pt + reg * u_pt,
                sw_gr[None] * t_gr + reg * u_gr)

    def v_gram_mid(u):
        return small(LAT._gram_middle(spec, z0c, phase0, cdt))

    def v_dual_gram(u):
        return small(_mv(u, "gram"))

    def v_dual_packed(u):
        return small(_mv(u, "packed"))

    def _loop(u, middle):
        def body(state):
            i, uu = state
            vv = _mv(uu, middle)
            s = jnp.abs(vv[0][0, 0]) + 1.0
            vv = jax.tree_util.tree_map(lambda a: a / s, vv)
            return i + 1, vv
        _, out = jax.lax.while_loop(lambda s: s[0] < 10, body,
                                    (jnp.zeros((), jnp.int32), u))
        return small(out)

    def v_loop_gram(u):
        return _loop(u, "gram")

    def v_loop_packed(u):
        return _loop(u, "packed")

    variants = [("gram_mid", v_gram_mid), ("dual_gram", v_dual_gram),
                ("dual_packed", v_dual_packed),
                ("loop10_gram", v_loop_gram),
                ("loop10_packed", v_loop_packed)]
    for name, fn in variants:
        jf = jax.jit(fn)
        try:
            t0 = time.time()
            drain(jf(u0))
            log(f"{name}: compile+run {time.time()-t0:.1f}s")
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                drain(jf(u0))
                times.append(time.perf_counter() - t0)
            log(f"{name}: {min(times)*1e3:7.1f} ms   reps: "
                f"{' '.join(f'{x*1e3:.0f}' for x in times)}")
        except Exception as e:
            log(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
