"""Compile-only probe of the lattice CG matvec at bench scale.

Builds ONE matvec application (the while-loop body's dominant cost) with
bench-shaped inputs, compiles it for the TPU WITHOUT running, and prints
XLA's memory analysis — temp bytes, argument bytes, and the generated-code
size.  OOMs and layout blowups surface here in minutes instead of after a
full 20-minute solve compile + host build.

Usage: python scripts/probe_matvec_compile.py [bf16|f32] [loop]
  loop: wrap 8 matvec applications in a fori_loop (approximates the CG
  while-loop context, where remat decisions differ from straight-line).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open("/tmp/nksr_probe.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    print(msg, flush=True)


def main():
    from nksr_tpu.fields import lattice as LAT

    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") \
        else jnp.float32
    in_loop = "loop" in sys.argv[1:]
    K = 4
    S_GR = 1 << 20
    S_PT = 1 << 18
    spec = LAT.LatticeSpec(
        dims=((408, 408, 32), (208, 208, 16), (104, 104, 8), (56, 56, 8)),
        k=K, depth=4, adaptive_depth=1,
        s_pt=S_PT, p_rows=4, s_gr=S_GR, n_pts_cap=1 << 20)
    phase = np.zeros((4, 3), np.int32)  # static

    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(rng.normal(size=(spec.n_cells(d) * K,))
                           .astype(np.float32)) for d in range(4))
    cell0_pt = jnp.asarray(np.sort(
        rng.integers(0, spec.n_cells(0), size=S_PT).astype(np.int32)))
    cell0_gr = jnp.asarray(np.sort(
        rng.integers(0, spec.n_cells(0), size=S_GR).astype(np.int32)))
    b_pt = jnp.asarray(rng.normal(size=(4, S_PT, 128))
                       .astype(np.float32)).astype(dt)
    b_gr = jnp.asarray(rng.normal(size=(3, S_GR, 128))
                       .astype(np.float32)).astype(dt)
    w_pt = jnp.asarray(rng.random((4, S_PT)).astype(np.float32))
    w_gr = jnp.asarray(rng.random((S_GR,)).astype(np.float32))

    def matvec(x):
        f32 = jnp.float32
        av0 = LAT._av0(spec, x, phase, dt)
        av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
        av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
        t_pt = w_pt * jnp.einsum('rsl,sl->rs', b_pt, av_pt,
                                 preferred_element_type=f32)
        t_gr = w_gr[None] * jnp.einsum('rsl,sl->rs', b_gr, av_gr,
                                       preferred_element_type=f32)
        y_pt = jnp.einsum('rsl,rs->sl', b_pt, t_pt.astype(dt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', b_gr, t_gr.astype(dt),
                          preferred_element_type=f32)
        y0 = jnp.zeros((spec.n_cells(0), spec.lanes), f32)
        y0 = y0.at[cell0_pt].add(y_pt, indices_are_sorted=True)
        y0 = y0.at[cell0_gr].add(y_gr, indices_are_sorted=True)
        outs = LAT._av0_adjoint(spec, y0, phase)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)

    if in_loop:
        def fn(x):
            return jax.lax.fori_loop(0, 8, lambda i, c: matvec(c), x)
    else:
        fn = matvec

    t0 = time.time()
    lowered = jax.jit(fn).lower(xs)
    log(f"lowered in {time.time()-t0:.1f}s")
    t0 = time.time()
    try:
        compiled = lowered.compile()
    except Exception as e:
        log(f"COMPILE FAILED after {time.time()-t0:.1f}s: "
            f"{str(e)[:1200]}")
        return
    log(f"compiled in {time.time()-t0:.1f}s  (dtype={dt}, loop={in_loop})")
    try:
        ma = compiled.memory_analysis()
        log(f"  temp={ma.temp_size_in_bytes/1e9:.2f}G "
            f"args={ma.argument_size_in_bytes/1e9:.2f}G "
            f"out={ma.output_size_in_bytes/1e9:.2f}G "
            f"code={ma.generated_code_size_in_bytes/1e6:.1f}M")
    except Exception as e:
        log(f"  (memory_analysis unavailable: {e})")


if __name__ == "__main__":
    main()
