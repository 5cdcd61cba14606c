"""Per-primitive microbenchmarks of the lattice CG matvec at bench scale.

Each candidate op runs inside a 10x lax.fori_loop in ONE jit (amortizes
remote dispatch); times are per-op.  Identifies which primitive eats the
~880 ms/iteration measured by scripts/measure_lattice_split.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nksr_tpu.utils.profiling import drain  # noqa: E402
from nksr_tpu.fields import lattice as LAT  # noqa: E402

LOG = open("/tmp/nksr_microbench.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def timed(name, fn, *args, reps=10):
    """fn must map (carry, *args) -> carry-like; loops reps times in-jit."""
    @jax.jit
    def run(*a):
        def body(i, c):
            return fn(c, *a[1:])
        return jax.lax.fori_loop(0, reps, body, a[0])

    out = run(*args)
    drain(out)            # compile + first
    t0 = time.perf_counter()
    out = run(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:42s} {dt*1e3:8.1f} ms")
    return dt


def main():
    # bench-scale shapes (1M-pt scene, vs=0.1, depth 4, k=4)
    NC0 = 400 * 400 * 32          # depth-0 dense cells ~5.1M
    K = 4
    S_GR = 1 << 20                # gradient slots
    S_PT = 1 << 18                # point slots
    LANES = 128
    rng = np.random.default_rng(0)

    spec = LAT.LatticeSpec(
        dims=((400, 400, 32), (200, 200, 16), (104, 104, 8), (56, 56, 8)),
        k=K, depth=4, adaptive_depth=1,
        s_pt=S_PT, p_rows=4, s_gr=S_GR, n_pts_cap=1 << 20)

    x0 = jnp.asarray(rng.normal(size=(NC0 * K,)).astype(np.float32))
    xs = tuple(jnp.asarray(rng.normal(size=(spec.n_cells(d) * K,))
                           .astype(np.float32)) for d in range(4))
    idx_gr = jnp.asarray(
        rng.integers(0, NC0 - 500, size=S_GR).astype(np.int32))
    cells_gr = jnp.asarray(np.stack([
        rng.integers(0, spec.n_cells(d) - max(spec.corner_strides(d)) - 1,
                     size=S_GR).astype(np.int32) for d in range(4)]))
    cells_pt = jnp.asarray(np.stack([
        rng.integers(0, spec.n_cells(d) - max(spec.corner_strides(d)) - 1,
                     size=S_PT).astype(np.int32) for d in range(4)]))
    b_gr = jnp.asarray(rng.normal(size=(3, S_GR, LANES)).astype(np.float32))
    b_pt = jnp.asarray(rng.normal(size=(4, S_PT, LANES)).astype(np.float32))
    y_gr = jnp.asarray(rng.normal(size=(S_GR, LANES)).astype(np.float32))

    only_fused = os.environ.get("NKSR_MB_FUSED_ONLY", "0") == "1"
    if only_fused:
        phase = jnp.asarray(np.zeros((4, 3), np.int32))
        cell0_pt = jnp.asarray(np.sort(
            rng.integers(0, NC0, size=S_PT).astype(np.int32)))
        cell0_gr = jnp.asarray(np.sort(
            rng.integers(0, NC0, size=S_GR).astype(np.int32)))

        def matvec_fused(c, x, bp, bg, dt):
            f32 = jnp.float32
            av0 = LAT._av0(spec, x, phase, dt)
            av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
            av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
            t_pt = jnp.einsum('rsl,sl->rs', bp, av_pt,
                              preferred_element_type=f32)
            t_gr = jnp.einsum('rsl,sl->rs', bg, av_gr,
                              preferred_element_type=f32)
            y_pt = jnp.einsum('rsl,rs->sl', bp, t_pt.astype(dt),
                              preferred_element_type=f32)
            y_gr = jnp.einsum('rsl,rs->sl', bg, t_gr.astype(dt),
                              preferred_element_type=f32)
            y0 = jnp.zeros((NC0, spec.lanes), f32)
            y0 = y0.at[cell0_pt].add(y_pt, indices_are_sorted=True)
            y0 = y0.at[cell0_gr].add(y_gr, indices_are_sorted=True)
            outs = LAT._av0_adjoint(spec, y0, phase)
            return c + sum(o.sum() for o in outs)

        timed("full matvec fused f32",
              lambda c: matvec_fused(c, xs, b_pt, b_gr, jnp.float32),
              jnp.zeros(()), reps=4)
        bp16 = b_pt.astype(jnp.bfloat16)
        bg16 = b_gr.astype(jnp.bfloat16)
        timed("full matvec fused bf16",
              lambda c: matvec_fused(c, xs, bp16, bg16, jnp.bfloat16),
              jnp.zeros(()), reps=4)
        return

    # 1. corner_cat depth-0 (8 static shifted slices + concat)
    timed("corner_cat d0 (5.1M cells, k=4)",
          lambda c, x: c + LAT._corner_cat(x, spec, 0, K).sum(),
          jnp.zeros(()), x0)

    # 2. row gather from corner-cat: av (NC0, 32) -> (S_GR, 32)
    av0 = jnp.asarray(rng.normal(size=(NC0, 8 * K)).astype(np.float32))
    timed("take (5.1M,32) by 1M idx",
          lambda c, a, i: c + jnp.take(a, i, axis=0).sum(),
          jnp.zeros(()), av0, idx_gr)

    # 3. scatter-add 1M rows of 32 into (5.1M, 32)
    y32 = jnp.asarray(rng.normal(size=(S_GR, 8 * K)).astype(np.float32))
    timed("scatter-add (1M,32) into (5.1M,32)",
          lambda c, y, i: c + jnp.zeros((NC0, 8 * K)).at[i].add(y).sum(),
          jnp.zeros(()), y32, idx_gr)

    # 4. corner_scatter_back depth-0
    acc0 = jnp.asarray(rng.normal(size=(NC0, 8 * K)).astype(np.float32))
    timed("corner_scatter_back d0",
          lambda c, a: c + LAT._corner_scatter_back(a, spec, 0, K).sum(),
          jnp.zeros(()), acc0)

    # 5. einsum rsl,sl->rs on b_gr (3, 1M, 128)
    timed("einsum b_gr (3,1M,128)",
          lambda c, b, y: c + jnp.einsum('rsl,sl->rs', b, y).sum(),
          jnp.zeros(()), b_gr, y_gr)

    # 6. einsum adjoint rsl,rs->sl
    t_gr = jnp.asarray(rng.normal(size=(3, S_GR)).astype(np.float32))
    timed("einsum adj b_gr",
          lambda c, b, t: c + jnp.einsum('rsl,rs->sl', b, t).sum(),
          jnp.zeros(()), b_gr, t_gr)

    # 7. full _row_blocks over 4 depths (gr slots)
    timed("_row_blocks gr (4 depths)",
          lambda c, x: c + LAT._row_blocks(spec, x, cells_gr).sum(),
          jnp.zeros(()), xs)

    # 8. full _row_blocks_adjoint (gr slots)
    timed("_row_blocks_adjoint gr",
          lambda c, y: c + sum(o.sum() for o in
                               LAT._row_blocks_adjoint(spec, y, cells_gr)),
          jnp.zeros(()), y_gr)

    # 9. full matvec-shaped composite (pt+gr, both directions)
    def matvec(c, x):
        av_pt = LAT._row_blocks(spec, x, cells_pt)
        t_pt = jnp.einsum('rsl,sl->rs', b_pt, av_pt)
        av_gr = LAT._row_blocks(spec, x, cells_gr)
        t_gr2 = jnp.einsum('rsl,sl->rs', b_gr, av_gr)
        y_pt = jnp.einsum('rsl,rs->sl', b_pt, t_pt)
        y_gr2 = jnp.einsum('rsl,rs->sl', b_gr, t_gr2)
        o1 = LAT._row_blocks_adjoint(spec, y_pt, cells_pt)
        o2 = LAT._row_blocks_adjoint(spec, y_gr2, cells_gr)
        return c + sum(a.sum() + b.sum() for a, b in zip(o1, o2))

    timed("full matvec composite (old per-depth)",
          lambda c: matvec(c, xs), jnp.zeros(()), reps=4)

    # 10. fused AV0 matvec (the current engine) — f32 and bf16 row blocks
    phase = jnp.asarray(np.zeros((4, 3), np.int32))
    cell0_pt = jnp.asarray(np.sort(
        rng.integers(0, NC0, size=S_PT).astype(np.int32)))
    cell0_gr = jnp.asarray(np.sort(
        rng.integers(0, NC0, size=S_GR).astype(np.int32)))

    def matvec_fused(c, x, bp, bg, dt):
        f32 = jnp.float32
        av0 = LAT._av0(spec, x, phase, dt)
        av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
        av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
        t_pt = jnp.einsum('rsl,sl->rs', bp, av_pt,
                          preferred_element_type=f32)
        t_gr = jnp.einsum('rsl,sl->rs', bg, av_gr,
                          preferred_element_type=f32)
        y_pt = jnp.einsum('rsl,rs->sl', bp, t_pt.astype(dt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', bg, t_gr.astype(dt),
                          preferred_element_type=f32)
        y0 = jnp.zeros((NC0, spec.lanes), f32)
        y0 = y0.at[cell0_pt].add(y_pt, indices_are_sorted=True)
        y0 = y0.at[cell0_gr].add(y_gr, indices_are_sorted=True)
        outs = LAT._av0_adjoint(spec, y0, phase)
        return c + sum(o.sum() for o in outs)

    timed("full matvec fused f32",
          lambda c: matvec_fused(c, xs, b_pt, b_gr, jnp.float32),
          jnp.zeros(()), reps=4)
    bp16 = b_pt.astype(jnp.bfloat16)
    bg16 = b_gr.astype(jnp.bfloat16)
    timed("full matvec fused bf16",
          lambda c: matvec_fused(c, xs, bp16, bg16, jnp.bfloat16),
          jnp.zeros(()), reps=4)


if __name__ == "__main__":
    main()
