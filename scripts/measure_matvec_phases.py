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
    # the row blocks are passed as JIT ARGUMENTS (an ops dict): closed
    # over, they embed as graph constants and XLA's constant folding of
    # the .astype chews unbounded compile time at these sizes (observed
    # 25+ min stuck on the einsumA compile)
    ops = dict(
        b_pt=jnp.asarray(rng.normal(size=(4, S_PT, 128))
                         .astype(np.float32)).astype(cdt),
        b_gr=jnp.asarray(rng.normal(size=(3, S_GR, 128))
                         .astype(np.float32)).astype(cdt),
        w_pt=jnp.asarray(rng.random((4, S_PT)).astype(np.float32)),
        w_gr=jnp.asarray(rng.random((S_GR,)).astype(np.float32)))
    n_c0 = spec.n_cells(0)

    def small(tree):
        """Tiny DCE-proof digest of a pytree."""
        return sum(jnp.sum(t[..., :1].astype(f32)) for t in
                   jax.tree_util.tree_leaves(tree))

    def v_cascade(x, O):
        av0 = LAT._av0_cascade(spec, x, cdt)
        return small(av0)

    def _gathers(x, O):
        av0 = jax.lax.optimization_barrier(LAT._av0_cascade(spec, x, cdt))
        av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
        av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
        return av_pt, av_gr

    def v_gather(x, O):
        return small(_gathers(x, O))

    def _einA(x, O):
        av_pt, av_gr = _gathers(x, O)
        t_pt = jnp.einsum('rsl,sl->rs', O['b_pt'], av_pt,
                          preferred_element_type=f32)
        t_gr = jnp.einsum('rsl,sl->rs', O['b_gr'], av_gr,
                          preferred_element_type=f32)
        return t_pt, t_gr

    def v_einA(x, O):
        return small(_einA(x, O))

    def _einAT(x, O):
        t_pt, t_gr = _einA(x, O)
        y_pt = jnp.einsum('rsl,rs->sl', O['b_pt'], (O['w_pt'] * t_pt).astype(cdt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', O['b_gr'], (O['w_gr'][None] * t_gr).astype(cdt),
                          preferred_element_type=f32)
        return y_pt, y_gr

    def v_einAT(x, O):
        return small(_einAT(x, O))

    def _scatter(x, O):
        y_pt, y_gr = _einAT(x, O)
        z0 = jnp.zeros((n_c0, spec.lanes), f32)
        z0 = z0.at[cell0_pt].add(y_pt, indices_are_sorted=True, mode="drop")
        z0 = z0.at[cell0_gr].add(y_gr, indices_are_sorted=True, mode="drop")
        return z0

    def v_scatter(x, O):
        return small(_scatter(x, O))

    def v_full(x, O):
        z0 = _scatter(x, O)
        outs = LAT._av0_adjoint_cascade(spec, z0)
        y = jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)
        return small(y)

    def _matvec(x, O):
        z0 = _scatter(x, O)
        outs = LAT._av0_adjoint_cascade(spec, z0)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)

    def v_loop10(x, O):
        """10 chained matvecs in a while_loop — captures the remat/
        layout penalties the CG loop pays that standalone calls don't."""
        def body(state):
            i, xs_ = state
            ys = _matvec(xs_, O)
            s = sum(jnp.sum(jnp.abs(y[:1, :1])) for y in ys) + 1.0
            ys = jax.tree_util.tree_map(lambda a: a / s, ys)
            return i + 1, ys
        _, out = jax.lax.while_loop(lambda s: s[0] < 10, body,
                                    (jnp.zeros((), jnp.int32), x))
        return small(out)

    # ---- optimization variants (round 4) --------------------------------
    # merged families: ONE sorted gather + ONE sorted scatter over the
    # concatenated (pt, gr) row sets.  The per-row price (17/23 ns) is
    # per *instruction row*, so folding 2 instructions into 1 halves the
    # z0 read-modify-write traffic and the fixed per-row overheads.  In
    # production the plan would emit the merged order (both families are
    # already sorted by depth-0 cell -> host-side linear merge).
    merged_idx_np = np.sort(np.concatenate(
        [np.asarray(cell0_pt), np.asarray(cell0_gr)]))
    merged_idx = jnp.asarray(merged_idx_np)

    def v_merged_gather(x, O):
        av0 = jax.lax.optimization_barrier(LAT._av0_cascade(spec, x, cdt))
        return small(LAT._take_rows_sorted(av0, merged_idx, True))

    def _matvec_merged(x, O):
        """Full matvec with merged-family scatter (gathers left as-is:
        the einsum row blocks are family-shaped)."""
        y_pt, y_gr = _einAT(x, O)
        # fold (4, S_PT, 128)+(3->pad 4?, S_GR) into one (S_PT+S_GR, 128)
        # stream: simulate with the concatenated per-slot sums (the pt
        # family's p_rows collapse is an in-register reduce)
        yc = jnp.concatenate([y_pt, y_gr], axis=0)
        z0 = jnp.zeros((n_c0, spec.lanes), f32)
        z0 = z0.at[merged_idx].add(
            jnp.take(yc, jnp.arange(S_PT + S_GR), axis=0),
            indices_are_sorted=True, mode="drop")
        outs = LAT._av0_adjoint_cascade(spec, z0)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)

    def v_merged_full(x, O):
        return small(_matvec_merged(x, O))

    def v_bf16_z0(x, O):
        """Scatter-accumulate z0 in bf16 (halves the dominant stream)."""
        y_pt, y_gr = _einAT(x, O)
        z0 = jnp.zeros((n_c0, spec.lanes), cdt)
        z0 = z0.at[cell0_pt].add(y_pt.astype(cdt),
                                 indices_are_sorted=True, mode="drop")
        z0 = z0.at[cell0_gr].add(y_gr.astype(cdt),
                                 indices_are_sorted=True, mode="drop")
        outs = LAT._av0_adjoint_cascade(spec, z0)
        return small(jax.tree_util.tree_map(
            lambda a, b: a + 1e-3 * b, outs, x))

    def v_scan10(x, O):
        """10 chained matvecs under lax.scan (layout choices can differ
        from while_loop)."""
        def body(xs_, _):
            ys = _matvec(xs_, O)
            s = sum(jnp.sum(jnp.abs(y[:1, :1])) for y in ys) + 1.0
            return jax.tree_util.tree_map(lambda a: a / s, ys), 0.0
        out, _ = jax.lax.scan(body, x, None, length=10)
        return small(out)

    # conv-patches forward cascade: corner expansion as
    # conv_general_dilated_patches (the TPU conv emitter's own layout
    # machinery) + a fused (8v -> lanes) one-hot placement matmul that
    # also fixes the patches' channel-major corner order.  The cascade is
    # linear, so the adjoint is jax.linear_transpose (exact).
    import functools as _ft

    @_ft.lru_cache(maxsize=None)
    def _conv_place(v, d_block, lanes):
        """(v*8, lanes) one-hot: patches channel-major lane (c, corner)
        -> AV0 lane 8*v*d_block + corner*v + c."""
        m = np.zeros((v * 8, lanes), np.float32)
        for c in range(v):
            for corner in range(8):
                m[c * 8 + corner, 8 * v * d_block + corner * v + c] = 1.0
        return m

    def _place_level_conv(x_d, d):
        v = spec.k
        X, Y, Z = spec.dims[d]
        xd = x_d.reshape(X, Y, Z, v).astype(cdt)
        padc = jnp.pad(xd, ((0, 1), (0, 1), (0, 1), (0, 0)))
        p = jax.lax.conv_general_dilated_patches(
            padc[None], (2, 2, 2), (1, 1, 1), "VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))[0]
        mm = jnp.asarray(_conv_place(v, d, spec.lanes), cdt)
        return p.reshape(X * Y * Z, 8 * v) @ mm

    def _av0_cascade_conv(x):
        acc = _place_level_conv(x[spec.depth - 1], spec.depth - 1)
        for d in range(spec.depth - 2, -1, -1):
            acc = LAT._up2(acc, spec.dims[d + 1], spec.dims[d]) \
                + _place_level_conv(x[d], d)
        return acc

    def v_cascade_conv(x, O):
        return small(_av0_cascade_conv(x))

    def v_cascade_conv_adj(x, O):
        av0 = _av0_cascade_conv(x)
        adj = jax.linear_transpose(_av0_cascade_conv, x)
        outs, = adj(av0.astype(f32))
        return small(outs)

    def v_pcg16(x, O):
        """16 fixed iterations of the REAL pcg loop (solver/pcg.py) over
        the script matvec: isolates the loop-structure overhead (dots,
        axpys, precond, early-exit cond) from the production assembly."""
        from nksr_tpu.solver.pcg import pcg
        diag = jax.tree_util.tree_map(
            lambda t: jnp.ones_like(t) * 2.0, x)

        def precond(r):
            return jax.tree_util.tree_map(lambda ri, di: ri / di, r, diag)

        out, it, rr = pcg(lambda xs_: _matvec(xs_, O), x,
                          precond=precond, tol=1e-30, max_iters=16)
        return small(out) + it.astype(f32)

    variants = [("cascade", v_cascade), ("gather", v_gather),
                ("einsumA", v_einA), ("einsumAT", v_einAT),
                ("scatter", v_scatter), ("full", v_full),
                ("loop10", v_loop10), ("pcg16", v_pcg16),
                ("merged_gather", v_merged_gather),
                ("merged_full", v_merged_full),
                ("bf16_z0", v_bf16_z0),
                ("scan10", v_scan10),
                ("cascade_conv", v_cascade_conv),
                ("cascade_conv_adj", v_cascade_conv_adj)]
    only = os.environ.get("NKSR_PHASES_ONLY")
    if only:
        sel = set(only.split(","))
        variants = [v for v in variants if v[0] in sel]
    prev = 0.0
    for name, fn in variants:
        jf = jax.jit(fn)
        t0 = time.time()
        drain(jf(xs, ops))
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            drain(jf(xs, ops))
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(f"{name}: {t*1e3:7.1f} ms   (delta {max(t-prev,0)*1e3:7.1f} ms)"
            f"   reps: {' '.join(f'{x*1e3:.0f}' for x in times)}")
        prev = t


if __name__ == "__main__":
    main()
