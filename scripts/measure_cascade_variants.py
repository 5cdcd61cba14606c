"""Compare AV0-cascade implementations standalone at bench shapes.

The committed cascade (_av0_cascade: per-level one-hot place + up2 chain)
measured 66.8 ms/apply on the v5e — ~20x the HBM streaming bound for its
1.36 GB output.  This times each candidate rewrite in one TPU session:

  place0     — _place_level at depth 0 only (the finest relayout)
  placeall   — all 4 _place_level calls (no up2, no adds)
  cascade    — the committed _av0_cascade (place + up2 + adds)
  adjoint    — the committed _av0_adjoint_cascade (f32 back path)
  v1_av0     — slice/concat corner_cat + static upsample (_av0, phase 0)
  v1_adjoint — its adjoint (_av0_adjoint)

Usage: python scripts/measure_cascade_variants.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open("/tmp/nksr_cascade_variants.log", "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    print(msg, flush=True)


def main():
    from nksr_tpu.fields import lattice as LAT
    from nksr_tpu.utils.profiling import drain

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    K = 4
    spec = LAT.LatticeSpec(
        dims=((408, 408, 32), (208, 208, 16), (104, 104, 8), (56, 56, 8)),
        k=K, depth=4, adaptive_depth=1,
        s_pt=1 << 18, p_rows=4, s_gr=1 << 20, n_pts_cap=1 << 20)
    cdt = jnp.bfloat16
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(
        rng.normal(size=(spec.n_cells(d) * K // 128, 128))
        .astype(np.float32)) for d in range(4))
    xs_flat = tuple(x.reshape(-1) for x in xs)
    z0 = jnp.asarray(rng.normal(
        size=(spec.n_cells(0), spec.lanes)).astype(np.float32))
    phase0 = tuple((0, 0, 0) for _ in range(4))

    def small(tree):
        return sum(jnp.sum(t[..., :1].astype(f32)) for t in
                   jax.tree_util.tree_leaves(tree))

    def v_place0(x):
        return small(LAT._place_level(spec, x[0], 0, cdt))

    def v_placeall(x):
        return small([LAT._place_level(spec, x[d], d, cdt)
                      for d in range(4)])

    def v_cascade(x):
        return small(LAT._av0_cascade(spec, x, cdt))

    def v_adjoint(_):
        return small(LAT._av0_adjoint_cascade(spec, z0))

    def v1_av0(_):
        return small(LAT._av0(spec, xs_flat, phase0, cdt))

    def v1_adjoint(_):
        return small(LAT._av0_adjoint(spec, z0, phase0))

    # -- composed one-matmul placement: window extraction + lane roll +
    # corner permutation + lane placement as ONE one-hot (128*|offs|,
    # 32*lanes) matrix (vs _place_level's concat + 2 matmuls).
    def _comp_mat(d):
        v, lanes = spec.k, spec.lanes
        strides = spec.corner_strides(d)
        offs = sorted({qq for s in strides
                       for qq in (divmod(s * v, 128)[0],)
                       } | {divmod(s * v, 128)[0] + 1 for s in strides
                            if divmod(s * v, 128)[1]})
        o_pos = {o: ix for ix, o in enumerate(offs)}
        n_lanes_out = (128 // v) * lanes            # 4096 at default
        m = np.zeros((128 * len(offs), n_lanes_out), np.float32)
        for j in range(n_lanes_out):
            w = j % lanes
            blk, wl = divmod(w, 8 * v)
            if blk != d:
                continue
            i_c, jj = divmod(wl, v)
            s = strides[i_c]
            q, l = divmod(s * v, 128)
            lane = l + v * (j // lanes) + jj
            if lane >= 128:
                q, lane = q + 1, lane - 128
            m[128 * o_pos[q] + lane, j] = 1.0
        return offs, m

    def _place_comp(xp, d, dtype):
        v = spec.k
        n = spec.n_cells(d)
        t = n * v // 128
        offs, m = _comp_mat(d)
        a = jnp.concatenate(
            [xp.astype(dtype), jnp.zeros((offs[-1] + 1, 128), dtype)], 0)
        H = jnp.concatenate([jax.lax.slice(a, (o, 0), (o + t, 128))
                             for o in offs], axis=1)
        out = H @ jnp.asarray(m, dtype)
        return out.reshape(n, spec.lanes)

    def v_place0_comp(x):
        return small(_place_comp(x[0], 0, cdt))

    def v_cascade_comp(x):
        acc = _place_comp(x[3], 3, cdt)
        for d in range(2, -1, -1):
            acc = LAT._up2(acc, spec.dims[d + 1], spec.dims[d]) \
                + _place_comp(x[d], d, cdt)
        return small(acc)

    variants = [("place0", v_place0), ("place0_comp", v_place0_comp),
                ("placeall", v_placeall),
                ("cascade", v_cascade), ("cascade_comp", v_cascade_comp),
                ("adjoint", v_adjoint),
                ("v1_av0", v1_av0), ("v1_adjoint", v1_adjoint)]
    for name, fn in variants:
        jf = jax.jit(fn)
        try:
            t0 = time.time()
            drain(jf(xs))
            log(f"{name}: compile+run {time.time()-t0:.1f}s")
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                drain(jf(xs))
                times.append(time.perf_counter() - t0)
            log(f"{name}: {min(times)*1e3:7.1f} ms   reps: "
                f"{' '.join(f'{x*1e3:.0f}' for x in times)}")
        except Exception as e:
            log(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
