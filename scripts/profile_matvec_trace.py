"""Per-HLO-op attribution of the lattice CG matvec via the JAX profiler.

Captures an XSpace trace of 3 executions of the full fused-AV0 matvec at
the 5.33M-cell measurement spec (same shapes as measure_matvec_phases)
and prints the top ops by total device time — the ground truth for where
the cascade's measured-vs-streamed gap lives.

Usage: python scripts/profile_matvec_trace.py [out_dir]
"""

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from nksr_tpu.fields import lattice as LAT
    from nksr_tpu.utils.profiling import drain

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/matvec_trace"
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
    ops = dict(
        b_pt=jnp.asarray(rng.normal(size=(4, S_PT, 128))
                         .astype(np.float32)).astype(cdt),
        b_gr=jnp.asarray(rng.normal(size=(3, S_GR, 128))
                         .astype(np.float32)).astype(cdt),
        w_pt=jnp.asarray(rng.random((4, S_PT)).astype(np.float32)),
        w_gr=jnp.asarray(rng.random((S_GR,)).astype(np.float32)))
    n_c0 = spec.n_cells(0)

    def matvec(x, O):
        av0 = jax.lax.optimization_barrier(LAT._av0_cascade(spec, x, cdt))
        av_pt = LAT._take_rows_sorted(av0, cell0_pt, True)
        av_gr = LAT._take_rows_sorted(av0, cell0_gr, True)
        t_pt = jnp.einsum('rsl,sl->rs', O['b_pt'], av_pt,
                          preferred_element_type=f32)
        t_gr = jnp.einsum('rsl,sl->rs', O['b_gr'], av_gr,
                          preferred_element_type=f32)
        y_pt = jnp.einsum('rsl,rs->sl', O['b_pt'],
                          (O['w_pt'] * t_pt).astype(cdt),
                          preferred_element_type=f32)
        y_gr = jnp.einsum('rsl,rs->sl', O['b_gr'],
                          (O['w_gr'][None] * t_gr).astype(cdt),
                          preferred_element_type=f32)
        z0 = jnp.zeros((n_c0, spec.lanes), f32)
        z0 = z0.at[cell0_pt].add(y_pt, indices_are_sorted=True,
                                 mode="drop")
        z0 = z0.at[cell0_gr].add(y_gr, indices_are_sorted=True,
                                 mode="drop")
        outs = LAT._av0_adjoint_cascade(spec, z0)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-3 * b, outs, x)

    jf = jax.jit(matvec)
    t0 = time.time()
    drain(jf(xs, ops))
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            out = jf(xs, ops)
        drain(out)

    fl = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                          recursive=True))
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(fl[-1], "rb").read())
    agg = {}
    total = 0.0
    for pl in pd.planes:
        if "TPU" not in pl.name:
            continue
        for ln in pl.lines:
            if ln.name != "XLA Ops":
                continue
            for e in ln.events:
                # strip the %name = ... prefix to the op name only
                m = re.match(r"%(\S+)", e.name)
                key = m.group(1) if m else e.name[:60]
                agg[key] = agg.get(key, 0.0) + e.duration_ns
                total += e.duration_ns
    n_runs = 3
    print(f"\ntotal device time: {total/1e6/n_runs:.1f} ms/run "
          f"over {n_runs} runs\n")
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    for k, v in items[:40]:
        print(f"{v/1e6/n_runs:9.2f} ms  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
