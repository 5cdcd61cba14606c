"""Bisect WHICH feature of the cascade kernels crashes the terminal's
Mosaic compile helper (round-4: simple kernels compile after a one-time
per-process warmup; `av0_cascade_pallas` fails fast with
`tpu_compile_helper subprocess exit code 1` — so one of its features is
the killer).  Probes build up from a trivial kernel to the full forward
kernel's structure, one feature at a time, in ONE process (warmup paid
once).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, flush=True)


def run(name, fn):
    t0 = time.time()
    try:
        fn()
        log(f"{name:58s} ok   ({time.time()-t0:.1f}s)")
        return True
    except Exception as e:
        log(f"{name:58s} FAIL ({time.time()-t0:.1f}s): "
            f"{type(e).__name__}: {str(e)[:160]}")
        return False


def main():
    log(f"== cascade-feature bisect backend={jax.default_backend()}")

    # 0. warmup (pays the per-process Mosaic helper warmup)
    def k0(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    run("warmup trivial kernel", lambda: np.asarray(pl.pallas_call(
        k0, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
        jnp.ones((8, 128), jnp.float32))))

    # 1. 3-D grid + pl.when on program_id(2)
    def k1(x_ref, o_ref):
        d = pl.program_id(2)
        for dd in range(2):
            @pl.when(d == dd)
            def _(dd=dd):
                if dd == 0:
                    o_ref[...] = x_ref[...] * 1.0
                else:
                    o_ref[...] += x_ref[...]
    run("3-D grid + pl.when + out accumulation", lambda: np.asarray(
        pl.pallas_call(
            k1, grid=(2, 2, 2),
            in_specs=[pl.BlockSpec((8, 64), lambda x, t, d: (x, t),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 64), lambda x, t, d: (x, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
            jnp.ones((16, 128), jnp.float32))))

    # 2. pl.Element block dims with element-offset index map
    def k2(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    run("pl.Element block dims + element index map", lambda: np.asarray(
        pl.pallas_call(
            k2, grid=(2,),
            in_specs=[pl.BlockSpec(
                (pl.Element(8), pl.Element(128)),
                lambda i: (i * 4, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
            jnp.ones((12, 128), jnp.float32))))

    # 3. index map with a right-shift of the grid index (x >> dd)
    def k3(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0
    run("index map with x >> 1", lambda: np.asarray(
        pl.pallas_call(
            k3, grid=(4,),
            in_specs=[pl.BlockSpec((8, 128), lambda x: (x >> 1, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda x: (x, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(
            jnp.ones((16, 128), jnp.float32))))

    # 4. 3-D blocks: (2, ny8, zk) input window, slice rows, concat, dot
    def k4(a_ref, z_ref, o_ref):
        a3 = a_ref[...]                       # (2, 16, 32)
        acat = jnp.concatenate(
            [a3[i, j:j + 8, :] for i in (0, 1) for j in (0, 1)],
            axis=-1)                           # (8, 128)
        o_ref[...] = jax.lax.dot_general(
            acat, z_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    run("3-D window slices + concat + dot_general", lambda: np.asarray(
        pl.pallas_call(
            k4, grid=(2,),
            in_specs=[pl.BlockSpec(
                (pl.Element(2), pl.Element(16), pl.Element(32)),
                lambda x: (x, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda x: (x, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.float32))(
            jnp.ones((3, 17, 32), jnp.float32),
            jnp.ones((128, 128), jnp.float32))))

    # 5. broadcast_to row-replication + reshape (the y-upsample)
    def k5(x_ref, o_ref):
        b = x_ref[...]
        f = 2
        o_ref[...] = jnp.broadcast_to(
            b[:, None, :], (8, f, 128)).reshape(16, 128)
    run("broadcast_to + reshape row-replicate", lambda: np.asarray(
        pl.pallas_call(
            k5, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
            jnp.ones((8, 128), jnp.float32))))

    # 6. the real forward kernel, minimal spec (depth 2)
    from nksr_tpu.fields import lattice as LAT
    from nksr_tpu.fields import lattice_pallas as LP
    spec2 = LAT.LatticeSpec(dims=((16, 16, 8), (8, 8, 8)),
                            k=4, depth=2, adaptive_depth=1,
                            s_pt=8, p_rows=4, s_gr=8, n_pts_cap=8)
    xs2 = tuple(jnp.ones((spec2.n_cells(d) * 4 // 128, 128))
                for d in range(2))
    run("av0_cascade_pallas depth-2 16x16x8", lambda: np.asarray(
        LP.av0_cascade_pallas(spec2, xs2, jnp.float32, interpret=False)))

    # 7. the real forward kernel, depth-3 probe spec
    spec3 = LAT.LatticeSpec(dims=((24, 24, 16), (16, 16, 8), (8, 8, 8)),
                            k=4, depth=3, adaptive_depth=1,
                            s_pt=8, p_rows=4, s_gr=8, n_pts_cap=8)
    xs3 = tuple(jnp.ones((spec3.n_cells(d) * 4 // 128, 128))
                for d in range(3))
    run("av0_cascade_pallas depth-3 24x24x16", lambda: np.asarray(
        LP.av0_cascade_pallas(spec3, xs3, jnp.float32, interpret=False)))

    # 8. the adjoint kernel, depth-2
    run("av0_adjoint_cascade_pallas depth-2", lambda: np.asarray(
        LP.av0_adjoint_cascade_pallas(
            spec2, jnp.ones((spec2.n_cells(0), spec2.lanes)),
            interpret=False)[0]))


if __name__ == "__main__":
    main()
