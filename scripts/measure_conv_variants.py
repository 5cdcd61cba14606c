"""Lowering experiments for the dense UNet's 27-tap submanifold conv at
bench scale ((424,424,48) x 32ch): the conv stack measures ~670 ms
(scripts/measure_dense_unet.py) against a ~10 ms streaming bound.

Variants:
  conv3d     — production _conv27 (NXYZC conv_general_dilated)
  conv2d_z   — z as BATCH: 3 x 2D 3x3 convs (one per z-offset), shifted
               adds; same math, no 3-D spatial windowing
  shiftmm    — 27 shifted reads + (cells, C) @ (C, C) matmuls
  conv2d_zc  — z folded into channels (block-tridiagonal 2D conv)

Usage: python scripts/measure_conv_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from nksr_tpu.utils.profiling import drain

    X, Y, Z, C = 424, 424, 48, 32
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(X * Y * Z, C)).astype(np.float32))
    w27 = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32)
                      * 0.05)
    b = jnp.asarray(np.zeros((C,), np.float32))

    def conv3d(x, w27, b):
        k = w27.reshape(3, 3, 3, C, C).astype(cdt)
        out = jax.lax.conv_general_dilated(
            x.reshape(1, X, Y, Z, C).astype(cdt), k,
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32)
        return out.reshape(X * Y * Z, C) + b

    def conv2d_z(x, w27, b):
        # z as batch: for each dz, one 2D 3x3 conv over (X, Y), then a
        # z-shifted add.  Tap order: ((dx+1)*3+(dy+1))*3+(dz+1).
        k = w27.reshape(3, 3, 3, C, C).astype(cdt)
        xb = jnp.moveaxis(x.reshape(X, Y, Z, C), 2, 0).astype(cdt)
        out = None
        for dz in range(3):
            o = jax.lax.conv_general_dilated(
                xb, k[:, :, dz], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NXYC", "XYIO", "NXYC"),
                preferred_element_type=jnp.float32)
            # out[z] += o[z + dz - 1]  (z batch shift, zero at edges)
            s = dz - 1
            if s == 0:
                oz = o
            elif s > 0:
                oz = jnp.concatenate(
                    [o[s:], jnp.zeros((s,) + o.shape[1:], o.dtype)], 0)
            else:
                oz = jnp.concatenate(
                    [jnp.zeros((-s,) + o.shape[1:], o.dtype), o[:s]], 0)
            out = oz if out is None else out + oz
        return jnp.moveaxis(out, 0, 2).reshape(X * Y * Z, C) + b

    def shiftmm(x, w27, b):
        xd = x.reshape(X, Y, Z, C).astype(cdt)
        out = jnp.zeros((X, Y, Z, C), jnp.float32)
        t = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sh = xd
                    for ax, s in ((0, dx), (1, dy), (2, dz)):
                        if s:
                            pad = [(0, 0)] * 4
                            sl = [slice(None)] * 4
                            if s > 0:
                                sl[ax] = slice(s, None)
                                pad[ax] = (0, s)
                            else:
                                sl[ax] = slice(0, sh.shape[ax] + s)
                                pad[ax] = (-s, 0)
                            sh = jnp.pad(sh[tuple(sl)], pad)
                    out = out + (sh.reshape(-1, C)
                                 @ w27[t].astype(cdt)).reshape(
                        X, Y, Z, C).astype(jnp.float32)
                    t += 1
        return out.reshape(-1, C) + b

    variants = [("conv3d", conv3d), ("conv2d_z", conv2d_z),
                ("shiftmm", shiftmm)]
    ref = None
    for name, fn in variants:
        jf = jax.jit(fn)
        t0 = time.time()
        out = jf(x, w27, b)
        drain(out)
        print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            drain(jf(x, w27, b))
            ts.append(time.perf_counter() - t0)
        o = np.asarray(out[: 1 << 20])
        if ref is None:
            ref = o
            err = 0.0
        else:
            err = float(np.max(np.abs(o - ref))
                        / (np.max(np.abs(ref)) + 1e-9))
        print(f"{name}: {min(ts)*1e3:7.1f} ms   rel_err {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
