"""Microbenchmark: the row gather/scatter patterns available to the
lattice CG matvec, at bench scale (1M-pt scene).

The matvec's only random accesses are slot-granular row gathers (forward)
and row scatter-adds (adjoint).  This times every layout variant on the
real chip so the engine uses the measured-fastest one:

  * current:  4 depth-gathers of 32-wide rows per slot family
  * fused:    1 gather of a 128-wide row from an upsampled AV0 buffer
  * sorted vs random indices, with/without indices_are_sorted
  * f32 vs bf16 rows
  * the dense upsample (coarse av -> depth-0 lattice) that fused needs

Each op runs inside a 10x fori_loop in one jit; carry-dependence keeps
XLA from hoisting the op out of the loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nksr_tpu.utils.profiling import drain  # noqa: E402

LOG = open("/tmp/nksr_gatherbench.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def timed(name, fn, *args, reps=10):
    @jax.jit
    def run(*a):
        def body(i, c):
            return fn(c, *a[1:])
        return jax.lax.fori_loop(0, reps, body, a[0])

    out = run(*args)
    drain(out)
    t0 = time.perf_counter()
    out = run(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:56s} {dt*1e3:8.1f} ms")
    return dt


def take_rows(tab, idx, sorted_):
    """jnp.take(tab, idx, axis=0) with explicit sortedness hint."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    return jax.lax.gather(
        tab, idx[:, None], dnums, (1, tab.shape[1]),
        indices_are_sorted=sorted_, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP)


def main():
    NC0 = 400 * 400 * 32        # ~5.1M depth-0 cells
    S = 1 << 20                 # ~1M slots (gr family; pt adds 0.25M)
    rng = np.random.default_rng(0)

    idx_rand = rng.integers(0, NC0, size=S).astype(np.int32)
    idx_sort = np.sort(idx_rand)
    j_rand, j_sort = jnp.asarray(idx_rand), jnp.asarray(idx_sort)

    for w in (32, 128):
        tab = jnp.asarray(rng.normal(size=(NC0, w)).astype(np.float32))
        tab16 = tab.astype(jnp.bfloat16)
        y = jnp.asarray(rng.normal(size=(S, w)).astype(np.float32))
        y16 = y.astype(jnp.bfloat16)

        def g(c, t, i, s):
            r = take_rows(t, i, s)
            return c + r.astype(jnp.float32).sum()

        timed(f"take w={w} f32 random", g, jnp.zeros(()), tab, j_rand, False)
        timed(f"take w={w} f32 sorted", g, jnp.zeros(()), tab, j_sort, False)
        timed(f"take w={w} f32 sorted+hint", g, jnp.zeros(()), tab,
              j_sort, True)
        timed(f"take w={w} bf16 sorted+hint", g, jnp.zeros(()), tab16,
              j_sort, True)

        def sc(c, yv, i):
            acc = jnp.zeros((NC0, w), yv.dtype).at[i].add(
                yv, indices_are_sorted=True)
            return c + acc.astype(jnp.float32).sum()

        timed(f"scatter-add w={w} f32 sorted+hint", sc, jnp.zeros(()), y,
              j_sort)
        timed(f"scatter-add w={w} bf16 sorted+hint", sc, jnp.zeros(()),
              y16, j_sort)

    # dense upsample coarse->fine (what the fused AV0 buffer costs):
    # depth-1 (200,200,16,32) -> (400,400,32,32)
    av1 = jnp.asarray(rng.normal(size=(200, 200, 16, 32)).astype(np.float32))

    def up(c, a):
        b = jnp.broadcast_to(a[:, None, :, None, :, None, :],
                             (200, 2, 200, 2, 16, 2, 32))
        return c + b.reshape(400, 400, 32, 32).sum()

    timed("dense upsample d1->d0 (x8, 32ch) f32", up, jnp.zeros(()), av1)

    # one-hot segment alternative: einsum over 8 corner shifts is dense —
    # measure the pure HBM streaming cost of touching AV0 once
    big = jnp.asarray(rng.normal(size=(NC0, 128)).astype(np.float32))
    timed("stream (5.1M,128) f32 (sum)",
          lambda c, t: c + t.sum(), jnp.zeros(()), big)


if __name__ == "__main__":
    main()
