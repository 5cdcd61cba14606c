"""Microbenchmark: row scatter-add strategies for the lattice CG adjoint.

The measured bottleneck (trace 2026-08-17): the adjoint's four scatter-adds
(S=524k rows of 32 f32 lanes into dense per-depth cell tables) cost
64-68 ms EACH per CG iteration — ~126 ns/row — plus ~126 ms of layout
copies in the corner-scatter-back.  The slot->cell indices are SORTED
(nondecreasing) by construction and UNIQUE at depth 0.

This times every strategy for exploiting that structure on the real chip:

  * XLA scatter-add: plain / indices_are_sorted+unique / .set variant
  * XLA gather (rate reference) 32- and 128-wide rows
  * Pallas per-row dynamic VMEM update loop (single block: raw ns/row)
  * Pallas blocked sorted-scatter at full scale (grid over cell blocks,
    scalar-prefetched slot ranges, DMA from HBM, local dense accumulate)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from nksr_tpu.utils.profiling import drain  # noqa: E402

LOG = open("/tmp/nksr_scatterbench.log", "a", buffering=1)

S = 1 << 19          # 524288 slot rows
C0 = 5326848         # dense depth-0 cells at bench scale
REPS = 8


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def timed(name, fn, *args, per_rows=S):
    """fn(c: f32 scalar carry, *args) -> array; must USE c (hoist guard).
    Arrays go through jit ARGUMENTS (closed-over arrays would be baked
    into the HLO as constants and blow the remote-compile size limit)."""
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.reshape(-1)[0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    drain(run(*args))
    t0 = time.perf_counter()
    drain(run(*args))
    dt = (time.perf_counter() - t0) / REPS
    log(f"{name:58s} {dt*1e3:8.2f} ms   {dt/per_rows*1e9:6.1f} ns/row")
    return dt


def bump(idx, c):
    """Carry-dependent (unfoldable) zero added to indices."""
    return idx + (c > 1e30).astype(jnp.int32)


# ------------------------------------------------------- pallas: raw rates
def _rate_kernel_write(idx_ref, y_ref, o_ref):
    n = y_ref.shape[0]

    def body(r, c):
        o_ref[pl.ds(idx_ref[r], 1), :] += y_ref[pl.ds(r, 1), :]
        return c
    jax.lax.fori_loop(0, n, body, 0)


def _rate_kernel_read(idx_ref, y_ref, o_ref):
    n = y_ref.shape[0]

    def body(r, acc):
        return acc + y_ref[pl.ds(idx_ref[r], 1), :]
    acc = jax.lax.fori_loop(0, n, body,
                            jnp.zeros((1, y_ref.shape[1]), y_ref.dtype),
                            unroll=8)
    o_ref[0:1, :] = acc


def pallas_rate(mode, cap, bc, w, dtype):
    """Single-block kernel: per-row dynamic VMEM update/read rate."""
    y0 = jnp.asarray(np.random.randn(cap, w), dtype)
    idx = jnp.asarray(np.sort(np.random.randint(0, bc, cap)), jnp.int32)
    kern = _rate_kernel_write if mode == "write" else _rate_kernel_read
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((bc, w), dtype))

    dt = timed(f"pallas {mode} rate cap={cap} w={w}",
               lambda c, i, y: f(i, y + c.astype(dtype)), idx, y0,
               per_rows=cap)
    return dt


# ------------------------------------------- pallas: full blocked scatter
def _blocked_kernel(starts_ref, idx_hbm, y_hbm, o_ref,
                    y_vm, idx_vm, sem1, sem2, *, cap, bc):
    b = pl.program_id(0)
    start = starts_ref[b]
    n = starts_ref[b + 1] - start
    cp1 = pltpu.make_async_copy(y_hbm.at[pl.ds(start, cap), :], y_vm, sem1)
    cp2 = pltpu.make_async_copy(idx_hbm.at[pl.ds(start, cap)], idx_vm, sem2)
    cp1.start()
    cp2.start()
    o_ref[:] = jnp.zeros_like(o_ref)
    cp1.wait()
    cp2.wait()
    base = b * bc

    def body(r, c):
        o_ref[pl.ds(idx_vm[r] - base, 1), :] += y_vm[pl.ds(r, 1), :]
        return c
    jax.lax.fori_loop(0, n, body, 0)


def pallas_blocked(y_pad, idx_pad, starts, w, bc, cap, nb, dtype, smem_idx):
    kern = functools.partial(_blocked_kernel, cap=cap, bc=bc)
    idx_scr = pltpu.SMEM((cap,), jnp.int32) if smem_idx else \
        pltpu.VMEM((cap,), jnp.int32)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((bc, w), lambda b, s: (b, 0)),
            scratch_shapes=[pltpu.VMEM((cap, w), dtype),
                            idx_scr,
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((nb * bc, w), dtype))

    dt = timed(f"pallas blocked scatter w={w} bc={bc} cap={cap} "
               f"smem={smem_idx}",
               lambda c, s, i, y: f(s, i, y + c.astype(dtype)),
               starts, idx_pad, y_pad)
    out = f(starts, idx_pad, y_pad)
    ref = jnp.zeros((nb * bc, w), dtype).at[idx_pad[:S]].add(
        y_pad[:S], mode="drop")
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    if err > 1e-3:
        log(f"  !! MISMATCH max err {err}")
    return dt


def main():
    rng = np.random.default_rng(0)
    log(f"== scatter bench {time.strftime('%H:%M:%S')} backend="
        f"{jax.default_backend()}")

    idx_u = np.sort(rng.choice(C0, S, replace=False)).astype(np.int32)
    idx_d = np.sort(rng.integers(0, C0 // 8, S)).astype(np.int32)
    y32 = jnp.asarray(rng.standard_normal((S, 32)), jnp.float32)
    y128 = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    ju, jd = jnp.asarray(idx_u), jnp.asarray(idx_d)

    essential = os.environ.get("NKSR_BENCH_ESSENTIAL", "0") == "1"
    if not essential:
        t32 = jnp.asarray(rng.standard_normal((C0, 32)), jnp.bfloat16)
        timed("gather 32-wide bf16 (rate ref)",
              lambda c, t, i: jnp.take(t, bump(i, c), axis=0), t32, ju)
        del t32
    t128 = jnp.asarray(rng.standard_normal((C0, 128)), jnp.bfloat16)
    timed("gather 128-wide bf16",
          lambda c, t, i: jnp.take(t, bump(i, c), axis=0), t128, ju)
    del t128

    def sc(c, y, idx, w, hints, set_=False):
        at = jnp.zeros((C0, w), y.dtype).at[bump(idx, c)]
        kw = dict(indices_are_sorted=hints, unique_indices=hints,
                  mode="drop")
        return at.set(y, **kw) if set_ else at.add(y, **kw)

    if not essential:
        timed("xla scatter-add 32 plain",
              lambda c, y, i: sc(c, y, i, 32, False), y32, ju)
        timed("xla scatter-SET 32 sorted+unique",
              lambda c, y, i: sc(c, y, i, 32, True, set_=True), y32, ju)
        timed("xla scatter-add 32 sorted dup (d1-like)",
              lambda c, y, i: sc(c, y, i, 32, False), y32, jd)
    timed("xla scatter-add 32 sorted+unique",
          lambda c, y, i: sc(c, y, i, 32, True), y32, ju)
    timed("xla scatter-add 128 sorted+unique",
          lambda c, y, i: sc(c, y, i, 128, True), y128, ju)

    pallas_rate("write", 16384, 8192, 32, jnp.float32)
    pallas_rate("read", 16384, 8192, 32, jnp.float32)
    if not essential:
        pallas_rate("write", 16384, 8192, 128, jnp.float32)
        pallas_rate("read", 16384, 8192, 128, jnp.float32)

    for bc in ((8192,) if essential else (4096, 8192)):
        nb = (C0 + bc - 1) // bc
        counts = np.bincount(idx_u // bc, minlength=nb)
        cap = max(int(np.ceil(counts.max() / 256)) * 256, 512)
        starts = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        starts = jnp.asarray(starts.astype(np.int32))
        y32p = jnp.concatenate([y32, jnp.zeros((cap, 32), y32.dtype)])
        y128p = jnp.concatenate([y128, jnp.zeros((cap, 128), y128.dtype)])
        jup = jnp.concatenate([ju, jnp.zeros((cap,), jnp.int32)])
        for smem in (True, False):
            try:
                pallas_blocked(y32p, jup, starts, 32, bc, cap, nb,
                               jnp.float32, smem)
                pallas_blocked(y128p, jup, starts, 128, bc, cap, nb,
                               jnp.float32, smem)
                break
            except Exception as e:  # noqa: BLE001
                log(f"  (smem={smem} failed: {type(e).__name__}: "
                    f"{str(e)[:200]})")


if __name__ == "__main__":
    main()
