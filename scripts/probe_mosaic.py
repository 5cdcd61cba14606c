"""Probe: which Mosaic (Pallas-TPU) ops the lattice kernels may rely on.

Each probe compiles + runs a tiny kernel on the real chip and prints
ok/FAIL.  Decides the implementation strategy for the fused-AV0 matvec
(see fields/lattice.py): pack relayouts, strided row slices, static lane
permutes, dynamic rolls.
"""
import sys, os, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG = open("/tmp/nksr_mosaic_probe.log", "a", buffering=1)


def log(m):
    print(m, flush=True)
    LOG.write(m + "\n")


def probe(name, kernel, in_shape, out_shape, check=None):
    x = jnp.asarray(np.arange(np.prod(in_shape), dtype=np.float32)
                    .reshape(in_shape))
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))
        out = np.asarray(jax.jit(f)(x))
        ok = True if check is None else check(np.asarray(x), out)
        log(f"{name:48s} {'ok' if ok else 'WRONG RESULT'}")
    except Exception as e:
        log(f"{name:48s} FAIL: {type(e).__name__}: {str(e)[:140]}")


def main():
    log(f"== mosaic probe backend={jax.default_backend()}")

    # 1. pack relayout: (256, 32) -> (64, 128)  [cell-rows -> flat view]
    def k_pack(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(64, 128)
    probe("reshape (256,32)->(64,128) [pack]", k_pack, (256, 32), (64, 128),
          lambda x, o: np.array_equal(x.reshape(64, 128), o))

    # 2. unpack relayout: (64, 128) -> (256, 32)
    def k_unpack(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(256, 32)
    probe("reshape (64,128)->(256,32) [unpack]", k_unpack, (64, 128),
          (256, 32), lambda x, o: np.array_equal(x.reshape(256, 32), o))

    # 3. 1-D -> 2-D: (8192,) -> (64, 128)
    def k_1d2d(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(64, 128)
    probe("reshape (8192,)->(64,128)", k_1d2d, (8192,), (64, 128),
          lambda x, o: np.array_equal(x.reshape(64, 128), o))

    # 4. strided row slice: a[0::2] on (256, 128)
    def k_stride(i_ref, o_ref):
        o_ref[:] = i_ref[:][0::2]
    probe("strided rows a[0::2] (256,128)", k_stride, (256, 128),
          (128, 128), lambda x, o: np.array_equal(x[0::2], o))

    # 5. static lane permute via take along axis 1
    def k_perm(i_ref, o_ref):
        idx = jnp.arange(127, -1, -1)
        o_ref[:] = jnp.take(i_ref[:], idx, axis=1)
    probe("static lane permute take(axis=1)", k_perm, (64, 128), (64, 128),
          lambda x, o: np.array_equal(x[:, ::-1], o))

    # 6. static lane-slice concat (element shift by 4 with row carry)
    def k_shift(i_ref, o_ref):
        a = i_ref[:]
        top = jnp.concatenate([a[:, 4:], jnp.roll(a, -1, axis=0)[:, :4]], 1)
        o_ref[:] = top
    probe("lane slice+concat shift-4", k_shift, (64, 128), (64, 128))

    # 7. dynamic roll along lanes
    def k_droll(i_ref, o_ref):
        s = jnp.sum(i_ref[0, 0:1]).astype(jnp.int32) % 128
        o_ref[:] = pltpu.roll(i_ref[:], s, 1)
    probe("pltpu.roll dynamic lanes", k_droll, (64, 128), (64, 128))

    # 8. leading-dim split reshape (3-D view) + sum
    def k_lead(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(8, 32, 128).sum(axis=1)
    probe("reshape (256,128)->(8,32,128)+sum", k_lead, (256, 128), (8, 128),
          lambda x, o: np.allclose(x.reshape(8, 32, 128).sum(1), o))

    # 9. broadcast rows (upsample y): (64,128) -> (128,128) pair-replicate
    def k_up(i_ref, o_ref):
        a = i_ref[:]
        b = jnp.broadcast_to(a[:, None, :], (64, 2, 128)).reshape(128, 128)
        o_ref[:] = b
    probe("row pair-replicate via bcast+reshape", k_up, (64, 128),
          (128, 128), lambda x, o: np.array_equal(np.repeat(x, 2, 0), o))

    # 10. strided row WRITE: o[0::2] = a
    def k_swrite(i_ref, o_ref):
        o_ref[0::2] = i_ref[:]
        o_ref[1::2] = i_ref[:]
    probe("strided row write o[0::2]", k_swrite, (128, 128), (256, 128),
          lambda x, o: np.array_equal(np.repeat(x, 2, 0), o))

    # 11. dynamic sublane read row (known-good baseline)
    def k_dynrow(i_ref, o_ref):
        r = jnp.sum(i_ref[0, 0:1]).astype(jnp.int32) % 64
        o_ref[0:1, :] = i_ref[pl.ds(r, 1), :]
    probe("dynamic row read", k_dynrow, (64, 128), (1, 128))


if __name__ == "__main__":
    main()
