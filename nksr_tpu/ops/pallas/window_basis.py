"""Pallas kernel: fused compact-support window evaluation.

Computes, for a tile of query-local offsets, the C1 bump window
``prod_a (max(0, 1 - t_a^2))^2`` and its gradient in one VMEM pass —
the elementwise core that multiplies every learned-basis evaluation
(fields/support.py).  One fused kernel instead of ~10 XLA elementwise ops
keeps the whole computation in VMEM at exactly one HBM read + write.

This is deliberately a *small, honest* kernel: the heavy field math
(gathers, MLP matmuls) stays with XLA, which already handles it well; the
kernel exists where fusion control matters and as the template for the
round-2 fused gather-matvec work (see DESIGN.md).

Falls back to plain jnp on platforms without Mosaic support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_BLOCK = 1024  # rows per grid step; cols = 8 nodes * 3 axes fused


def _kernel(t_ref, w_ref, dw_ref):
    """t: (B, 24) local offsets, axis-major blocks [x(8) | y(8) | z(8)].

    Emits w (B, 8) window values and dw (B, 24) gradients in the same
    block layout.  No reshapes (Mosaic rejects in-kernel shape casts) —
    contiguous static slices only.
    """
    t = t_ref[:]                                     # (B, 24)
    u = jnp.clip(1.0 - t * t, 0.0, None)
    u2 = u * u                                        # (B, 24)
    ux, uy, uz = u2[:, 0:8], u2[:, 8:16], u2[:, 16:24]
    w_ref[:] = ux * uy * uz                           # (B, 8)
    du = -4.0 * t * u                                 # (B, 24)
    dw_ref[:, 0:8] = du[:, 0:8] * (uy * uz)
    dw_ref[:, 8:16] = du[:, 8:16] * (ux * uz)
    dw_ref[:, 16:24] = du[:, 16:24] * (ux * uy)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def window_and_grad_fused(x_loc: jnp.ndarray, use_pallas: bool = True):
    """x_loc: (Q, 8, 3) -> (w (Q, 8), dw (Q, 8, 3)).

    Matches fields.support.window_and_grad numerically.
    """
    q = x_loc.shape[0]
    if not (_HAVE_PALLAS and use_pallas
            and jax.default_backend() == "tpu"):
        from ...fields.support import window_and_grad
        return window_and_grad(x_loc)

    # axis-major blocks: [x(8) | y(8) | z(8)]
    t = jnp.transpose(x_loc, (0, 2, 1)).reshape(q, 24)
    pad = (-q) % _BLOCK
    tp = jnp.pad(t, ((0, pad), (0, 0)))
    rows = tp.shape[0]
    w, dw = pl.pallas_call(
        _kernel,
        grid=(rows // _BLOCK,),
        in_specs=[pl.BlockSpec((_BLOCK, 24), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((_BLOCK, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_BLOCK, 24), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows, 8), x_loc.dtype),
                   jax.ShapeDtypeStruct((rows, 24), x_loc.dtype)),
    )(tp)
    dw_axes = dw[:q].reshape(q, 3, 8)
    return w[:q], jnp.transpose(dw_axes, (0, 2, 1))
