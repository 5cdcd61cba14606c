"""Preconditioned conjugate gradients over pytrees, with implicit
differentiation via ``lax.custom_linear_solve``.

TPU-native replacement for the reference wheel's CUDA CG solver behind
``KernelField.solve_non_fused`` (/root/reference/models/nksr_net.py:105-112).
The reference backpropagates *through* the CG iterations (and must keep the
SVH alive via a cache hack, /root/reference/models/nksr_net.py:26-29); we
differentiate implicitly instead — the backward pass is one more CG solve,
which is both faster and O(1) in memory.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _tree_dot(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)),
        a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def _axpy(a, x, y):  # a*x + y
    return jax.tree_util.tree_map(lambda u, v: a * u + v, x, y)


def pcg(matvec: Callable, b, precond: Optional[Callable] = None,
        tol: float = 1e-5, max_iters: int = 100):
    """Solve M x = b for SPD operator ``matvec`` with Jacobi/identity
    preconditioning.  Fixed-shape while_loop; early exit on relative
    residual < tol.  Returns (x, iters, rel_residual)."""
    if precond is None:
        precond = lambda r: r

    b_norm = jnp.sqrt(_tree_dot(b, b)) + 1e-30
    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = _tree_dot(r0, z0)
    rr0 = _tree_dot(r0, r0)

    def cond(state):
        i, _, _, _, _, rr = state
        return (i < max_iters) & (jnp.sqrt(rr) / b_norm > tol)

    def body(state):
        i, x, r, p, rz, _ = state
        mp = matvec(p)
        alpha = rz / (_tree_dot(p, mp) + 1e-30)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, mp, r)
        z = precond(r)
        rz_new = _tree_dot(r, z)
        beta = rz_new / (rz + 1e-30)
        p = _axpy(beta, p, z)
        return i + 1, x, r, p, rz_new, _tree_dot(r, r)

    i, x, r, p, rz, rr = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x0, r0, p0, rz0, rr0))
    return x, i, jnp.sqrt(rr) / b_norm


def solve_spd(matvec: Callable, b, precond: Optional[Callable] = None,
              tol: float = 1e-5, max_iters: int = 100):
    """Differentiable SPD solve: forward = PCG, backward = PCG on the
    transpose system (== same system; symmetric=True)."""

    def solve(mv, rhs):
        x, _, _ = pcg(mv, rhs, precond=precond, tol=tol,
                      max_iters=max_iters)
        return x

    return jax.lax.custom_linear_solve(matvec, b, solve, symmetric=True)
