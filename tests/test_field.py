"""Kernel field + solver tests: dense oracle, sphere reconstruction sanity,
implicit differentiation through the solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu.core import SparseFeatureHierarchy
from nksr_tpu.fields import KernelField, InterpolatorFn, LayerField
from nksr_tpu.models import Interpolators
from nksr_tpu.fields import support as S
from nksr_tpu.solver import pcg


def sphere_points(n, r=0.5, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32), v.astype(np.float32)


def make_field(xyz, depth=3, vs=0.1, caps=(8192, 4096, 2048), cb=8, seed=0):
    rng = jax.random.PRNGKey(seed)
    n = xyz.shape[0]
    svh = SparseFeatureHierarchy.build_point_splatting(
        jnp.asarray(xyz), jnp.ones(n, bool), vs, depth, caps)
    mod = Interpolators(depth=depth, kernel_dim=4)
    params = mod.init(rng, jnp.zeros((1, 3)), jnp.zeros((1, cb)))
    interp = InterpolatorFn(params=params, module=mod)
    feats = tuple(
        0.05 * jax.random.normal(jax.random.fold_in(rng, d),
                                 (caps[d], cb))
        for d in range(depth))
    return KernelField(svh=svh, features=feats, interp=interp,
                       kernel_dim=4)


def solve_sphere(field, xyz, nrm, adaptive_depth=1, **kw):
    n = xyz.shape[0]
    g0 = field.svh.grids[0]
    centers = g0.voxel_centers()
    gmask = g0.active_mask()
    m = jnp.sum(gmask)
    # targets: -outward normal at voxel centers (reference sign convention,
    # /root/reference/models/nksr_net.py:101-111 — f > 0 inside)
    cn = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-9)
    vs = field.svh.voxel_size
    pos_w = jnp.full((n,), 1e4 / n)
    normal_w = jnp.where(gmask, 1e4 / m * vs ** 2, 0.0)
    return field.solve_non_fused(
        jnp.asarray(xyz), pos_w, centers, normal_w, -cn, **kw)


class TestPCG:
    def test_pcg_matches_numpy(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(40, 40))
        A = A @ A.T + 40 * np.eye(40)
        b = rng.normal(size=(40,))
        x, iters, res = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                            tol=1e-8, max_iters=200)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-4, atol=1e-6)
        assert float(res) < 1e-7

    def test_pcg_pytree(self):
        rng = np.random.default_rng(1)
        d1 = jnp.asarray(rng.random(8) + 1)
        d2 = jnp.asarray(rng.random(5) + 1)
        b = (jnp.asarray(rng.normal(size=8)), jnp.asarray(rng.normal(size=5)))
        x, _, _ = pcg(lambda v: (d1 * v[0], d2 * v[1]), b, tol=1e-10,
                      max_iters=100)
        np.testing.assert_allclose(np.asarray(x[0]), np.asarray(b[0] / d1),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(x[1]), np.asarray(b[1] / d2),
                                   rtol=1e-5)


class TestKernelSolve:
    def test_solve_matches_dense_oracle(self):
        # tiny problem: assemble the dense normal equations from the same
        # supports and compare against numpy
        xyz, nrm = sphere_points(60, r=0.3, seed=2)
        field = make_field(xyz, depth=2, vs=0.15, caps=(256, 128))
        n = xyz.shape[0]
        g0 = field.svh.grids[0]
        centers = g0.voxel_centers()
        gmask = g0.active_mask()
        cn = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True)
                        + 1e-9)
        pos_w = jnp.full((n,), 100.0 / n)
        normal_w = jnp.where(gmask, 0.05, 0.0)
        reg = 1.0
        sol = field.solve_non_fused(jnp.asarray(xyz), pos_w, centers,
                                    normal_w, -cn, reg_weight=reg,
                                    solver_tol=1e-9, max_iters=400)

        # dense A
        sup_v = S.svh_support(field.svh, field.features, field.interp,
                              jnp.asarray(xyz))
        sup_g = S.svh_support(field.svh, field.features, field.interp,
                              centers, grad=True)
        shapes = [(g.capacity, 4) for g in field.svh.grids]
        dof = sum(s[0] * s[1] for s in shapes)

        def row_block(sup, q, grad):
            # flat layout: idx_k (Q, 8K) flat-DoF columns, basis (Q, 8K),
            # dbasis (Q, 3*8K) component-major
            row = np.zeros((3 if grad else 1, dof))
            off = 0
            for d, s in enumerate(sup):
                C, K = shapes[d]
                sk = 8 * K
                d3 = np.asarray(s.dbasis[q]).reshape(3, sk) if grad \
                    else None
                for j in range(sk):
                    col_flat = int(s.idx_k[q, j])
                    if col_flat >= 0:
                        if grad:
                            row[:, off + col_flat] = d3[:, j]
                        else:
                            row[0, off + col_flat] = float(s.basis[q, j])
                off += C * K
            return row

        A_rows, W, tgt = [], [], []
        for q in range(n):
            A_rows.append(row_block(sup_v, q, False))
            W.append([float(pos_w[q])])
            tgt.append([0.0])
        M = int(np.asarray(gmask).sum())
        for q in range(M):
            A_rows.append(row_block(sup_g, q, True))
            W.extend([[float(normal_w[q])]] * 3)
            tgt.append(np.asarray(-cn[q]).reshape(3, 1))
        A = np.concatenate(A_rows, 0)
        W = np.concatenate([np.asarray(w).reshape(-1) for w in W])
        t = np.concatenate([np.asarray(x).reshape(-1) for x in tgt])
        lhs = A.T @ (W[:, None] * A) + reg * np.eye(dof)
        rhs = A.T @ (W * t)
        alpha_dense = np.linalg.solve(lhs, rhs)

        got = np.concatenate([np.asarray(a).reshape(-1) for a in sol.alpha])
        np.testing.assert_allclose(got, alpha_dense, rtol=2e-3, atol=2e-4)

    def test_sphere_reconstruction_signs(self):
        xyz, nrm = sphere_points(2000, r=0.5, seed=3)
        field = make_field(xyz)
        field = solve_sphere(field, xyz, nrm, solver_tol=1e-6,
                             max_iters=300)
        field = field.set_mask_field(LayerField(field.svh, 1))

        f_surf = np.asarray(field.evaluate_f(jnp.asarray(xyz)).value)
        center = jnp.zeros((1, 3))
        f_center = float(field.evaluate_f_bar(center)[0])
        far = jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32)
        f_far = float(field.evaluate_f_bar(far)[0])

        assert f_center > 0, f"center should be inside, got {f_center}"
        assert f_far < 0
        # surface residual small relative to inside value
        assert np.abs(f_surf).mean() < 0.5 * f_center

        # gradient at surface points toward the center (-normal)
        ev = field.evaluate_f(jnp.asarray(xyz[:100]), grad=True)
        g = np.asarray(ev.gradient)
        dots = (g * nrm[:100]).sum(1) / (np.linalg.norm(g, axis=1) + 1e-9)
        assert dots.mean() < -0.8

    def test_inside_outside_classification(self):
        xyz, nrm = sphere_points(2000, r=0.5, seed=4)
        field = make_field(xyz)
        field = solve_sphere(field, xyz, nrm, solver_tol=1e-6,
                             max_iters=300)
        field = field.set_mask_field(LayerField(field.svh, 1))
        rng = np.random.default_rng(5)
        q = rng.uniform(-0.8, 0.8, size=(500, 3)).astype(np.float32)
        r = np.linalg.norm(q, axis=1)
        sel = np.abs(r - 0.5) > 0.1  # away from the surface band
        fbar = np.asarray(field.evaluate_f_bar(jnp.asarray(q)))
        pred_inside = fbar > 0
        acc = (pred_inside[sel] == (r[sel] < 0.5)).mean()
        assert acc > 0.95, f"classification acc {acc}"

    def test_approx_kernel_grad_close(self):
        xyz, nrm = sphere_points(800, r=0.5, seed=6)
        f1 = make_field(xyz)
        f2 = f1.replace(approx_kernel_grad=True)
        s1 = solve_sphere(f1, xyz, nrm, max_iters=200)
        s2 = solve_sphere(f2, xyz, nrm, max_iters=200)
        q = jnp.asarray(sphere_points(200, r=0.5, seed=7)[0])
        v1 = np.asarray(s1.evaluate_f(q).value)
        v2 = np.asarray(s2.evaluate_f(q).value)
        c1 = float(s1.evaluate_f(jnp.zeros((1, 3))).value[0])
        c2 = float(s2.evaluate_f(jnp.zeros((1, 3))).value[0])
        # approx mode must still fit the surface (near-zero residual there,
        # clearly positive at the center) even if coefficients differ
        assert c2 > 0 and np.abs(v2).mean() < 0.5 * c2
        assert abs(c1 - c2) < 0.5 * c1

    def test_solve_is_differentiable(self):
        xyz, nrm = sphere_points(50, r=0.3, seed=8)
        field = make_field(xyz, depth=2, vs=0.15, caps=(256, 128), seed=8)
        q = jnp.asarray(sphere_points(20, r=0.25, seed=9)[0])

        def loss(feats):
            # implicit differentiation assumes a *converged* solve; use
            # enough CG iterations that the fd check is meaningful
            f = field.replace(features=feats)
            f = solve_sphere(f, xyz, nrm, solver_tol=1e-8, max_iters=800)
            return jnp.sum(f.evaluate_f(q).value ** 2)

        g = jax.grad(loss)(field.features)
        gnorm = sum(float(jnp.abs(x).sum()) for x in g)
        assert np.isfinite(gnorm) and gnorm > 0

        # central finite-difference check on one coordinate
        feats = field.features
        eps = 3e-3
        b1 = list(feats)
        b1[0] = feats[0].at[10, 0].add(eps)
        b2 = list(feats)
        b2[0] = feats[0].at[10, 0].add(-eps)
        fd = (float(loss(tuple(b1))) - float(loss(tuple(b2)))) / (2 * eps)
        an = float(g[0][10, 0])
        assert abs(fd - an) < 0.15 * (abs(fd) + abs(an) + 1e-4), (fd, an)


class TestFusedSolve:
    def test_fused_matches_non_fused(self):
        """fused_mode recomputes supports inside each CG matvec; the math
        is identical so the fitted coefficients must match."""
        xyz, nrm = sphere_points(600, seed=7)
        field = make_field(xyz)
        f_ref = solve_sphere(field, xyz, nrm, solver_tol=1e-8,
                             max_iters=200)
        n = xyz.shape[0]
        g0 = field.svh.grids[0]
        centers = g0.voxel_centers()
        gmask = g0.active_mask()
        m = jnp.sum(gmask)
        cn = centers / (jnp.linalg.norm(centers, axis=-1,
                                        keepdims=True) + 1e-9)
        vs = field.svh.voxel_size
        pos_w = jnp.full((n,), 1e4 / n)
        normal_w = jnp.where(gmask, 1e4 / m * vs ** 2, 0.0)
        f_fused = field.solve_fused(jnp.asarray(xyz), pos_w, centers,
                                    normal_w, -cn, solver_tol=1e-8,
                                    max_iters=200)
        # CG iterate paths differ by fusion/reassociation; compare the
        # converged solutions absolutely (coefficients are O(1e-1))
        for a, b in zip(f_ref.alpha, f_fused.alpha):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-4)
