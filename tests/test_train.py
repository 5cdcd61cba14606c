"""Training stack tests: losses compute, optimizer steps, overfit converges
(the reference's overfit-as-test strategy, /root/reference/overfit.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu.models import pipeline as P
from nksr_tpu.train import losses as L
from nksr_tpu.train import loop as T

from test_field import sphere_points


CFG = P.PipelineConfig(
    voxel_size=0.1, tree_depth=3, adaptive_depth=1, f_maps=16,
    basis_dim=8, udf_dim=8, capacities=(2048, 1024, 512),
    solver_max_iters=40, solver_tol=1e-4)

LCFG = L.LossConfig(
    spatial_samplers=(L.SamplerConfig("uniform", 2048, 1, 3),
                      L.SamplerConfig("band", 2048)),
    udf_samplers=(L.SamplerConfig("uniform", 1024, 1, 3),
                  L.SamplerConfig("band", 512)),
    gt_surface_subsample=2048)

TC = T.TrainConfig(lr_init=2e-3, structure_start_step=0,
                   structure_end_step=1)


def make_batch(n=800, seed=0):
    xyz, nrm = sphere_points(n, r=0.5, seed=seed)
    cap = 1024
    pad = cap - n
    p = lambda a: jnp.asarray(np.pad(a, ((0, pad), (0, 0))))
    mask = jnp.asarray(np.arange(cap) < n)
    return {"xyz": p(xyz), "normal": p(nrm), "mask": mask,
            "gt_xyz": p(xyz), "gt_normal": p(nrm), "gt_mask": mask}


class TestLosses:
    def test_losses_finite(self):
        state = T.init_state(CFG, TC, jax.random.PRNGKey(0))
        batch = make_batch()
        state, losses, metrics = T.train_step(
            CFG, TC, LCFG, state, batch, jax.random.PRNGKey(1),
            use_gt_structure=True, compute_metric=True)
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} = {v}"
        assert "struct-0" in losses and "spatial" in losses
        assert "gt-surface-value" in losses

    def test_sampler_shapes(self):
        batch = make_batch()
        gt_svh = P.build_gt_svh(CFG, batch["gt_xyz"], batch["gt_mask"],
                                batch["gt_normal"])
        s = L.get_samples(jax.random.PRNGKey(0), CFG,
                          LCFG.spatial_samplers, gt_svh,
                          batch["gt_xyz"], batch["gt_normal"],
                          batch["gt_mask"])
        assert s.shape == (4096, 3)
        assert np.isfinite(np.asarray(s)).all()
        # uniform samples live near the hierarchy (coarsest voxel 0.4 with
        # expand_top=3 reaches ~1.1 beyond the r=0.5 surface, worst case)
        r = np.linalg.norm(np.asarray(s[:2048]), axis=1)
        assert (np.abs(r - 0.5) < 2.0).all()
        # band samples hug the surface
        rb = np.linalg.norm(np.asarray(s[2048:]), axis=1)
        assert (np.abs(rb - 0.5) < 0.5).all()

    def test_gt_tsdf_sign(self):
        batch = make_batch()
        from nksr_tpu.ops import knn as K
        table = K.build_buckets(batch["gt_xyz"], batch["gt_mask"],
                                0.4, 2048, 32)
        q = jnp.asarray([[0.0, 0.0, 0.3], [0.0, 0.0, 0.7]], jnp.float32)
        tsdf = np.asarray(L.gt_tsdf_from_points(
            CFG, LCFG, table, q, batch["gt_xyz"], batch["gt_normal"]))
        assert tsdf[0] > 0   # inside the sphere (field positive inside)
        assert tsdf[1] < 0   # outside


class TestOverfit:
    def test_overfit_sphere_converges(self):
        state = T.init_state(CFG, TC, jax.random.PRNGKey(0))
        batch = make_batch()
        hist = []
        for i in range(12):
            rng = jax.random.PRNGKey(100 + i)
            state, losses, _ = T.train_step(
                CFG, TC, LCFG, state, batch, rng, use_gt_structure=True)
            hist.append(float(losses["sum"]))
        last3 = np.mean(hist[-3:])
        first3 = np.mean(hist[:3])
        assert np.isfinite(last3)
        assert last3 < 0.85 * first3, f"no convergence: {hist}"

    def test_val_step(self):
        state = T.init_state(CFG, TC, jax.random.PRNGKey(0))
        batch = make_batch(seed=2)
        losses, metrics = T.val_step(CFG, LCFG, state.params, batch,
                                     jax.random.PRNGKey(3))
        assert np.isfinite(float(losses["sum"]))
        assert "struct-acc-0" in metrics
