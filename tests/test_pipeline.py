"""End-to-end pipeline tests: points -> network -> solve -> field -> mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu.models import pipeline as P
from nksr_tpu.core import SparseFeatureHierarchy

from test_field import sphere_points


CFG = P.PipelineConfig(
    voxel_size=0.1, tree_depth=3, adaptive_depth=1, f_maps=16,
    basis_dim=8, udf_dim=8, capacities=(4096, 2048, 1024),
    solver_max_iters=100, solver_tol=1e-5)


@pytest.fixture(scope="module")
def params():
    return P.init_params(CFG, jax.random.PRNGKey(0))


def make_batch(n=1500, seed=0):
    xyz, nrm = sphere_points(n, r=0.5, seed=seed)
    cap = 2048
    pad = cap - n
    xyz_p = jnp.asarray(np.pad(xyz, ((0, pad), (0, 0))))
    nrm_p = jnp.asarray(np.pad(nrm, ((0, pad), (0, 0))))
    mask = jnp.asarray(np.arange(cap) < n)
    return xyz_p, nrm_p, mask


class TestPipeline:
    @pytest.mark.slow
    def test_forward_predicted_structure(self, params):
        xyz, nrm, mask = make_batch()
        out = P.forward(CFG, params, xyz, mask, nrm)
        assert out.field.alpha is not None
        # field evaluates without NaN
        v = np.asarray(out.field.evaluate_f(xyz[:100]).value)
        assert np.isfinite(v).all()
        # structure logits exist per depth
        assert len(out.structure_features) == CFG.tree_depth
        # decoder grids non-empty (untrained net may prune oddly, but the
        # top level comes from the encoder grid)
        assert int(out.dec_svh.grids[CFG.tree_depth - 1].num_voxels) >= 0

    def test_forward_teacher_forced(self, params):
        xyz, nrm, mask = make_batch()
        gt_svh = P.build_gt_svh(CFG, xyz, mask, nrm)
        out = P.forward(CFG, params, xyz, mask, nrm, gt_svh=gt_svh,
                        use_gt_structure=True)
        # teacher forcing: decoder hierarchy == GT hierarchy
        for d in range(CFG.tree_depth):
            assert int(out.dec_svh.grids[d].num_voxels) == \
                int(gt_svh.grids[d].num_voxels)
        v = np.asarray(out.field.evaluate_f_bar(jnp.zeros((1, 3))))
        assert np.isfinite(v).all()

    @pytest.mark.slow
    def test_forward_jits_and_caches(self, params):
        xyz, nrm, mask = make_batch()
        fwd = jax.jit(lambda p, x, m, f: P.forward(CFG, p, x, m, f,
                                                   use_gt_structure=False))
        out1 = fwd(params, xyz, mask, nrm)
        xyz2, nrm2, mask2 = make_batch(seed=1)
        out2 = fwd(params, xyz2, mask2, nrm2)  # no retrace (same shapes)
        assert np.isfinite(
            np.asarray(out2.field.evaluate_f(xyz2[:10]).value)).all()

    @pytest.mark.slow
    def test_gradients_flow_end_to_end(self, params):
        xyz, nrm, mask = make_batch(n=400)
        gt_svh = P.build_gt_svh(CFG, xyz, mask, nrm)

        def loss_fn(p):
            out = P.forward(CFG, p, xyz, mask, nrm, gt_svh=gt_svh,
                            use_gt_structure=True)
            ev = out.field.evaluate_f(xyz, grad=False)
            return jnp.sum(jnp.where(mask, ev.value, 0.0) ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert np.isfinite(total) and total > 0
        # every major submodule receives gradient
        gp = g["params"]
        for key in ["encoder", "unet", "interpolators"]:
            sub = sum(float(jnp.abs(l).sum())
                      for l in jax.tree_util.tree_leaves(gp[key]))
            assert sub > 0, f"no gradient into {key}"

    def test_neural_geometry_path(self, params):
        cfg = dataclasses.replace(CFG, geometry="neural", udf_enabled=True)
        xyz, nrm, mask = make_batch(n=600)
        out = P.forward(cfg, params, xyz, mask, nrm)
        v = np.asarray(out.field.evaluate_f(xyz[:50]).value)
        assert np.isfinite(v).all()
        m = np.asarray(out.field.mask_field.evaluate_mask(xyz[:50]))
        assert np.isfinite(m).all()


def test_bf16_conv_forward_close_to_f32():
    """conv_dtype='bfloat16' (MXU-native) stays close to the f32 forward."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nksr_tpu.models import pipeline as P
    from test_field import sphere_points

    cfg = P.PipelineConfig(tree_depth=2, f_maps=8, basis_dim=8, udf_dim=8,
                           voxel_size=0.15, capacities=(2048, 1024),
                           solver_max_iters=30, solver_tol=1e-5,
                           structure_mode="splat")
    params = P.init_params(cfg, jax.random.PRNGKey(1))
    xyz, nrm = sphere_points(600, r=0.5, seed=11)
    cap = 1024
    xyz_p = jnp.asarray(np.pad(xyz, ((0, cap - 600), (0, 0))))
    nrm_p = jnp.asarray(np.pad(nrm, ((0, cap - 600), (0, 0))))
    mask = jnp.asarray(np.arange(cap) < 600)

    out32 = P.forward(cfg, params, xyz_p, mask, nrm_p)
    cfg16 = dataclasses.replace(cfg, conv_dtype="bfloat16")
    out16 = P.forward(cfg16, params, xyz_p, mask, nrm_p)
    v32 = np.asarray(out32.field.evaluate_f(xyz_p[:600]).value)
    v16 = np.asarray(out16.field.evaluate_f(xyz_p[:600]).value)
    assert np.isfinite(v16).all()
    # bf16 convs perturb features; fields should still agree coarsely
    assert np.abs(v16 - v32).mean() < 0.05
