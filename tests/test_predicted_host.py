"""Parity: host-orchestrated predicted-structure path (sort-free jits +
host grid building) vs the fully-traced in-graph forward.  Both implement
the reference's default structure-predicting behavior
(/root/reference/models/nksr_net.py:74-78); they must agree on grids and
field values."""

import dataclasses

import jax
import numpy as np
import pytest

from nksr_tpu.models import pipeline as P
from nksr_tpu.recon.host_predicted import reconstruct_predicted_host

from test_field import sphere_points


@pytest.fixture(scope="module")
def setup():
    cfg = P.PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8, udf_dim=8,
                           voxel_size=0.12, capacities=(8192, 4096, 2048),
                           solver_max_iters=40, solver_tol=1e-5)
    params = P.init_params(cfg, jax.random.PRNGKey(3))

    # untrained structure heads prune everything; boost them so predicted
    # statuses vary spatially and the pruned hierarchy is non-trivial
    import jax.numpy as jnp

    def boost(path, leaf):
        ps = jax.tree_util.keystr(path)
        if "struct_" in ps and "kernel" in ps:
            return leaf * 30.0
        if "struct_" in ps and "bias" in ps:
            return jnp.asarray([0.0, 0.5, 0.3], leaf.dtype)
        return leaf
    params = jax.tree_util.tree_map_with_path(boost, params)

    xyz, nrm = sphere_points(1500, r=0.5, seed=31)
    n = xyz.shape[0]
    cap = 2048
    xyz_p = np.pad(xyz, ((0, cap - n), (0, 0)))
    nrm_p = np.pad(nrm, ((0, cap - n), (0, 0)))
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return cfg, params, xyz, xyz_p, nrm_p, mask


def test_grid_and_field_parity(setup):
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    out = P.forward(cfg, params, xyz_p, mask, nrm_p,
                    gt_svh=None, use_gt_structure=False)
    ref_field = out.field

    hf = reconstruct_predicted_host(params, cfg, xyz, xyz_p, mask, nrm_p)

    # decoder grids: identical active voxel sets, level by level
    for d in range(cfg.tree_depth):
        g = ref_field.svh.grids[d]
        nref = int(g.num_voxels)
        ref_coords = np.asarray(g.coords)[:nref]
        host_coords = hf.host_grids[d].coords
        assert nref == len(host_coords), f"level {d} count mismatch"
        np.testing.assert_array_equal(ref_coords, host_coords)

    # at least one level must actually be pruned (else the test is vacuous)
    n_dec = sum(len(g.coords) for g in hf.host_grids)
    assert n_dec > 0

    # field values agree at probe points (same solve, different plumbing)
    rng = np.random.default_rng(5)
    probes = (xyz[rng.integers(0, len(xyz), 256)]
              + rng.normal(0, 0.05, (256, 3))).astype(np.float32)
    v_ref = np.asarray(ref_field.evaluate_f(probes).value)
    v_host = hf.evaluate_f(probes).value
    np.testing.assert_allclose(v_host, v_ref, rtol=1e-4, atol=1e-5)


def test_reconstructor_default_routes_to_host_path(setup):
    from nksr_tpu import Reconstructor
    from nksr_tpu.recon.host_field import HostField
    cfg, params, xyz, _, nrm_p, _ = setup
    recon = Reconstructor(config=cfg)
    recon.network.params = params
    f = recon.reconstruct(xyz, nrm_p[:len(xyz)], detail_level=None,
                          voxel_size=0.12)
    assert isinstance(f, HostField)
    # mesh extraction must not crash even if the untrained structure head
    # prunes aggressively (empty mesh is acceptable)
    mesh = f.extract_dual_mesh()
    assert mesh.v.shape[1] == 3


def test_udf_mask_parity(setup):
    """UDF mask head (cfg.udf_enabled) through the host path must match
    the in-graph NeuralField mask (reference nksr_net.py:116-133)."""
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    cfg = dataclasses.replace(cfg, udf_enabled=True)
    out = P.forward(cfg, params, xyz_p, mask, nrm_p,
                    gt_svh=None, use_gt_structure=False)
    hf = reconstruct_predicted_host(params, cfg, xyz, xyz_p, mask, nrm_p)
    assert hf.udf_host is not None

    rng = np.random.default_rng(6)
    probes = (xyz[rng.integers(0, len(xyz), 256)]
              + rng.normal(0, 0.08, (256, 3))).astype(np.float32)
    fb_ref = np.asarray(out.field.evaluate_f_bar(probes))
    fb_host = hf.evaluate_f_bar(probes)
    np.testing.assert_allclose(fb_host, fb_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_adaptive_depth2_parity(setup):
    """adaptive_depth=2 (the scene-model config, e.g. reference
    configs/carla/train.yaml:6) through the host path."""
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    cfg = dataclasses.replace(cfg, adaptive_depth=2)
    out = P.forward(cfg, params, xyz_p, mask, nrm_p,
                    gt_svh=None, use_gt_structure=False)
    hf = reconstruct_predicted_host(params, cfg, xyz, xyz_p, mask, nrm_p)
    for d in range(cfg.tree_depth):
        nref = int(out.field.svh.grids[d].num_voxels)
        assert nref == len(hf.host_grids[d].coords)
    rng = np.random.default_rng(7)
    probes = (xyz[rng.integers(0, len(xyz), 200)]
              + rng.normal(0, 0.05, (200, 3))).astype(np.float32)
    v_ref = np.asarray(out.field.evaluate_f(probes).value)
    v_host = hf.evaluate_f(probes).value
    np.testing.assert_allclose(v_host, v_ref, rtol=1e-4, atol=1e-5)
