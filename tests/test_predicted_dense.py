"""Parity: the dense in-graph predicted-structure route
(recon/predicted_dense.py) vs the fully-traced reference forward.
Pins the default engine of the reference's default inference path
(/root/reference/models/nksr_net.py:74-78): predicted grids must equal
the in-graph decode cell-for-cell, and field values must match."""

import dataclasses

import jax
import numpy as np
import pytest

from nksr_tpu.models import pipeline as P
from nksr_tpu.recon.predicted_dense import reconstruct_predicted_dense

from test_field import sphere_points


@pytest.fixture(scope="module")
def setup():
    cfg = P.PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8, udf_dim=8,
                           voxel_size=0.12, capacities=(8192, 4096, 2048),
                           solver_max_iters=40, solver_tol=1e-5)
    params = P.init_params(cfg, jax.random.PRNGKey(3))

    import jax.numpy as jnp

    def boost(path, leaf):
        ps = jax.tree_util.keystr(path)
        if "struct_" in ps and "kernel" in ps:
            return leaf * 30.0
        if "struct_" in ps and "bias" in ps:
            # refine-heavy: the decoder hierarchy reaches depth 0, so
            # the solve has gradient rows and field parity is
            # non-vacuous (a keep-only bias left only depth-2 voxels ->
            # zero alpha -> the field assertions compared zeros)
            return jnp.asarray([0.0, 0.5, 3.0], leaf.dtype)
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


def test_dense_route_grid_and_field_parity(setup):
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    out = P.forward(cfg, params, xyz_p, mask, nrm_p,
                    gt_svh=None, use_gt_structure=False)
    ref_field = out.field

    hf = reconstruct_predicted_dense(params, cfg, xyz, xyz_p, mask, nrm_p)
    assert hf is not None
    assert hf.lattice_ctx is not None   # rides the lattice engine

    for d in range(cfg.tree_depth):
        g = ref_field.svh.grids[d]
        nref = int(g.num_voxels)
        ref_coords = np.asarray(g.coords)[:nref]
        dense_coords = hf.host_grids[d].coords
        assert nref == len(dense_coords), f"level {d} count mismatch"
        np.testing.assert_array_equal(ref_coords, dense_coords)
    assert sum(len(g.coords) for g in hf.host_grids) > 0

    rng = np.random.default_rng(5)
    probes = (xyz[rng.integers(0, len(xyz), 256)]
              + rng.normal(0, 0.05, (256, 3))).astype(np.float32)
    v_ref = np.asarray(ref_field.evaluate_f(probes).value)
    v_dense = hf.evaluate_f(probes).value
    scale = float(np.abs(v_ref).max())
    assert scale > 1e-6   # non-vacuous parity
    # same math, different row orderings -> CG iterates differ by
    # round-off; measured max drift 0.46% of the field scale at
    # tol=1e-5/40 iters on the refine-heavy fixture
    np.testing.assert_allclose(v_dense, v_ref, rtol=0, atol=0.01 * scale)


def test_dense_route_udf_mask_parity(setup):
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    cfg = dataclasses.replace(cfg, udf_enabled=True)
    out = P.forward(cfg, params, xyz_p, mask, nrm_p,
                    gt_svh=None, use_gt_structure=False)
    hf = reconstruct_predicted_dense(params, cfg, xyz, xyz_p, mask, nrm_p)
    assert hf is not None and hf.udf_host is not None

    rng = np.random.default_rng(6)
    probes = (xyz[rng.integers(0, len(xyz), 256)]
              + rng.normal(0, 0.08, (256, 3))).astype(np.float32)
    fb_ref = np.asarray(out.field.evaluate_f_bar(probes))
    fb_dense = hf.evaluate_f_bar(probes)
    scale = float(np.abs(fb_ref).max())
    assert scale > 1e-6   # non-vacuous (see grid_and_field twin)
    np.testing.assert_allclose(fb_dense, fb_ref, rtol=0,
                               atol=0.01 * scale)


def test_dense_route_mesh_extraction(setup):
    """End of the user recipe: the dense predicted route must mesh
    through the dense device dual-MC (no host fallback at this scale)."""
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    hf = reconstruct_predicted_dense(params, cfg, xyz, xyz_p, mask, nrm_p)
    assert hf is not None
    mesh = hf.extract_dual_mesh(mise_iter=1)
    assert mesh.v.shape[1] == 3 and mesh.f.shape[1] == 3
    assert len(mesh.v) > 100
    # the surface sheet must exist near the input cloud (r=0.5); the
    # refine-heavy untrained prediction also keeps far voxels whose
    # zero-crossings produce an outer trust-shell sheet — that is
    # LayerField-mask semantics, not a meshing bug, so only the
    # near-surface sheet is asserted
    r = np.linalg.norm(mesh.v, axis=1)
    assert (np.abs(r - 0.5) < 0.15).sum() > 100


def test_fully_pruned_prediction_falls_back(setup):
    """An untrained head that prunes everything must return None (the
    host route owns the empty-prediction warning semantics)."""
    cfg, params, xyz, xyz_p, nrm_p, mask = setup
    import jax.numpy as jnp

    def crush(path, leaf):
        ps = jax.tree_util.keystr(path)
        if "struct_" in ps and "kernel" in ps:
            return leaf * 0.0
        if "struct_" in ps and "bias" in ps:
            return jnp.asarray([100.0, 0.0, 0.0], leaf.dtype)
        return leaf
    params0 = jax.tree_util.tree_map_with_path(crush, params)
    hf = reconstruct_predicted_dense(params0, cfg, xyz, xyz_p, mask,
                                     nrm_p)
    assert hf is None
