"""Host-orchestrated (sort-free) inference path vs the in-graph path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu import Reconstructor
from nksr_tpu.core import host_build as HB
from nksr_tpu.models import pipeline as P

from test_field import sphere_points


class TestHostBuild:
    def test_host_grids_match_device(self):
        xyz, _ = sphere_points(800, r=0.5, seed=31)
        grids = HB.build_splat_grids(xyz, 0.1, 3)
        from nksr_tpu.core import SparseFeatureHierarchy
        svh = SparseFeatureHierarchy.build_point_splatting(
            jnp.asarray(xyz), jnp.ones(800, bool), 0.1, 3,
            (8192, 4096, 2048))
        for d in range(3):
            n_dev = int(svh.grids[d].num_voxels)
            assert len(grids[d].keys) == n_dev
            dev_coords = np.asarray(svh.grids[d].coords)[:n_dev]
            np.testing.assert_array_equal(grids[d].coords, dev_coords)

    def test_host_lookup_matches_device(self):
        xyz, _ = sphere_points(500, r=0.5, seed=32)
        grids = HB.build_splat_grids(xyz, 0.1, 1)
        from nksr_tpu.core import SparseFeatureHierarchy
        svh = SparseFeatureHierarchy.build_point_splatting(
            jnp.asarray(xyz), jnp.ones(500, bool), 0.1, 1, (8192,))
        q = np.concatenate([grids[0].coords[:100],
                            np.full((50, 3), 60, np.int32)])
        host = HB.lookup(grids[0], q.astype(np.int64))
        dev = np.asarray(svh.grids[0].lookup(jnp.asarray(q)))
        np.testing.assert_array_equal(host, dev)


class TestHostReconstruct:
    @pytest.fixture(scope="class")
    def fields(self):
        from nksr_tpu.models import pipeline as P
        cfg = P.PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8,
                               udf_dim=8, solver_max_iters=60,
                               solver_tol=1e-5)
        recon = Reconstructor(config=cfg)
        xyz, nrm = sphere_points(1500, r=0.5, seed=33)
        host_f = recon.reconstruct(xyz, nrm, voxel_size=0.1,
                                   detail_level=None, structure="splat")
        return recon, xyz, nrm, host_f

    def test_host_field_evaluates(self, fields):
        recon, xyz, nrm, hf = fields
        f_surf = hf.evaluate_f(xyz[:200]).value
        assert np.abs(f_surf).mean() < 0.1
        # probe just inside the surface (the exact center sits at the edge
        # of the coarsest level's support — noisy with untrained weights)
        inner = np.asarray([[0.0, 0.0, 0.35]], np.float32)
        assert hf.evaluate_f_bar(inner)[0] > 0
        far = np.full((1, 3), 2.0, np.float32)
        assert hf.evaluate_f_bar(far)[0] < 0

    def test_host_meshing(self, fields):
        recon, xyz, nrm, hf = fields
        mesh = hf.extract_dual_mesh(mise_iter=1)
        assert mesh.v.shape[0] > 100 and mesh.f.shape[0] > 100
        used = np.unique(mesh.f)
        r = np.linalg.norm(mesh.v[used], axis=1)
        assert np.abs(r - 0.5).mean() < 0.05
        # closed surface
        edges = np.sort(np.concatenate(
            [mesh.f[:, [0, 1]], mesh.f[:, [1, 2]], mesh.f[:, [2, 0]]]),
            axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_mise_subdivides(self, fields):
        """mise_iter performs hierarchical subdivision: each round halves
        the near-surface cell size, so vertex count grows ~4x per round
        (surface-area scaling) and accuracy does not regress."""
        recon, xyz, nrm, hf = fields
        m0 = hf.extract_dual_mesh(mise_iter=0)
        m1 = hf.extract_dual_mesh(mise_iter=1)
        u0, u1 = np.unique(m0.f), np.unique(m1.f)
        assert len(u1) > 2.0 * len(u0), (len(u0), len(u1))
        # the subdivided mesh follows the SOLVED field's fine-scale
        # ripples (field error, not meshing error) — assert it stays
        # within a fraction of the coarse voxel of the ideal sphere
        e1 = np.abs(np.linalg.norm(m1.v[u1], axis=1) - 0.5).mean()
        assert e1 < 0.25 * 0.1, e1
        # subdivided mesh stays closed
        edges = np.sort(np.concatenate(
            [m1.f[:, [0, 1]], m1.f[:, [1, 2]], m1.f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_matches_in_graph_path(self, fields):
        recon, xyz, nrm, hf = fields
        # run the pure in-graph forward with the same weights/config and
        # compare field values at probe points
        cfg = hf.cfg
        n = xyz.shape[0]
        cap = 2048
        xyz_p = jnp.asarray(np.pad(xyz, ((0, cap - n), (0, 0))))
        nrm_p = jnp.asarray(np.pad(nrm, ((0, cap - n), (0, 0))))
        mask = jnp.asarray(np.arange(cap) < n)
        out = P.forward(cfg, recon.network.params, xyz_p, mask, nrm_p)
        probe = np.asarray(sphere_points(100, r=0.45, seed=34)[0])
        v_graph = np.asarray(out.field.evaluate_f(jnp.asarray(probe)).value)
        v_host = hf.evaluate_f(probe).value
        # two separately-compiled solves differ by CG/fusion noise only
        np.testing.assert_allclose(v_host, v_graph, rtol=0.05, atol=1e-2)


class TestAdaptiveHost:
    def test_adaptive_grids_match_ingraph(self):
        """Host build_adaptive_grids == SVH.build_adaptive_normal_variation
        (reference contract models/nksr_net.py:175-179)."""
        from nksr_tpu.core import SparseFeatureHierarchy
        rng = np.random.default_rng(5)
        # box surface: flat faces (low normal variation) + sharp edges
        n = 3000
        face = rng.integers(0, 6, n)
        uv = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
        xyz = np.zeros((n, 3), np.float32)
        nrm = np.zeros((n, 3), np.float32)
        for f in range(6):
            a, s = f // 2, 1.0 if f % 2 == 0 else -1.0
            m = face == f
            o = [b for b in range(3) if b != a]
            xyz[m, o[0]], xyz[m, o[1]] = uv[m, 0], uv[m, 1]
            xyz[m, a] = 0.5 * s
            nrm[m, a] = s
        host = HB.build_adaptive_grids(xyz, nrm, 0.05, 3, tau=0.1,
                                       adaptive_depth=2)
        svh = SparseFeatureHierarchy.build_adaptive_normal_variation(
            jnp.asarray(xyz), jnp.asarray(nrm), jnp.ones(n, bool),
            0.05, 3, (16384, 8192, 4096), tau=0.1, adaptive_depth=2)
        for d in range(3):
            ndev = int(svh.grids[d].num_voxels)
            assert len(host[d].keys) == ndev, f"level {d}"
            np.testing.assert_array_equal(
                host[d].coords, np.asarray(svh.grids[d].coords)[:ndev])
        # adaptivity is real: level 0 keeps only edge/corner voxels
        assert 0 < len(host[0].keys) < 0.7 * len(
            HB.build_splat_grids(xyz, 0.05, 1)[0].keys)

    def test_adaptive_reconstruct_end_to_end(self):
        xyz, nrm = sphere_points(2500, r=0.5, seed=33)
        cfg = P.PipelineConfig(tree_depth=3, adaptive_depth=2, f_maps=8,
                               basis_dim=8, udf_dim=8,
                               solver_max_iters=40, solver_tol=1e-4)
        recon = Reconstructor(config=cfg)
        f = recon.reconstruct(xyz, nrm, voxel_size=0.08,
                              detail_level=None, structure="adaptive")
        mesh = f.extract_dual_mesh()
        assert mesh.v.shape[0] > 100
        used = np.unique(mesh.f)
        r = np.linalg.norm(mesh.v[used], axis=1)
        assert np.abs(r - 0.5).mean() < 0.06
