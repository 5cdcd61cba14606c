"""Dual marching cubes tests on an analytically known surface (sphere)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu.fields import LayerField
from nksr_tpu.meshing.dual_mc import extract_dual_mesh

from test_field import make_field, solve_sphere, sphere_points


@pytest.fixture(scope="module")
def sphere_field():
    xyz, nrm = sphere_points(3000, r=0.5, seed=11)
    field = make_field(xyz)
    field = solve_sphere(field, xyz, nrm, solver_tol=1e-6, max_iters=300)
    return field.set_mask_field(LayerField(field.svh, 1))


class TestDualMC:
    def test_sphere_mesh(self, sphere_field):
        mesh = extract_dual_mesh(sphere_field, mise_iter=0)
        assert mesh.v.shape[0] > 100
        assert mesh.f.shape[0] > 100
        assert mesh.f.max() < mesh.v.shape[0]
        # vertices used by faces lie near the sphere
        used = np.unique(mesh.f)
        r = np.linalg.norm(mesh.v[used], axis=1)
        assert np.abs(r - 0.5).mean() < 0.05
        assert np.abs(r - 0.5).max() < 0.15

    def test_mise_refinement_improves(self, sphere_field):
        m0 = extract_dual_mesh(sphere_field, mise_iter=0)
        m2 = extract_dual_mesh(sphere_field, mise_iter=2)
        u0, u2 = np.unique(m0.f), np.unique(m2.f)
        e0 = np.abs(np.linalg.norm(m0.v[u0], axis=1) - 0.5).mean()
        e2 = np.abs(np.linalg.norm(m2.v[u2], axis=1) - 0.5).mean()
        assert e2 <= e0 * 1.05  # refinement should not hurt

    def test_orientation_outward(self, sphere_field):
        mesh = extract_dual_mesh(sphere_field, mise_iter=1)
        v, f = mesh.v, mesh.f
        tri = v[f]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        area = np.linalg.norm(n, axis=1)
        ok = area > 1e-12
        n = n[ok] / area[ok][:, None]
        centers = tri[ok].mean(1)
        dots = (n * centers / np.linalg.norm(centers, axis=1,
                                             keepdims=True)).sum(1)
        # consistent outward orientation
        assert (dots > 0).mean() > 0.95, (dots > 0).mean()

    def test_mostly_watertight(self, sphere_field):
        mesh = extract_dual_mesh(sphere_field, mise_iter=0)
        f = mesh.f
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        # closed surface: every edge shared by exactly 2 triangles
        assert (counts == 2).mean() > 0.99, (counts == 2).mean()

    def test_grid_upsample(self, sphere_field):
        m1 = extract_dual_mesh(sphere_field, grid_upsample=1)
        m2 = extract_dual_mesh(sphere_field, grid_upsample=2)
        assert m2.v.shape[0] > 2 * m1.v.shape[0]
        u2 = np.unique(m2.f)
        r = np.linalg.norm(m2.v[u2], axis=1)
        assert np.abs(r - 0.5).mean() < 0.04


class TestDenseLatticeMC:
    @pytest.mark.parametrize("mise_iter", [0, 1])
    def test_dense_matches_host(self, mise_iter, monkeypatch):
        """The device dual-MC (meshing/lattice_mc.py — dense shifts +
        compactions) must produce the SAME mesh as the host sorted-key
        mesher on a lattice-solved field: identical vertex/face counts
        and identical vertex SETS (orders differ: flat-index vs key
        order)."""
        from nksr_tpu import Reconstructor
        from nksr_tpu.models import pipeline as P

        cfg = P.PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8,
                               udf_dim=8, solver_max_iters=60,
                               solver_tol=1e-6)
        recon = Reconstructor(config=cfg)
        xyz, nrm = sphere_points(1500, r=0.5, seed=9)
        monkeypatch.setenv("NKSR_LATTICE", "1")
        hf = recon.reconstruct(xyz, nrm, voxel_size=0.1,
                               detail_level=None, structure="splat")
        assert hf.lattice_ctx is not None

        monkeypatch.setenv("NKSR_DENSE_MC", "1")
        md = hf.extract_dual_mesh(mise_iter=mise_iter)
        monkeypatch.setenv("NKSR_DENSE_MC", "0")
        mh = hf.extract_dual_mesh(mise_iter=mise_iter)

        assert md.v.shape == mh.v.shape, (md.v.shape, mh.v.shape)
        assert md.f.shape == mh.f.shape
        # same vertex SET — matched by nearest neighbor (vertex ORDER
        # differs between the two paths, and last-ulp field-eval noise
        # makes a lexsort comparison brittle for near-tied coordinates)
        from scipy.spatial import cKDTree
        d1, _ = cKDTree(mh.v).query(md.v)
        d2, _ = cKDTree(md.v).query(mh.v)
        assert d1.max() < 1e-4 and d2.max() < 1e-4, (d1.max(), d2.max())
        # same surface: watertightness preserved
        edges = np.sort(np.concatenate(
            [md.f[:, [0, 1]], md.f[:, [1, 2]], md.f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_max_points_same_mesh(self, monkeypatch):
        """max_points (the reference memory knob,
        /root/reference/examples/recons_colored_mesh.py:30) chunks the
        evaluation waves without changing the extracted mesh — on both
        the dense device mesher and the host fallback."""
        from nksr_tpu import Reconstructor
        from nksr_tpu.models import pipeline as P

        cfg = P.PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8,
                               udf_dim=8, solver_max_iters=40,
                               solver_tol=1e-5)
        recon = Reconstructor(config=cfg)
        xyz, nrm = sphere_points(1500, r=0.5, seed=9)
        hf = recon.reconstruct(xyz, nrm, voxel_size=0.1,
                               detail_level=None, structure="splat")
        for dense in ("1", "0"):
            monkeypatch.setenv("NKSR_DENSE_MC", dense)
            m_full = hf.extract_dual_mesh(mise_iter=1)
            m_chunked = hf.extract_dual_mesh(mise_iter=1,
                                             max_points=4096)
            assert m_full.v.shape == m_chunked.v.shape, dense
            # chunked evaluation changes XLA fusion/padding shapes, so
            # per-point values can wiggle by ~1e-6 (observed 1.46e-6 on
            # 1/7083 vertices) — identical geometry, float noise only
            np.testing.assert_allclose(m_full.v, m_chunked.v, atol=1e-5)
            np.testing.assert_array_equal(m_full.f, m_chunked.f)

    def test_dense_bails_out_over_budget(self, monkeypatch):
        from nksr_tpu.meshing import lattice_mc as LM
        monkeypatch.setattr(LM, "DENSE_CELL_BUDGET", 10)

        class Fake:
            lattice_ctx = None
        assert LM.extract_dual_mesh_dense(Fake()) is None


class TestDenseUdfMask:
    """UDF mask head (cfg.udf_enabled) through the DENSE mesher: the
    mask now trims faces at extraction instead of demoting the whole
    mesh to the host path (reference nksr_net.py:116-133 masks the
    user-facing dual mesh; the host mesher seals at the mask boundary,
    the dense mesher trims — PARITY.md documents the delta)."""

    def _field(self):
        from nksr_tpu import Reconstructor
        from nksr_tpu.models import pipeline as P
        cfg = P.PipelineConfig(tree_depth=3, f_maps=8, basis_dim=8,
                               udf_dim=8, solver_max_iters=40,
                               solver_tol=1e-5, udf_enabled=True)
        recon = Reconstructor(config=cfg)
        xyz, nrm = sphere_points(1500, r=0.5, seed=9)
        hf = recon.reconstruct(xyz, nrm, voxel_size=0.1,
                               detail_level=None, structure="splat")
        assert hf.lattice_ctx is not None
        assert hf.udf_host is not None
        assert hasattr(hf.field.mask_field, "level_set")
        return hf

    def test_dense_mesher_runs_with_udf_mask(self):
        from nksr_tpu.meshing.lattice_mc import extract_dual_mesh_dense
        hf = self._field()
        m = extract_dual_mesh_dense(hf, mise_iter=1)
        assert m is not None, "dense mesher must not demote on UDF mask"
        # untrained udf head stays near zero -> level_set 2*voxel keeps
        # the sphere surface
        assert m.v.shape[0] > 100 and m.f.shape[0] > 100
        # every surviving face's vertices pass the mask
        import jax.numpy as jnp
        from nksr_tpu.core import host_build as HB
        from nksr_tpu.recon.host_field import _udf_mask_fn
        sup = HB.support_indices(hf.udf_host, hf.udf_caps, m.v)
        mv = np.asarray(_udf_mask_fn(hf.cfg)(
            hf.field.mask_field, jnp.asarray(m.v),
            tuple(jnp.asarray(s) for s in sup)))
        assert (mv[np.asarray(m.f).reshape(-1)] > 0).all()

    def test_negative_level_set_trims_everything(self):
        from nksr_tpu.meshing.lattice_mc import extract_dual_mesh_dense
        hf = self._field()
        hf.set_mask_field(hf.field.mask_field.set_level_set(-1.0))
        m = extract_dual_mesh_dense(hf, mise_iter=1)
        assert m is not None
        assert m.f.shape[0] == 0
