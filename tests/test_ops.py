"""Tests for kNN, normal estimation, SDF-from-points, gather/conv ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu.ops import knn as K
from nksr_tpu.ops import sdf as SDF
from nksr_tpu.ops import gather_scatter as gs
from nksr_tpu.core import SparseGrid


class TestKNN:
    def test_knn_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.random((500, 3)), jnp.float32)
        table = K.build_buckets(pts, jnp.ones(500, bool), 0.15, 1024, 32)
        q = pts[:50]
        idx, d2 = K.knn_search(table, pts, q, 8)
        # brute force
        D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(pts)[None],
                           axis=-1) ** 2
        bf = np.sort(D, axis=1)[:, :8]
        got = np.sort(np.asarray(d2), axis=1)
        # cell size 0.15: neighbors within 0.15 are guaranteed found
        close = bf < 0.15 ** 2
        np.testing.assert_allclose(got[close], bf[close], rtol=1e-4,
                                   atol=1e-6)

    def test_normal_estimation_plane(self):
        rng = np.random.default_rng(1)
        xyz = np.zeros((400, 3), np.float32)
        xyz[:, :2] = rng.random((400, 2)).astype(np.float32)
        sensor = np.zeros_like(xyz)
        sensor[:, 2] = 5.0
        nrm, keep = K.estimate_normals(
            jnp.asarray(xyz), jnp.ones(400, bool), 16, 0.12, 1024, 16,
            sensor=jnp.asarray(sensor), max_angle_deg=85.0)
        nrm = np.asarray(nrm)
        keep_np = np.asarray(keep)
        assert keep_np.mean() > 0.9
        # plane normal is +z (oriented toward the sensor above)
        assert (nrm[keep_np, 2] > 0.99).mean() > 0.95

    def test_estimate_normal_preprocess_fn(self):
        from nksr_tpu import get_estimate_normal_preprocess_fn
        rng = np.random.default_rng(2)
        xyz = np.zeros((300, 3), np.float32)
        xyz[:, :2] = rng.random((300, 2)).astype(np.float32)
        sensor = np.tile([0.5, 0.5, 3.0], (300, 1)).astype(np.float32)
        fn = get_estimate_normal_preprocess_fn(16, 85.0)
        ox, on, osens = fn(xyz, None, sensor)
        assert osens is None
        assert ox.shape[0] == on.shape[0] > 200
        assert (on[:, 2] > 0.9).mean() > 0.9


class TestSDF:
    def test_sphere_sdf(self):
        rng = np.random.default_rng(3)
        v = rng.normal(size=(3000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        xyz = jnp.asarray(0.5 * v, jnp.float32)
        nrm = jnp.asarray(v, jnp.float32)
        q = jnp.asarray([[0, 0, 0.4], [0, 0, 0.62], [0.45, 0, 0]],
                        jnp.float32)
        s = np.asarray(SDF.sdf_from_points(
            q, xyz, nrm, jnp.ones(3000, bool), cell_size=0.15,
            capacity=4096))
        # positive outside-pointing convention: inside -> negative
        np.testing.assert_allclose(s, [-0.1, 0.12, -0.05], atol=0.03)

    def test_vote_mode_sphere(self):
        """Majority-vote SDF (reference ComputeSDFKernel semantics,
        /root/reference/ext/sdfgen/sdf_from_points.cu:90-147): sign from
        the plane-side vote, magnitude from the nearest neighbor."""
        rng = np.random.default_rng(5)
        v = rng.normal(size=(3000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        xyz = jnp.asarray(0.5 * v, jnp.float32)
        nrm = jnp.asarray(v, jnp.float32)
        q = jnp.asarray([[0, 0, 0.4], [0, 0, 0.62], [0.45, 0, 0],
                         [0, 0, 0.56]], jnp.float32)
        s, g = SDF.sdf_from_points(
            q, xyz, nrm, jnp.ones(3000, bool), cell_size=0.15,
            capacity=4096, imls=False, adaptive_knn=8, stdv=3.0,
            compute_grad=True)
        s, g = np.asarray(s), np.asarray(g)
        # signs: inside negative, outside positive
        assert s[0] < 0 and s[2] < 0
        assert s[1] > 0 and s[3] > 0
        np.testing.assert_allclose(s, [-0.1, 0.12, -0.05, 0.06],
                                   atol=0.03)
        # gradient points outward (+z for on-axis queries)
        assert g[0, 2] > 0.9 and g[1, 2] > 0.9 and g[3, 2] > 0.9
        assert g[2, 0] > 0.9

    def test_vote_far_query_euclidean(self):
        """Beyond stdv * ref_std of the nearest point, the magnitude is
        the euclidean distance (sdf_from_points.cu:118-126)."""
        xyz = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0],
                           [0.0, 0.1, 0.0], [0.1, 0.1, 0.0]], jnp.float32)
        nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                       (4, 1))
        q = jnp.asarray([[0.05, 0.05, 0.25]], jnp.float32)
        # tiny stdv -> adaptive radius can't reach the query -> euclidean
        s = np.asarray(SDF.sdf_from_points(
            q, xyz, nrm, jnp.ones(4, bool), cell_size=0.3, capacity=256,
            imls=False, adaptive_knn=2, stdv=0.1, nb_points=4))
        d_euclid = np.sqrt(0.05 ** 2 + 0.05 ** 2 + 0.25 ** 2)
        np.testing.assert_allclose(s, [d_euclid], rtol=1e-4)
        # large stdv -> plane distance
        s2 = np.asarray(SDF.sdf_from_points(
            q, xyz, nrm, jnp.ones(4, bool), cell_size=0.3, capacity=256,
            imls=False, adaptive_knn=2, stdv=30.0, nb_points=4))
        np.testing.assert_allclose(s2, [0.25], rtol=1e-4)

    def test_imls_grad_and_fixed_sigma(self):
        """IMLS gradient = weighted normal mean (sdf_from_points.cu:76-86);
        fixed-sigma (reference-exact) path stays finite far away thanks to
        the min-exponent subtraction."""
        rng = np.random.default_rng(6)
        v = rng.normal(size=(2000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        xyz = jnp.asarray(0.5 * v, jnp.float32)
        nrm = jnp.asarray(v, jnp.float32)
        q = jnp.asarray([[0, 0, 0.45], [0, 0, 0.55]], jnp.float32)
        s, g = SDF.sdf_from_points(
            q, xyz, nrm, jnp.ones(2000, bool), cell_size=0.15,
            capacity=4096, adaptive_knn=0, stdv=0.05, compute_grad=True)
        s, g = np.asarray(s), np.asarray(g)
        assert np.isfinite(s).all() and np.isfinite(g).all()
        np.testing.assert_allclose(s, [-0.05, 0.05], atol=0.02)
        assert (g[:, 2] > 0.9).all()

    def test_gt_geometry_vote_default(self):
        """DensePointsGroundTruthGeometry uses the reference AV recipe
        (vote mode, stdv=3, adaptive self-kNN radius) and returns
        positive INSIDE (av_gt_geometry.py:63-78)."""
        from nksr_tpu.data.gt_geometry import DensePointsGroundTruthGeometry
        rng = np.random.default_rng(7)
        v = rng.normal(size=(3000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        g = DensePointsGroundTruthGeometry(0.5 * v, v, voxel_size=0.05)
        s = np.asarray(g.query_sdf(np.asarray(
            [[0, 0, 0.4], [0, 0, 0.6]], np.float32)))
        np.testing.assert_allclose(s, [0.1, -0.1], atol=0.03)


class TestGatherConv:
    def test_gather_conv_identity(self):
        rng = np.random.default_rng(4)
        ijk = jnp.asarray(rng.integers(-5, 5, (64, 3)), jnp.int32)
        g = SparseGrid.from_coords(ijk, jnp.ones(64, bool), 128, 1.0)
        offs = gs.stencil_offsets(3)
        nbr = gs.neighbor_table(g, offs)
        feat = jnp.asarray(rng.random((128, 8)), jnp.float32)
        # kernel = identity at center tap only
        w = np.zeros((27, 8, 8), np.float32)
        w[13] = np.eye(8)
        out = gs.gather_conv(feat, nbr, jnp.asarray(w))
        m = np.asarray(g.active_mask())
        np.testing.assert_allclose(np.asarray(out)[m],
                                   np.asarray(feat)[m], rtol=1e-5)

    def test_neighbor_table_symmetry(self):
        ijk = jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.int32)
        g = SparseGrid.from_coords(ijk, jnp.ones(2, bool), 8, 1.0)
        offs = gs.stencil_offsets(3)
        nbr = np.asarray(gs.neighbor_table(g, offs))
        i0 = int(g.lookup(jnp.asarray([[0, 0, 0]]))[0])
        i1 = int(g.lookup(jnp.asarray([[1, 0, 0]]))[0])
        # +x neighbor of voxel0 is voxel1; -x neighbor of voxel1 is voxel0
        plus_x = list(map(tuple, offs)).index((1, 0, 0))
        minus_x = list(map(tuple, offs)).index((-1, 0, 0))
        assert nbr[i0, plus_x] == i1
        assert nbr[i1, minus_x] == i0

    def test_child_parent_tables(self):
        fine_ijk = jnp.asarray([[0, 0, 0], [1, 1, 1], [2, 2, 2]],
                               jnp.int32)
        fine = SparseGrid.from_coords(fine_ijk, jnp.ones(3, bool), 8, 0.5)
        coarse = SparseGrid.from_coords(
            jnp.floor_divide(fine_ijk, 2), jnp.ones(3, bool), 8, 1.0)
        pt = np.asarray(gs.parent_table(fine, coarse))
        ct = np.asarray(gs.child_table(coarse, fine))
        fm = np.asarray(fine.active_mask())
        assert (pt[fm] >= 0).all()
        # every fine voxel appears exactly once in the child tables
        cm = np.asarray(coarse.active_mask())
        kids = ct[cm]
        assert sorted(kids[kids >= 0].tolist()) == sorted(
            np.nonzero(fm)[0].tolist())


class TestPCNN:
    def test_nearest_attr(self):
        from nksr_tpu.fields import PCNNField
        xyz = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]])
        attr = jnp.asarray([[1., 0, 0], [0, 1., 0], [0, 0, 1.]])
        f = PCNNField.build(xyz, attr, jnp.ones(3, bool), 0.5, 16)
        q = jnp.asarray([[0.1, 0., 0.], [0.9, 0.1, 0.], [0., 1.05, 0.]])
        out = np.asarray(f.evaluate_f(q).value)
        np.testing.assert_allclose(out, np.asarray(attr), atol=1e-6)
