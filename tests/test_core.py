"""Unit tests for the sparse-geometry core (coords / grid / svh).

The reference has no test suite (SURVEY.md §4); these are built against
tiny dense numpy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nksr_tpu.core import coords as C
from nksr_tpu.core import SparseGrid, SparseFeatureHierarchy
from nksr_tpu.core.grid import splat_coords


def rand_coords(rng, n, lo=-100, hi=100):
    return jnp.asarray(rng.integers(lo, hi, size=(n, 3)), jnp.int32)


class TestCoords:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        ijk = rand_coords(rng, 1000, -30000, 30000)
        hi, lo = C.pack(ijk)
        back = C.unpack(hi, lo)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(ijk))

    def test_key_order_matches_lexicographic(self):
        rng = np.random.default_rng(1)
        a = rand_coords(rng, 500)
        b = rand_coords(rng, 500)
        a_hi, a_lo = C.pack(a)
        b_hi, b_lo = C.pack(b)
        got = np.asarray(C.key_less(a_hi, a_lo, b_hi, b_lo))
        want = [tuple(x) < tuple(y) for x, y in
                zip(np.asarray(a), np.asarray(b))]
        np.testing.assert_array_equal(got, want)

    def test_unique_coords(self):
        rng = np.random.default_rng(2)
        ijk = rand_coords(rng, 2000, -5, 5)  # many duplicates
        mask = jnp.asarray(rng.random(2000) > 0.3)
        hi, lo, out, n = C.unique_coords_jit(ijk, mask, capacity=2048)
        n = int(n)
        want = np.unique(np.asarray(ijk)[np.asarray(mask)], axis=0)
        assert n == len(want)
        got = sorted(map(tuple, np.asarray(out)[:n]))
        assert got == sorted(map(tuple, want))
        # sorted by key
        assert np.all(np.asarray(hi)[: n - 1] <= np.asarray(hi)[1:n])

    def test_unique_overflow_clamps(self):
        rng = np.random.default_rng(3)
        ijk = rand_coords(rng, 500)
        _, _, _, n = C.unique_coords(ijk, jnp.ones(500, bool), capacity=16)
        assert int(n) == 16

    def test_multi_search_sorted_matches_single(self):
        rng = np.random.default_rng(11)
        sets, queries, singles = [], [], []
        for i in range(3):
            ijk = rand_coords(rng, 200 + 50 * i, -40, 40)
            hi, lo, _, n = C.unique_coords(ijk, jnp.ones(len(ijk), bool),
                                           512)
            q = jnp.concatenate([ijk[: 64], rand_coords(rng, 64, 100, 200)])
            qh, ql = C.pack(q)
            sets.append((hi, lo, n))
            queries.append((qh, ql))
            singles.append(C.search_sorted(hi, lo, n, qh, ql))
        multi = C.multi_search_sorted(sets, queries)
        for s, m in zip(singles, multi):
            np.testing.assert_array_equal(np.asarray(s), np.asarray(m))

    def test_search_sorted(self):
        rng = np.random.default_rng(4)
        ijk = rand_coords(rng, 300, -50, 50)
        hi, lo, out, n = C.unique_coords(ijk, jnp.ones(300, bool), 512)
        # queries: half members, half (likely) absent
        q = jnp.concatenate([ijk[:100], rand_coords(rng, 100, 200, 300)])
        idx = np.asarray(C.lookup_coords(hi, lo, n, q))
        out_np = np.asarray(out)
        for qi, ii in zip(np.asarray(q), idx):
            if ii >= 0:
                np.testing.assert_array_equal(out_np[ii], qi)
            else:
                assert not any((out_np[: int(n)] == qi).all(1))
        assert (idx[:100] >= 0).all()


class TestSparseGrid:
    def test_from_coords_and_lookup(self):
        rng = np.random.default_rng(5)
        ijk = rand_coords(rng, 400, -10, 10)
        g = SparseGrid.from_coords(ijk, jnp.ones(400, bool), 1024, 0.1)
        idx = np.asarray(g.lookup(ijk))
        assert (idx >= 0).all()
        np.testing.assert_array_equal(
            np.asarray(g.coords)[idx], np.asarray(ijk))

    def test_world_transforms(self):
        g = SparseGrid.empty(4, 0.25, origin=jnp.array([1.0, 2.0, 3.0]))
        w = g.grid_to_world(jnp.array([[2.0, 0.0, -4.0]]))
        np.testing.assert_allclose(np.asarray(w), [[1.5, 2.0, 2.0]])
        back = g.world_to_grid(w)
        np.testing.assert_allclose(np.asarray(back), [[2.0, 0.0, -4.0]],
                                   atol=1e-6)

    def test_splat_weights_partition_of_unity(self):
        rng = np.random.default_rng(6)
        pos = jnp.asarray(rng.random((200, 3)) * 20 - 10, jnp.float32)
        corner, w = splat_coords(pos)
        np.testing.assert_allclose(np.asarray(w).sum(1), 1.0, atol=1e-5)
        # corner weights match trilinear formula
        base = np.floor(np.asarray(pos))
        np.testing.assert_array_equal(np.asarray(corner[:, 0]), base)

    def test_contains_point(self):
        ijk = jnp.array([[0, 0, 0], [5, 5, 5]], jnp.int32)
        g = SparseGrid.from_coords(ijk, jnp.ones(2, bool), 8, 1.0)
        q = jnp.array([[0.2, -0.3, 0.4],    # inside voxel (0,0,0)
                       [5.4, 4.6, 5.0],     # inside voxel (5,5,5)
                       [2.0, 2.0, 2.0]])    # far away
        got = np.asarray(g.contains_point(q))
        np.testing.assert_array_equal(got, [True, True, False])


class TestSVH:
    def _points_on_sphere(self, n=2000, seed=0):
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return jnp.asarray(v, jnp.float32), jnp.asarray(v, jnp.float32)

    def test_point_splatting_levels(self):
        xyz, _ = self._points_on_sphere()
        svh = SparseFeatureHierarchy.build_point_splatting(
            xyz, jnp.ones(xyz.shape[0], bool), 0.1, 4,
            capacities=[8192, 4096, 2048, 1024])
        ns = [int(svh.grids[d].num_voxels) for d in range(4)]
        assert ns[0] > ns[1] > ns[2] > ns[3] > 0
        # every point is inside a level-0 voxel's splat support
        assert bool(svh.grids[0].contains_point(xyz).all())
        # hierarchy roughly nested: parents of level-0 voxels active at 1
        parents = jnp.floor_divide(svh.grids[0].coords, 2)
        mask = np.asarray(svh.grids[0].active_mask())
        pidx = np.asarray(svh.grids[1].lookup(parents))
        assert (pidx[mask] >= 0).mean() > 0.95

    def test_adaptive_prunes_flat_regions(self):
        # flat plane -> no refinement; sphere -> refinement
        rng = np.random.default_rng(7)
        plane = rng.random((1500, 3)).astype(np.float32)
        plane[:, 2] = 0.0
        plane_n = np.tile([0.0, 0.0, 1.0], (1500, 1)).astype(np.float32)
        sx, sn = self._points_on_sphere(1500)
        caps = [16384, 8192, 4096, 2048]

        svh_p = SparseFeatureHierarchy.build_adaptive_normal_variation(
            jnp.asarray(plane), jnp.asarray(plane_n),
            jnp.ones(1500, bool), 0.05, 4, caps, tau=0.1, adaptive_depth=2)
        # unit sphere at 0.1 parent voxels: max angular deviation within a
        # parent voxel is ~0.1 rad -> 1-cos ~ 5e-3; tau below that refines.
        svh_s = SparseFeatureHierarchy.build_adaptive_normal_variation(
            sx, sn, jnp.ones(1500, bool), 0.05, 4, caps,
            tau=2e-3, adaptive_depth=2)
        assert int(svh_p.grids[0].num_voxels) == 0  # flat: level 0 empty
        assert int(svh_p.grids[1].num_voxels) > 0
        assert int(svh_s.grids[0].num_voxels) > 0   # curved: refined

    def test_adaptive_depth_1_equals_plain_splat(self):
        xyz, nrm = self._points_on_sphere(500, seed=8)
        caps = [8192, 4096, 2048, 1024]
        a = SparseFeatureHierarchy.build_adaptive_normal_variation(
            xyz, nrm, jnp.ones(500, bool), 0.1, 4, caps, adaptive_depth=1)
        b = SparseFeatureHierarchy.build_point_splatting(
            xyz, jnp.ones(500, bool), 0.1, 4, caps)
        for d in range(4):
            assert int(a.grids[d].num_voxels) == int(b.grids[d].num_voxels)

    def test_voxel_status(self):
        xyz, nrm = self._points_on_sphere(1000, seed=9)
        svh = SparseFeatureHierarchy.build_point_splatting(
            xyz, jnp.ones(1000, bool), 0.1, 3, [8192, 4096, 2048])
        # voxels active at level 1 that have children must be REFINED
        c1 = svh.grids[1].coords
        st = np.asarray(svh.evaluate_voxel_status(c1, 1))
        mask = np.asarray(svh.grids[1].active_mask())
        assert set(st[mask]).issubset({1, 2})
        assert (st[mask] == 2).mean() > 0.5  # splatting: most have children
        # far-away voxels are EMPTY
        far = jnp.asarray(np.full((4, 3), 77), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(svh.evaluate_voxel_status(far, 1)), 0)

    def test_build_under_jit(self):
        xyz, _ = self._points_on_sphere(256, seed=10)

        @jax.jit
        def build(xyz):
            svh = SparseFeatureHierarchy.build_point_splatting(
                xyz, jnp.ones(xyz.shape[0], bool), 0.1, 2, [4096, 2048])
            return svh.grids[0].num_voxels, svh.grids[1].num_voxels

        n0, n1 = build(xyz)
        assert int(n0) > int(n1) > 0
