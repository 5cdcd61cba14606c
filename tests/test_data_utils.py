"""Tests: IO, transforms, datasets, config system, metrics, checkpoints,
native kd-tree."""

import dataclasses
import os
from pathlib import Path

import numpy as np
import pytest

from nksr_tpu.data import (DatasetSpec as DS, read_ply, write_ply,
                           read_ply_full, to_device_batch)
from nksr_tpu.data import transforms as TR
from nksr_tpu.data.base import RandomSafeDataset, list_collate
from nksr_tpu.utils.config import load_config, Config
from nksr_tpu.utils.metrics import MeshEvaluator, sample_mesh
from nksr_tpu.native import KDTree


class TestIO:
    def test_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        v = rng.random((100, 3)).astype(np.float32)
        n = rng.random((100, 3)).astype(np.float32)
        f = rng.integers(0, 100, (50, 3)).astype(np.int32)
        c = rng.random((100, 3)).astype(np.float32)
        p = tmp_path / "m.ply"
        write_ply(p, v, f, n, c)
        rv, rf, rn, rc = read_ply_full(p)
        np.testing.assert_allclose(rv, v, atol=1e-6)
        np.testing.assert_array_equal(rf, f)
        np.testing.assert_allclose(rn, n, atol=1e-6)
        np.testing.assert_allclose(rc, c, atol=1 / 255)

    def test_reads_reference_bunny(self):
        v, n = read_ply("/root/reference/assets/bunny.ply")
        assert v.shape == (10000, 3) and n.shape == (10000, 3)


class TestTransforms:
    def _data(self, n=1000, seed=0):
        rng = np.random.default_rng(seed)
        return {DS.INPUT_PC: rng.random((n, 3)).astype(np.float32),
                DS.TARGET_NORMAL: rng.random((n, 3)).astype(np.float32)}

    def test_noise_and_subsample(self):
        rng = np.random.default_rng(1)
        d = TR.PointcloudNoise(0.01)(self._data(), rng)
        d = TR.SubsamplePointcloud(200)(d, rng)
        assert d[DS.INPUT_PC].shape == (200, 3)
        assert d[DS.TARGET_NORMAL].shape == (200, 3)

    def test_bbox_crop(self):
        rng = np.random.default_rng(2)
        d = TR.BBoxCrop([0.5, 0.5, 0.5])(self._data(), rng)
        pc = d[DS.INPUT_PC]
        assert 0 < pc.shape[0] < 1000
        assert (pc.max(0) - pc.min(0) <= 0.5 + 1e-6).all()

    def test_density_scaling(self):
        rng = np.random.default_rng(3)
        t = TR.UniformDensityFixedSampleScale(0.1, 2.0, 4.0)
        d = t(self._data(4000), rng)
        pc = d[DS.INPUT_PC]
        dens = t.density(pc, 1.0)
        assert 1.5 < dens < 6.0, dens

    def test_composed_by_name(self):
        rng = np.random.default_rng(4)
        t = TR.ComposedTransforms([
            {"name": "Centralize"},
            {"name": "FixedScale", "args": {"scale": 2.0}}])
        d = t(self._data(), rng)
        c = (d[DS.INPUT_PC].max(0) + d[DS.INPUT_PC].min(0)) / 2
        np.testing.assert_allclose(c, 0, atol=1e-5)


class TestDatasetBase:
    def test_deterministic_rng_and_resample(self):
        class DS1(RandomSafeDataset):
            def __len__(self):
                return 4

            def _get_item(self, idx, rng):
                if idx == 2:
                    raise ValueError("bad item")
                return {"v": rng.random(3), "i": idx}

        a, b = DS1(seed=1), DS1(seed=1)
        np.testing.assert_allclose(a[0]["v"], b[0]["v"])
        # different epochs (read counts) differ
        assert not np.allclose(a[0]["v"], a[0]["v"])
        c = DS1(seed=1, skip_on_error=True)
        assert c[2]["i"] != 2  # resampled
        collated = list_collate([a[0], a[1]])
        assert len(collated["v"]) == 2

    def test_to_device_batch_padding(self):
        item = {DS.INPUT_PC: np.random.rand(700, 3).astype(np.float32),
                DS.TARGET_NORMAL: np.random.rand(700, 3).astype(np.float32),
                DS.GT_DENSE_PC: np.random.rand(900, 3).astype(np.float32),
                DS.GT_DENSE_NORMAL: np.random.rand(900, 3).astype(
                    np.float32)}
        b = to_device_batch(item)
        assert b["xyz"].shape == (1024, 3)
        assert int(b["mask"].sum()) == 700
        assert b["gt_xyz"].shape == (1024, 3)
        assert int(b["gt_mask"].sum()) == 900


class TestConfig:
    def test_include_interp_override(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "voxel_size: 0.1\nsolver:\n  pos_weight: 100.0\n")
        (tmp_path / "exp.yaml").write_text(
            "include_configs:\n  - base.yaml\n"
            "name: exp\nvs2: ${voxel_size}\nsolver:\n  normal_weight: 5.0\n")
        cfg = load_config(tmp_path / "exp.yaml",
                          overrides=["solver.pos_weight=7", "extra.x=1"])
        assert cfg.voxel_size == 0.1
        assert cfg.vs2 == 0.1
        assert cfg.solver.pos_weight == 7
        assert cfg.solver.normal_weight == 5.0
        assert cfg.get_dotted("extra.x") == 1


class TestMetricsAndNative:
    def test_kdtree_matches_scipy(self):
        from scipy.spatial import cKDTree
        rng = np.random.default_rng(5)
        pts = rng.random((2000, 3)).astype(np.float32)
        q = rng.random((500, 3)).astype(np.float32)
        d, i = KDTree(pts).query(q, 3)
        ds, si = cKDTree(pts).query(q, k=3)
        np.testing.assert_allclose(d, ds, atol=1e-5)
        np.testing.assert_array_equal(i, si)

    def test_mesh_evaluator_perfect_mesh(self):
        # unit-cube-ish mesh: two triangles forming a square
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)

        class M:
            pass
        m = M()
        m.v, m.f = v, f
        pts, nrm = sample_mesh(v, f, 5000)
        assert pts.shape == (5000, 3)
        assert np.allclose(pts[:, 2], 0)
        # sampling density sets the floor: ~0.5/sqrt(n) nn spacing, so use
        # enough samples on BOTH sides that the 1% f-score is resolvable
        ref, _ = sample_mesh(v, f, 20000,
                             np.random.default_rng(7))
        ev = MeshEvaluator(n_points=20000)
        out = ev.eval_mesh(m, ref, np.tile([0, 0, 1.], (20000, 1)))
        assert out["chamfer-L1"] < 0.01
        assert out["f-score"] > 0.9
        assert out["normals"] > 0.99

    def test_checkpoint_roundtrip(self, tmp_path):
        import jax
        from nksr_tpu.models import pipeline as P
        from nksr_tpu.utils import checkpoint as CKPT
        cfg = P.PipelineConfig(capacities=(512, 256), tree_depth=2,
                               f_maps=8, basis_dim=8)
        params = P.init_params(cfg, jax.random.PRNGKey(0))
        CKPT.save_params(tmp_path / "p.ckpt", params)
        zeros = jax.tree_util.tree_map(lambda x: x * 0, params)
        back = CKPT.load_params(tmp_path / "p.ckpt", zeros)
        chk = jax.tree_util.tree_map(
            lambda a, b: np.allclose(a, b), params, back)
        assert all(jax.tree_util.tree_leaves(chk))

    def test_torch_state_dict_shim(self):
        import jax
        from nksr_tpu.models import pipeline as P
        from nksr_tpu.utils import checkpoint as CKPT
        cfg = P.PipelineConfig(capacities=(512, 256), tree_depth=2,
                               f_maps=8, basis_dim=8)
        params = P.init_params(cfg, jax.random.PRNGKey(0))
        sd = CKPT.params_to_torch_state_dict(params)
        assert any(k.endswith("weight") for k in sd)
        zeros = jax.tree_util.tree_map(lambda x: x * 0, params)
        back = CKPT.torch_state_dict_to_params(cfg, sd, zeros)
        chk = jax.tree_util.tree_map(
            lambda a, b: np.allclose(a, b), params, back)
        assert all(jax.tree_util.tree_leaves(chk))
