"""Evaluate a trained checkpoint through the HOST predicted-structure
path (the production inference route): reconstruct test shapes via
Reconstructor(structure='predicted'), mesh, and report chamfer/f-score.

Usage: python scripts/eval_trained_host.py <config> <ckpt> [limit]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    cfg_path, ckpt = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    import jax

    from nksr_tpu import Reconstructor
    from nksr_tpu.data import DatasetSpec as DS, build_dataset
    from nksr_tpu.models import pipeline as P
    from nksr_tpu.train import driver, loop as T
    from nksr_tpu.utils import checkpoint as CKPT
    from nksr_tpu.utils.config import load_config
    from nksr_tpu.utils.metrics import MeshEvaluator

    cfg = load_config(cfg_path)
    pcfg = driver.pipeline_config_from_yaml(cfg)
    tcfg = driver.train_config_from_yaml(cfg)
    state = T.init_state(pcfg, tcfg, jax.random.PRNGKey(0))
    state = CKPT.load_params(ckpt, state)

    te = cfg.get("test_dataset", cfg.get("val_dataset"))
    ds = build_dataset(te.get("name", "ShapeNet"),
                       [DS.SHAPE_NAME, DS.INPUT_PC, DS.TARGET_NORMAL,
                        DS.GT_DENSE_PC, DS.GT_DENSE_NORMAL],
                       **te.get("args", {}))
    recon = Reconstructor(config=pcfg, params=state.params)
    ev = MeshEvaluator(n_points=500000)
    rows = []
    for i in range(min(len(ds), limit)):
        item = ds[i]
        xyz = np.asarray(item[DS.INPUT_PC], np.float32)
        nrm = np.asarray(item[DS.TARGET_NORMAL], np.float32)
        f = recon.reconstruct(xyz, nrm, detail_level=None,
                              voxel_size=pcfg.voxel_size,
                              structure="predicted")
        levels = [len(g.keys) for g in f.host_grids]
        mesh = f.extract_dual_mesh(mise_iter=1)
        m = ev.eval_mesh(mesh, np.asarray(item[DS.GT_DENSE_PC]),
                         np.asarray(item[DS.GT_DENSE_NORMAL]))
        m["source"] = item[DS.SHAPE_NAME]
        rows.append(m)
        print(f"[{i}] {m['source']} levels={levels} "
              f"verts={mesh.v.shape[0]} chamfer-L1={m['chamfer-L1']:.5f} "
              f"f-score={m['f-score']:.3f} normals={m.get('normals', 0):.3f}",
              flush=True)
    agg = {k: float(np.nanmean([r[k] for r in rows]))
           for k in rows[0] if k != "source"}
    print("MEAN:", {k: round(v, 5) for k, v in agg.items()}, flush=True)


if __name__ == "__main__":
    main()
