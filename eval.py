#!/usr/bin/env python
"""Evaluate a trained model: reconstruct test shapes, report metrics.

Counterpart of the reference evaluation driver (SURVEY.md §3.2): loads a
checkpoint, runs the forward + dual meshing per test sample, computes
MeshEvaluator metrics, writes per-sample CSV + PLY artifacts.
"""

import argparse
import csv
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--run_dir", default="runs/eval")
    ap.add_argument("--exec", nargs="*", default=[], dest="execs")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--focus", default=None,
                    help="evaluate ONLY the sample(s) whose index or "
                         "shape-name contains this string — the "
                         "single-batch debugging workflow of the "
                         "reference (models/base_model.py:362-384)")
    ap.add_argument("--mise_iter", type=int, default=1)
    ap.add_argument("--upsample", type=int, default=1)
    ap.add_argument("--save_meshes", action="store_true")
    ap.add_argument("--eval_points", type=int, default=int(5e5),
                    help="mesh samples for metrics (reference uses 5e5 "
                         "for objects, 5e6 for scenes with GT geometry; "
                         "models/nksr_net.py:301-303)")
    args = ap.parse_args()

    import jax
    from nksr_tpu.utils.config import load_config
    from nksr_tpu.utils import checkpoint as CKPT
    from nksr_tpu.utils.metrics import MeshEvaluator
    from nksr_tpu.train import driver, loop as T
    from nksr_tpu.models import pipeline as P
    from nksr_tpu.data import (DatasetSpec as DS, build_dataset,
                               to_device_batch, write_ply)

    cfg = load_config(args.config, overrides=args.execs)
    pcfg = driver.pipeline_config_from_yaml(cfg)
    tcfg = driver.train_config_from_yaml(cfg)
    state = T.init_state(pcfg, tcfg, jax.random.PRNGKey(0))
    state = CKPT.load_params(args.ckpt, state)
    params = state.params

    spec = [DS.SHAPE_NAME, DS.INPUT_PC, DS.TARGET_NORMAL, DS.GT_DENSE_PC,
            DS.GT_DENSE_NORMAL, DS.GT_ONET_SAMPLE]
    te = cfg.get("test_dataset", cfg.get("val_dataset"))
    ds = build_dataset(te.get("name", "ShapeNet"), spec,
                       **te.get("args", {}))
    run = Path(args.run_dir)
    run.mkdir(parents=True, exist_ok=True)

    evaluator = MeshEvaluator(n_points=args.eval_points)
    rows = []
    n = min(len(ds), args.limit) if args.limit else len(ds)
    indices = list(range(n))
    if args.focus is not None:
        if args.focus.isdigit():
            indices = [int(args.focus)]
        else:   # match on shape name (needs a cheap name peek per item)
            indices = [i for i in indices
                       if args.focus in str(ds[i][DS.SHAPE_NAME])]
        if not indices:
            raise SystemExit(f"--focus {args.focus!r} matched no sample")
        n = len(indices)
    for j, i in enumerate(indices):
        item = ds[i]
        batch = to_device_batch(item, cfg.get("point_bucket"),
                                cfg.get("gt_bucket"))
        feat = P.point_features(pcfg, batch["xyz"],
                                normal=batch.get("normal"),
                                sensor=batch.get("sensor"))
        out = P.forward(pcfg, params, batch["xyz"], batch["mask"], feat)
        mesh = out.field.extract_dual_mesh(mise_iter=args.mise_iter,
                                           grid_upsample=args.upsample)
        gt = np.asarray(item[DS.GT_DENSE_PC])
        gtn = np.asarray(item.get(DS.GT_DENSE_NORMAL)) \
            if DS.GT_DENSE_NORMAL in item else None
        m = evaluator.eval_mesh(mesh, gt, gtn,
                                onet_samples=item.get(DS.GT_ONET_SAMPLE))
        m["source"] = item[DS.SHAPE_NAME]
        rows.append(m)
        print(f"[{j + 1}/{n}] {m['source']}: " +
              ", ".join(f"{k}={v:.4f}" for k, v in m.items()
                        if isinstance(v, float)), flush=True)
        if args.save_meshes:
            write_ply(run / f"{m['source'].replace('/', '_')}.ply",
                      mesh.v, mesh.f)

    with open(run / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=sorted(rows[0]))
        w.writeheader()
        w.writerows(rows)
    agg = {k: float(np.nanmean([r[k] for r in rows]))
           for k in rows[0] if k != "source"}
    print("AGGREGATE:", json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
