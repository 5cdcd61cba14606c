#!/usr/bin/env python
"""Single-sample overfit loop — the reference's debugging-as-testing tool
(SURVEY.md §3.4): repeatedly trains on ONE sample, periodically runs the
test path and logs loss curves to CSV, so convergence problems are visible
in minutes.

Usage:
    python overfit.py configs/shapenet/train.yaml --sample 0 \
        --steps 300 --interval 50
"""

import argparse
import csv
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--interval", type=int, default=50)
    ap.add_argument("--run_dir", default="runs/overfit")
    ap.add_argument("--exec", nargs="*", default=[], dest="execs")
    args = ap.parse_args()

    import jax
    from nksr_tpu.utils.config import load_config
    from nksr_tpu.utils.metrics import MeshEvaluator
    from nksr_tpu.train import driver, loop as T
    from nksr_tpu.models import pipeline as P
    from nksr_tpu.data import (DatasetSpec as DS, build_dataset,
                               to_device_batch, write_ply)

    cfg = load_config(args.config, overrides=args.execs)
    pcfg = driver.pipeline_config_from_yaml(cfg)
    lcfg = driver.loss_config_from_yaml(cfg)
    tcfg = driver.train_config_from_yaml(cfg)

    spec = [DS.SHAPE_NAME, DS.INPUT_PC, DS.TARGET_NORMAL, DS.GT_DENSE_PC,
            DS.GT_DENSE_NORMAL]
    tr = cfg.get("train_dataset", {})
    ds = build_dataset(tr.get("name", "ShapeNet"), spec,
                       **tr.get("args", {}))
    batch = to_device_batch(ds[args.sample], cfg.get("point_bucket"),
                            cfg.get("gt_bucket"))

    run = Path(args.run_dir)
    run.mkdir(parents=True, exist_ok=True)
    state = T.init_state(pcfg, tcfg, jax.random.PRNGKey(0))
    evaluator = MeshEvaluator(n_points=100000)
    hist = []
    for i in range(args.steps):
        state, losses, _ = T.train_step(
            pcfg, tcfg, lcfg, state, batch, jax.random.PRNGKey(i),
            use_gt_structure=True)
        hist.append({"step": i, **{k: float(v) for k, v in losses.items()}})
        if i % 10 == 0:
            print(f"[{i}] sum={hist[-1]['sum']:.4f}", flush=True)
        if args.interval and (i + 1) % args.interval == 0:
            feat = P.point_features(pcfg, batch["xyz"],
                                    normal=batch.get("normal"))
            out = P.forward(pcfg, state.params, batch["xyz"],
                            batch["mask"], feat)
            mesh = out.field.extract_dual_mesh(mise_iter=1)
            gt = np.asarray(batch["gt_xyz"])[np.asarray(batch["gt_mask"])]
            m = evaluator.eval_mesh(mesh, gt)
            print(f"[test {i + 1}] chamfer-L1={m['chamfer-L1']:.5f} "
                  f"v={mesh.v.shape[0]}", flush=True)
            write_ply(run / f"mesh_{i + 1}.ply", mesh.v, mesh.f)
    with open(run / "loss.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=sorted(hist[0]))
        w.writeheader()
        w.writerows(hist)
    print(f"wrote {run}/loss.csv")


if __name__ == "__main__":
    main()
