#!/usr/bin/env python
"""Train an NKSR-TPU model from a YAML config.

Usage:
    python train.py configs/shapenet/train.yaml --run_dir runs/snet \
        --exec voxel_size=0.02 unet.f_maps=32 --max_steps 100000

Counterpart of the reference training driver (reference behavior surveyed
in SURVEY.md §3.1); supports dotted --exec overrides, --include extra
configs, resume, and periodic validation/checkpointing.
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--exec", nargs="*", default=[], dest="execs",
                    help="dotted k=v config overrides")
    ap.add_argument("--include", nargs="*", default=[],
                    help="extra config files merged on top")
    ap.add_argument("--max_steps", type=int, default=10 ** 9)
    ap.add_argument("--val_every", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--batch_size", type=int, default=None,
                    help="GLOBAL data-parallel clouds per step, sharded "
                         "over all devices via parallel.dp_train_step "
                         "(must divide the device count; default 1 = "
                         "single-device step)")
    args = ap.parse_args()

    # multi-host bootstrap FIRST (before any jax call): no-op unless
    # NKSR_NUM_PROCESSES>1 (reference DDP analog, train.py:70-77)
    from nksr_tpu.parallel import init_distributed
    distributed = init_distributed()

    from nksr_tpu.utils.config import load_config, save_config
    from nksr_tpu.train import driver
    from nksr_tpu.data import (DatasetSpec as DS, build_dataset,
                               PrefetchLoader)

    cfg = load_config(args.config, overrides=args.execs,
                      includes=args.include)
    run_dir = Path(args.run_dir or f"runs/{cfg.get('name', 'untitled')}")
    run_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, run_dir / "config.yaml")

    spec = [DS.SHAPE_NAME, DS.INPUT_PC, DS.TARGET_NORMAL, DS.GT_DENSE_PC,
            DS.GT_DENSE_NORMAL, DS.GT_ONET_SAMPLE]
    tr = cfg.get("train_dataset", {})
    va = cfg.get("val_dataset", tr)
    train_ds = build_dataset(tr.get("name", "ShapeNet"), spec,
                             **tr.get("args", {}))
    val_ds = build_dataset(va.get("name", "ShapeNet"), spec,
                           **va.get("args", {}))
    pb = cfg.get("point_bucket")
    gb = cfg.get("gt_bucket")
    if args.batch_size and args.batch_size > 1 and (pb is None
                                                    or gb is None):
        # stacked DP batches need uniform shapes across samples
        pb = pb or cfg.get("capacities", [65536])[0]
        gb = gb or pb
    indices = None
    if distributed:
        # per-process stride over the dataset (the reference's
        # DistributedSampler analog; each rank reads a disjoint slice)
        import jax
        indices = range(jax.process_index(), len(train_ds),
                        jax.process_count())
    train_loader = PrefetchLoader(train_ds, indices=indices, shuffle=True,
                                  seed=args.seed,
                                  point_bucket=pb, gt_bucket=gb,
                                  epochs=10 ** 6)
    val_loader = lambda: PrefetchLoader(
        val_ds, indices=range(min(len(val_ds), 8)), shuffle=False,
        point_bucket=pb, gt_bucket=gb)

    class _Revalidating:
        def __iter__(self):
            return iter(val_loader())

    driver.fit(cfg, train_loader, _Revalidating(), run_dir,
               max_steps=args.max_steps, val_every=args.val_every,
               seed=args.seed, resume=args.resume,
               batch_size=args.batch_size)


if __name__ == "__main__":
    main()
