"""Training/eval/overfit drivers (the Zeus-layer equivalent).

Covers the reference's train.py / test.py / overfit.py driver features
(/root/reference/train.py:103-313, test.py:33-104, overfit.py:130-174)
the JAX way: config-driven runs, periodic validation + checkpointing
(best/last), CSV + stdout logging, resume, deterministic seeding, and the
teacher-forcing structure schedule.  Use via the repo-root ``train.py``,
``eval.py`` and ``overfit.py`` scripts.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..models import pipeline as P
from ..utils import checkpoint as CKPT
from ..utils.config import Config
from . import loop as T
from . import losses as L


def pipeline_config_from_yaml(cfg: Config) -> P.PipelineConfig:
    """Map reference-style YAML keys (configs/default/train.yaml) onto
    PipelineConfig."""
    sup = cfg.get("supervision", {})
    solver = cfg.get("solver", {})
    caps = cfg.get("capacities",
                   [65536 >> d for d in range(cfg.get("tree_depth", 4))])
    return P.PipelineConfig(
        voxel_size=cfg.get("voxel_size", 0.1),
        tree_depth=cfg.get("tree_depth", 4),
        adaptive_depth=cfg.get("adaptive_depth", 1),
        kernel_dim=cfg.get("kernel_dim", 4),
        f_maps=cfg.get("unet", {}).get("f_maps", 32),
        interp_hidden=cfg.get("interpolator", {}).get("hidden_dim", 16),
        interp_layers=cfg.get("interpolator", {}).get("n_hidden", 2),
        feature=cfg.get("feature", "normal"),
        geometry=cfg.get("geometry", "kernel"),
        udf_enabled=cfg.get("udf", {}).get("enabled", False),
        pos_weight=solver.get("pos_weight", 1e4),
        normal_weight=solver.get("normal_weight", 1e4),
        capacities=tuple(caps),
        adaptive_tau=cfg.get("adaptive_policy", {}).get("tau", 0.1),
        solver_tol=cfg.get("solver_tol", 1e-5),
        solver_max_iters=cfg.get("solver_max_iters", 128),
    )


def loss_config_from_yaml(cfg: Config) -> L.LossConfig:
    sup = Config(cfg.get("supervision", {}))
    def samplers(lst):
        return tuple(L.SamplerConfig(
            type=s.get("type", "uniform"), n_samples=s.get("n_samples", 0),
            expand=s.get("expand", 0), expand_top=s.get("expand_top", 0),
            eps=s.get("eps", 0.5)) for s in lst)
    sp = Config(sup.get("spatial", {}))
    udf = Config(sup.get("udf", {}))
    gs = Config(sup.get("gt_surface", {}))
    return L.LossConfig(
        structure_weight=sup.get("structure_weight", 20.0),
        gt_surface_value=gs.get("value", 200.0),
        gt_surface_normal=gs.get("normal", 100.0),
        gt_surface_subsample=gs.get("subsample", 50000),
        spatial_weight=sp.get("weight", 300.0),
        reg_sdf_weight=sp.get("reg_sdf_weight", 0.0),
        spatial_samplers=samplers(sp.get("samplers", [])) or
        L.LossConfig.spatial_samplers,
        udf_weight=udf.get("weight", 150.0),
        udf_samplers=samplers(udf.get("samplers", [])) or
        L.LossConfig.udf_samplers,
        gt_soft=sp.get("gt_soft", True),
        gt_band=sp.get("gt_band", 1.0),
    )


def train_config_from_yaml(cfg: Config) -> T.TrainConfig:
    lr = Config(cfg.get("learning_rate", {}))
    ss = Config(cfg.get("structure_schedule", {}))
    return T.TrainConfig(
        lr_init=lr.get("init", 1e-4),
        lr_decay_mult=lr.get("decay_mult", 0.7),
        lr_decay_step=lr.get("decay_step", 50000),
        lr_clip=lr.get("clip", 1e-6),
        weight_decay=cfg.get("weight_decay", 0.0),
        grad_clip=cfg.get("grad_clip", 0.5),
        structure_start_step=ss.get("start_step", 2500),
        structure_end_step=ss.get("end_step", 10000),
        accumulate_grad_batches=cfg.get("accumulate_grad_batches", 1),
    )


class RunLogger:
    """CSV + stdout metric logging (wandb/tb stand-in; reference
    models/base_model.py:265-330)."""

    def __init__(self, run_dir: Path):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.run_dir / "metrics.csv"
        self._keys = None
        self._writer = None
        self._fh = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        row = {"step": step}
        row.update({f"{prefix}{k}": float(v) for k, v in metrics.items()})
        if self._fh is None:
            self._fh = open(self.csv_path, "a", newline="")
        w = csv.DictWriter(self._fh, fieldnames=sorted(row))
        if self._keys != sorted(row):
            w.writeheader()
            self._keys = sorted(row)
        w.writerow(row)
        self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()


def fit(cfg: Config, train_loader: Iterable, val_loader: Optional[Iterable],
        run_dir: str, max_steps: int = 10 ** 9, val_every: int = 1000,
        ckpt_every: int = 1000, seed: int = 0,
        resume: bool = False) -> T.TrainState:
    """The fit loop: schedule-driven teacher forcing, periodic val,
    best/last checkpointing, resume."""
    pcfg = pipeline_config_from_yaml(cfg)
    lcfg = loss_config_from_yaml(cfg)
    tcfg = train_config_from_yaml(cfg)
    run = Path(run_dir)
    logger = RunLogger(run)
    rng = np.random.default_rng(seed)

    state = T.init_state(pcfg, tcfg, jax.random.PRNGKey(seed))
    start_step = 0
    last_ckpt = run / "last.ckpt"
    if resume and last_ckpt.exists():
        state = CKPT.load_params(last_ckpt, state)
        start_step = int(state.step)
        print(f"[resume] from {last_ckpt} at step {start_step}")

    best_val = float("inf")
    step = start_step
    t0 = time.time()
    from ..utils import profiling as PROF
    ctx = PROF.trace_run(str(run / "trace"))   # active iff NKSR_PROFILE=1
    ctx.__enter__()
    for batch in train_loader:
        if step >= max_steps:
            break
        use_gt = rng.random() >= T.pd_structure_prob(tcfg, step)
        key = jax.random.PRNGKey(seed * 1000003 + step)
        state, losses, _ = T.train_step(pcfg, tcfg, lcfg, state, batch,
                                        key, use_gt_structure=use_gt)
        step = int(state.step)
        if step % 50 == 0 or step == start_step + 1:
            ls = {k: float(v) for k, v in losses.items()}
            dt = time.time() - t0
            print(f"[train {step}] sum={ls['sum']:.4f} "
                  f"({dt / max(step - start_step, 1):.2f}s/it)", flush=True)
            logger.log(step, ls, "train/")
        if val_loader is not None and step % val_every == 0:
            vals = []
            for vb in val_loader:
                l, m = T.val_step(pcfg, lcfg, state.params, vb,
                                  jax.random.PRNGKey(step))
                vals.append({**{k: float(x) for k, x in l.items()},
                             **{k: float(x) for k, x in m.items()}})
            mean = {k: float(np.mean([v[k] for v in vals if k in v]))
                    for k in vals[0]} if vals else {}
            logger.log(step, mean, "val/")
            print(f"[val {step}] {json.dumps(mean)[:200]}", flush=True)
            if mean.get("sum", float("inf")) < best_val:
                best_val = mean["sum"]
                CKPT.save_params(run / "best.ckpt", state)
        if step % ckpt_every == 0:
            CKPT.save_params(last_ckpt, state)
    ctx.__exit__(None, None, None)
    CKPT.save_params(last_ckpt, state)
    logger.close()
    return state
