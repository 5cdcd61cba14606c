"""Training loop: optimizer, schedules, guarded train/val steps.

TPU-native counterpart of the reference BaseModel training machinery
(/root/reference/models/base_model.py): AdamW(amsgrad)-style optimizer with
step-decay LR (base_model.py:172-196), gradient value clipping and NaN-step
skipping (base_model.py:201-231), and the teacher-forcing structure
schedule (/root/reference/models/nksr_net.py:218-226).

XLA's static allocation removes the reference's OOM-retry machinery
(base_model.py:137-161): memory use is decided at compile time, so a
config either fits or fails fast at compile — there is nothing to catch at
step time.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import pipeline as P
from . import losses as L


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors configs/default/train.yaml:33-47 + param.yaml."""
    lr_init: float = 1e-4
    lr_decay_mult: float = 0.7
    lr_decay_step: int = 50000
    lr_clip: float = 1e-6
    weight_decay: float = 0.0
    grad_clip: float = 0.5
    structure_start_step: int = 2500
    structure_end_step: int = 10000
    accumulate_grad_batches: int = 1


def lr_schedule(tc: TrainConfig):
    def fn(step):
        lr = tc.lr_init * tc.lr_decay_mult ** (step // tc.lr_decay_step)
        return jnp.maximum(lr, tc.lr_clip)
    return fn


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    opt = optax.chain(
        optax.clip(tc.grad_clip),                       # value clip 0.5
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(tc.weight_decay),
        optax.scale_by_learning_rate(lr_schedule(tc)),
    )
    # skip steps whose grads contain NaN/inf instead of corrupting state
    return optax.apply_if_finite(opt, max_consecutive_errors=100)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_state(cfg: P.PipelineConfig, tc: TrainConfig, rng) -> TrainState:
    params = P.init_params(cfg, rng)
    opt = make_optimizer(tc)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def pd_structure_prob(tc: TrainConfig, step: int) -> float:
    """Teacher-forcing schedule (nksr_net.py:218-226): probability of
    relying on *predicted* structure ramps 0 -> 1."""
    denom = max(tc.structure_end_step - tc.structure_start_step, 1)
    return min(max((step - tc.structure_start_step) / denom, 0.0), 1.0)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tc", "lcfg", "use_gt_structure",
                                    "compute_metric"))
def train_step(cfg: P.PipelineConfig, tc: TrainConfig, lcfg: L.LossConfig,
               state: TrainState, batch: Dict, rng,
               use_gt_structure: bool = True,
               compute_metric: bool = False):
    """One optimization step.  ``batch`` arrays are capacity-padded with
    masks; gt_svh is built inside (on-device) from the GT cloud."""
    gt_svh = P.build_gt_svh(cfg, batch["gt_xyz"], batch["gt_mask"],
                            batch["gt_normal"])
    feat = P.point_features(cfg, batch["xyz"],
                            normal=batch.get("normal"),
                            sensor=batch.get("sensor"))

    def loss_fn(params):
        out = P.forward(cfg, params, batch["xyz"], batch["mask"], feat,
                        gt_svh=gt_svh, use_gt_structure=use_gt_structure)
        b = dict(batch)
        b["gt_svh"] = gt_svh
        losses, metrics = L.compute_losses(rng, cfg, lcfg, out, b,
                                           compute_metric=compute_metric)
        total = sum(losses.values())
        return total, (losses, metrics)

    (total, (losses, metrics)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    opt = make_optimizer(tc)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=new_params, opt_state=new_opt,
                           step=state.step + 1)
    losses = dict(losses)
    losses["sum"] = total
    return new_state, losses, metrics


@functools.partial(jax.jit,
                   static_argnames=("cfg", "lcfg", "use_gt_structure"))
def val_step(cfg: P.PipelineConfig, lcfg: L.LossConfig, params, batch, rng,
             use_gt_structure: bool = True):
    gt_svh = P.build_gt_svh(cfg, batch["gt_xyz"], batch["gt_mask"],
                            batch["gt_normal"])
    feat = P.point_features(cfg, batch["xyz"], normal=batch.get("normal"),
                            sensor=batch.get("sensor"))
    out = P.forward(cfg, params, batch["xyz"], batch["mask"], feat,
                    gt_svh=gt_svh, use_gt_structure=use_gt_structure)
    b = dict(batch)
    b["gt_svh"] = gt_svh
    losses, metrics = L.compute_losses(rng, cfg, lcfg, out, b,
                                       compute_metric=True)
    # NaN val losses are reported as 0 (reference nksr_net.py:256-258)
    total = sum(losses.values())
    total = jnp.where(jnp.isnan(total), 0.0, total)
    losses = dict(losses)
    losses["sum"] = total
    return losses, metrics
