"""Multi-chip training: SPMD data parallelism over a jax Mesh.

Replaces the reference's PyTorch-Lightning DDP/NCCL path
(/root/reference/train.py:70-77, ZEUS_DL.md:145-157) the TPU way: one
process, a ``jax.sharding.Mesh`` over all chips, batch arrays sharded on
the ``data`` axis, parameters replicated.  XLA inserts the gradient
all-reduce over ICI automatically — there is no hand-written communication
layer to maintain (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..models import pipeline as P
from . import spatial  # noqa: F401  (re-export site for the SP analog)
from ..train import loop as T
from ..train import losses as L


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict:
    """Place stacked (B, ...) batch arrays with B sharded over the mesh."""
    sh = NamedSharding(mesh, PS("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, PS())
    return jax.device_put(tree, sh)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tc", "lcfg", "use_gt_structure"))
def dp_train_step(cfg: P.PipelineConfig, tc: T.TrainConfig,
                  lcfg: L.LossConfig, state: T.TrainState,
                  batch: Dict[str, jnp.ndarray], rngs: jnp.ndarray,
                  use_gt_structure: bool = True):
    """One DP step over a stacked batch of B point clouds.

    ``batch`` arrays have leading dim B (sharded over the mesh's data
    axis); ``rngs`` is (B, 2) uint32.  Per-cloud forwards+losses run
    locally on each chip via vmap; the mean couples them, so XLA emits a
    single cross-chip all-reduce for the gradients.
    """

    def per_sample_loss(params, sample, rng):
        gt_svh = P.build_gt_svh(cfg, sample["gt_xyz"], sample["gt_mask"],
                                sample["gt_normal"])
        feat = P.point_features(cfg, sample["xyz"],
                                normal=sample.get("normal"),
                                sensor=sample.get("sensor"))
        out = P.forward(cfg, params, sample["xyz"], sample["mask"], feat,
                        gt_svh=gt_svh, use_gt_structure=use_gt_structure)
        b = dict(sample)
        b["gt_svh"] = gt_svh
        losses, _ = L.compute_losses(rng, cfg, lcfg, out, b)
        return sum(losses.values()), losses

    def loss_fn(params):
        totals, losses = jax.vmap(
            lambda s, r: per_sample_loss(params, s, r))(batch, rngs)
        return jnp.mean(totals), jax.tree_util.tree_map(jnp.mean, losses)

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    opt = T.make_optimizer(tc)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state.params, updates)
    new_state = T.TrainState(params=new_params, opt_state=new_opt,
                             step=state.step + 1)
    losses = dict(losses)
    losses["sum"] = total
    return new_state, losses
