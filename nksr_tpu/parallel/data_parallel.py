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


def init_distributed() -> bool:
    """Multi-host bootstrap — the reference's DDP rank setup analog
    (/root/reference/train.py:70-77, ZEUS_DL.md:145-157), the JAX way:
    one process per HOST (not per chip), ``jax.distributed.initialize``
    wires the coordinator, and every jit sees the global device set.

    Controlled by env vars so single-process runs are untouched:
      NKSR_NUM_PROCESSES  total processes (default 1 -> no-op)
      NKSR_PROCESS_ID     this process's rank
      NKSR_COORDINATOR    host:port of rank 0 (default localhost:12355)
    Returns True when a multi-process group was initialized.
    MUST run before any other JAX call (backend initialization is
    one-shot).
    """
    import os
    n = int(os.environ.get("NKSR_NUM_PROCESSES", "1"))
    if n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ.get("NKSR_COORDINATOR",
                                           "localhost:12355"),
        num_processes=n,
        process_id=int(os.environ.get("NKSR_PROCESS_ID", "0")))
    return True


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict:
    """Place stacked (B, ...) batch arrays with B sharded over the mesh.

    Single-process: a device_put with the named sharding.  Multi-process
    (jax.distributed): each process contributes its LOCAL (B/P, ...)
    stack and the global array is assembled across hosts — the
    ``batch_size // world_size`` semantics of the reference's DDP loaders
    (/root/reference/models/base_model.py:487-505)."""
    sh = NamedSharding(mesh, PS("data"))
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def stack_samples(samples) -> Dict[str, np.ndarray]:
    """Stack per-sample batch dicts (data/loader.to_device_batch output)
    into (B, ...) arrays; keys absent from any sample are dropped."""
    keys = set(samples[0])
    for s in samples[1:]:
        keys &= set(s)
    return {k: np.stack([np.asarray(s[k]) for s in samples], 0)
            for k in sorted(keys)}


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
