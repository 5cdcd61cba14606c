"""Spatial sharding: the sequence-parallel analog for surface
reconstruction (SURVEY.md §5 "long-context equivalent").

The reference scales spatially by *serial* chunking with host offload
(NKSR-USAGE.md:88-126).  On TPU the chunk grid maps onto the device mesh
instead: each chip owns a slab of space plus a halo wide enough for the
kernel support + dual-MC stencil, reconstructs its slab locally, and only
the halo features ride ICI.

Round-1 scope: shard a *batch of chunks* across the mesh with shard_map —
each device runs the full single-chunk pipeline on its own chunk(s) (the
chunks are independent by construction because the host chunker already
adds geometric halos, chunking.py).  True halo exchange of SVH features
via ppermute is the planned next step and has a stub here.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
from jax import shard_map

from ..models import pipeline as P


def chunk_forward_sharded(cfg: P.PipelineConfig, mesh: Mesh, params,
                          chunk_batch: Dict[str, jnp.ndarray]):
    """Run the reconstruction forward on B chunks, B sharded over devices.

    ``chunk_batch``: xyz (B, N, 3), mask (B, N), feat (B, N, 3).
    Returns per-chunk field evaluations at the input points (B, N) — the
    cheap summary used by tests; full fields stay device-local.
    """

    def one(p, xyz, mask, feat):
        out = P.forward(cfg, p, xyz, mask, feat)
        return out.field.evaluate_f(xyz).value

    def shard_fn(p, xyz, mask, feat):
        return jax.vmap(lambda x, m, f: one(p, x, m, f))(xyz, mask, feat)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(PS(), PS("data"), PS("data"), PS("data")),
                   out_specs=PS("data"), check_vma=False)
    return fn(params, chunk_batch["xyz"], chunk_batch["mask"],
              chunk_batch["feat"])


def halo_exchange_1d(mesh: Mesh, axis: str, values: jnp.ndarray,
                     halo: int):
    """Exchange 1-D slab halos between mesh neighbors with ppermute.

    ``values``: per-device slab (inside shard_map), shape (L, ...).
    Returns (left_halo, right_halo) received from the neighbors — the
    primitive the future sharded-SVH solve builds on.
    """
    n = jax.lax.axis_size(axis)
    # perm (i -> i+1): device d receives the LAST rows of neighbor d-1,
    # i.e. its left halo; perm (i -> i-1) symmetric for the right halo.
    left = jax.lax.ppermute(values[-halo:], axis,
                            [(i, (i + 1) % n) for i in range(n)])
    right = jax.lax.ppermute(values[:halo], axis,
                             [(i, (i - 1) % n) for i in range(n)])
    return right, left
