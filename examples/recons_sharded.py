"""Sharded single-scene reconstruction: ONE lattice over all chips.

Pass ``mesh=`` (without ``chunk_size``) and ``Reconstructor.reconstruct``
shards the scene's solve lattice into x-slabs across the device mesh;
the kernel-support halo planes ride ICI inside every CG iteration
(nksr_tpu/parallel/lattice_shard.py).  This is the TPU-native analog of
the reference's chunked out-of-core engine
(/root/reference/NKSR-USAGE.md:88-126) for the case where you want one
seamless solve instead of stitched chunks.

Run on real chips, or on a virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/recons_sharded.py
"""

import common  # noqa: F401  (adds the checkout root to sys.path)
import jax
import numpy as np

from nksr_tpu import Reconstructor
from nksr_tpu import parallel as PP
from nksr_tpu.data import write_ply


def terrain(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-4.0, 4.0, size=(n, 2)).astype(np.float32)
    h = np.sin(0.8 * xy[:, 0]) * np.cos(0.7 * xy[:, 1])
    xyz = np.concatenate([xy, h[:, None].astype(np.float32)], 1)
    dx = 0.8 * np.cos(0.8 * xy[:, 0]) * np.cos(0.7 * xy[:, 1])
    dy = -0.7 * np.sin(0.8 * xy[:, 0]) * np.sin(0.7 * xy[:, 1])
    nrm = np.stack([-dx, -dy, np.ones(n, np.float32)], 1)
    return xyz, (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)) \
        .astype(np.float32)


if __name__ == "__main__":
    xyz, normal = terrain()
    mesh_devices = PP.make_mesh(len(jax.devices()))
    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(xyz, normal, voxel_size=0.1,
                                      detail_level=None,
                                      structure="splat",
                                      mesh=mesh_devices)
    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris "
          f"(solved over {len(jax.devices())} devices)")
    write_ply("terrain_sharded.ply", mesh.v, mesh.f)
