"""Indoor-scan reconstruction at a fixed fine voxel size.

Mirrors the reference scannet example contract
(/root/reference/examples/recons_scannet.py:27-29: voxel_size=0.02,
mise_iter=2).  No ScanNet asset in the sandbox; the vendored spot model
scaled to room-ish extent stands in.
"""

import numpy as np

from common import load_spot_example
from nksr_tpu import Reconstructor
from nksr_tpu.data import write_ply

if __name__ == "__main__":
    v, _, normal, _ = load_spot_example()
    xyz = np.asarray(v, np.float32) * 2.0   # ~room-scale extents

    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(xyz, normal, voxel_size=0.02,
                                      structure="splat")
    mesh = field.extract_dual_mesh(mise_iter=2)
    print(f"mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris")
    write_ply("scannet_like_mesh.ply", mesh.v, mesh.f)
