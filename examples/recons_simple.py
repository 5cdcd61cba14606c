"""Simplest end-to-end reconstruction: bunny points -> mesh.

Mirrors the reference example flow (/root/reference/examples/recons_simple.py
contract: Reconstructor -> reconstruct -> extract_dual_mesh)."""

import numpy as np

from common import load_bunny_example
from nksr_tpu import Reconstructor
from nksr_tpu.data import write_ply

if __name__ == "__main__":
    xyz, normal = load_bunny_example()
    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(xyz, normal, detail_level=1.0,
                                      structure="splat")
    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris")
    write_ply("bunny_mesh.ply", mesh.v, mesh.f)
