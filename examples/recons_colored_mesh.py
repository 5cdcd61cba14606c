"""Colored reconstruction via a texture field (vertex colors).

Mirrors /root/reference/examples/recons_colored_mesh.py contract:
set_texture_field(PCNNField(xyz, color)) -> mesh.c."""

import numpy as np

from common import load_spot_example
from nksr_tpu import Reconstructor
from nksr_tpu.fields import PCNNField
from nksr_tpu.data import write_ply

if __name__ == "__main__":
    import jax.numpy as jnp

    v, f, normal, color = load_spot_example()
    if color is None:  # color by position as a stand-in
        color = (v - v.min(0)) / (v.max(0) - v.min(0))
    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(v, normal, detail_level=0.6,
                                      structure="splat")
    tex = PCNNField.build(jnp.asarray(v), jnp.asarray(color),
                          jnp.ones(v.shape[0], bool),
                          cell_size=4 * float(field.svh.voxel_size),
                          capacity=1 << 16)
    field = field.set_texture_field(tex)
    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"colored mesh: {mesh.v.shape[0]} verts; has colors: "
          f"{mesh.c is not None}")
    write_ply("spot_colored.ply", mesh.v, mesh.f, colors=mesh.c)
