"""Whole-pipeline CPU fallback (no accelerator required).

Mirrors the reference CPU example
(/root/reference/examples/recons_waymo_cpu.py and NKSR-USAGE.md:141-170):
the same code path runs on the CPU backend — with JAX that is just
``JAX_PLATFORMS=cpu`` (set before import, or run as
``JAX_PLATFORMS=cpu python examples/recons_waymo_cpu.py``).  The normal
estimation algorithm the reference spells out in this example
(kNN-PCA + sensor disambiguation + grazing filter,
recons_waymo_cpu.py:21-41) lives in
``nksr_tpu.get_estimate_normal_preprocess_fn``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from common import make_terrain_scene  # noqa: E402
from nksr_tpu import Reconstructor, get_estimate_normal_preprocess_fn  # noqa: E402
from nksr_tpu.data import write_ply  # noqa: E402

if __name__ == "__main__":
    xyz, sensor = make_terrain_scene(n=60000)

    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(
        xyz, sensor=sensor, detail_level=None,
        approx_kernel_grad=True, solver_tol=1e-4,
        preprocess_fn=get_estimate_normal_preprocess_fn(64, 85.0),
        structure="splat")

    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris")
    write_ply("waymo_cpu_mesh.ply", mesh.v, mesh.f)
