"""Scene-scale lidar reconstruction with sensor-based normal estimation.

Mirrors the reference waymo example contract
(/root/reference/examples/recons_waymo.py:30-44): no normals in, a
``preprocess_fn`` estimates them from sensor poses, efficiency flags
``approx_kernel_grad`` + ``fused_mode`` + loose solver tolerance.  The
sandbox has no Waymo asset (zero egress), so a synthetic lidar-like
terrain stands in.
"""

from common import make_terrain_scene, warning_on_low_memory
from nksr_tpu import Reconstructor, get_estimate_normal_preprocess_fn
from nksr_tpu.data import write_ply

if __name__ == "__main__":
    warning_on_low_memory(20000.0)
    xyz, sensor = make_terrain_scene(n=300000)

    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(
        xyz, sensor=sensor, detail_level=None,
        # minor configs for better efficiency (not necessary)
        approx_kernel_grad=True, solver_tol=1e-4, fused_mode=True,
        # chunked reconstruction (if OOM): chunk_size=51.2,
        preprocess_fn=get_estimate_normal_preprocess_fn(64, 85.0),
        structure="splat")

    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris")
    write_ply("waymo_like_mesh.ply", mesh.v, mesh.f)
