"""GIS / aerial-lidar reconstruction from LAS tiles.

Mirrors the reference GIS example (/root/reference/examples/gis_app.py):
read a LAS tile, recentre, crop a region of interest, synthesize overhead
sensor poses, reconstruct with coarse detail + efficiency flags.  ``laspy``
is not in this sandbox, so the example gates on it and falls back to the
synthetic terrain.
"""

import numpy as np

from common import make_terrain_scene
from nksr_tpu import Reconstructor, get_estimate_normal_preprocess_fn
from nksr_tpu.data import write_ply


def load_las(path: str) -> np.ndarray:
    import laspy  # optional dependency, as in the reference
    las = laspy.read(path)
    xyz = np.vstack((las.x, las.y, las.z)).T
    return xyz.astype(np.float64)


if __name__ == "__main__":
    try:
        xyz = load_las("assets/las/example.las")
        print("point stats (mean/min/max)", xyz.mean(0), xyz.min(0),
              xyz.max(0))
        xyz -= (xyz.max(0) + xyz.min(0))[None] / 2.0   # recentre
        xyz = xyz[np.linalg.norm(xyz, axis=1) < 20.0]  # region of interest
        xyz = xyz.astype(np.float32)
    except (ImportError, FileNotFoundError):
        print("laspy / LAS asset unavailable; using synthetic terrain")
        xyz, _ = make_terrain_scene(n=60000, extent=30.0)

    # overhead sensor for normal orientation (gis_app.py:36)
    sensor = np.zeros_like(xyz)
    sensor[:, 2] = 50.0

    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(
        xyz, sensor=sensor, detail_level=0.1,
        approx_kernel_grad=True, solver_tol=1e-4, fused_mode=True,
        preprocess_fn=get_estimate_normal_preprocess_fn(64, 85.0),
        structure="splat")
    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris")
    write_ply("gis_mesh.ply", mesh.v, mesh.f)
