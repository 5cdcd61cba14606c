"""Chunked out-of-core reconstruction of a large synthetic scene.

Mirrors the reference chunk-mode example
(/root/reference/examples/recons_by_chunk.py contract: chunk_size splits,
host-parked intermediates, stitched mesh)."""

from common import make_terrain_scene, warning_on_low_memory
from nksr_tpu import Reconstructor, get_estimate_normal_preprocess_fn
from nksr_tpu.data import write_ply

if __name__ == "__main__":
    warning_on_low_memory(2048.0)
    xyz, sensor = make_terrain_scene(n=300000)
    reconstructor = Reconstructor()
    field = reconstructor.reconstruct(
        xyz, sensor=sensor, chunk_size=12.0,
        preprocess_fn=get_estimate_normal_preprocess_fn(32, 85.0))
    mesh = field.extract_dual_mesh(mise_iter=1)
    print(f"stitched mesh: {mesh.v.shape[0]} verts, {mesh.f.shape[0]} tris")
    write_ply("terrain_mesh.ply", mesh.v, mesh.f)
