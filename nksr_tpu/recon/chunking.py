"""Chunked out-of-core reconstruction for scenes that exceed one solve.

Mirrors the reference chunk mode (NKSR-USAGE.md:88-126,
/root/reference/examples/recons_by_chunk.py): the scene is split into
``chunk_size`` cubes, each reconstructed independently with a halo of
neighboring points (halo >= the kernel support radius at the coarsest
level), intermediate fields parked on host memory (the ``chunk_tmp_device``
analog), and meshes stitched by extracting only the triangles owned by each
chunk — the shared lattice + identical halo field make seams geometrically
exact; vertices are welded by quantized position afterwards.

This is also the blueprint for the multi-chip path (parallel/): the chunk
grid becomes a shard grid over a jax device Mesh and halos ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..meshing.dual_mc import TriangleMesh


class ChunkedField:
    """Stitched view over per-chunk fields (host-orchestrated)."""

    def __init__(self, chunks, chunk_size: float, voxel_size: float):
        self.chunks = chunks  # list of dicts: {origin, field, lo, hi}
        self.chunk_size = chunk_size
        self.voxel_size = voxel_size

    # ------------------------------------------------------------- queries
    def evaluate_f_bar(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        out = np.full(x.shape[0], -self.voxel_size, np.float32)
        for ch in self.chunks:
            own = np.all((x >= ch["lo"]) & (x < ch["hi"]), axis=1)
            if own.any():
                import jax.numpy as jnp
                vals = ch["field"].evaluate_f_bar(jnp.asarray(x[own]))
                out[own] = np.asarray(vals)
        return out

    # ------------------------------------------------------------- meshing
    def extract_dual_mesh(self, mise_iter: int = 0, grid_upsample: int = 1,
                          max_points: Optional[int] = None) -> TriangleMesh:
        verts, tris, cols = [], [], []
        off = 0
        for ch in self.chunks:
            field = jax.device_put(ch["field"])  # bring back from host
            mesh = field.extract_dual_mesh(mise_iter=mise_iter,
                                           grid_upsample=grid_upsample,
                                           max_points=max_points)
            if mesh.v.shape[0] == 0:
                continue
            tri_c = mesh.v[mesh.f].mean(1)
            own = np.all((tri_c >= ch["lo"]) & (tri_c < ch["hi"]), axis=1)
            f = mesh.f[own]
            used, inv = np.unique(f, return_inverse=True)
            verts.append(mesh.v[used])
            tris.append(inv.reshape(-1, 3) + off)
            if mesh.c is not None:
                cols.append(mesh.c[used])
            off += used.shape[0]
        if not verts:
            return TriangleMesh(v=np.zeros((0, 3), np.float32),
                                f=np.zeros((0, 3), np.int32), c=None)
        v = np.concatenate(verts, 0)
        f = np.concatenate(tris, 0).astype(np.int32)
        c = np.concatenate(cols, 0) if cols else None
        return weld_vertices(TriangleMesh(v=v, f=f, c=c),
                             eps=1e-4 * self.voxel_size)


def weld_vertices(mesh: TriangleMesh, eps: float) -> TriangleMesh:
    """Merge vertices closer than eps (chunk-seam duplicates)."""
    if mesh.v.shape[0] == 0:
        return mesh
    q = np.round(mesh.v / max(eps, 1e-12)).astype(np.int64)
    _, first, inv = np.unique(q, axis=0, return_index=True,
                              return_inverse=True)
    v = mesh.v[first]
    c = None if mesh.c is None else mesh.c[first]
    f = inv[mesh.f].astype(np.int32)
    # drop degenerate triangles created by welding
    keep = ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
            & (f[:, 0] != f[:, 2]))
    return TriangleMesh(v=v, f=f[keep], c=c)


def reconstruct_chunked(recon, xyz: np.ndarray,
                        normal: Optional[np.ndarray],
                        sensor: Optional[np.ndarray], chunk_size: float,
                        approx_kernel_grad: bool = False,
                        solver_tol: float = 1e-5) -> ChunkedField:
    cfg = recon.config
    vs = cfg.voxel_size
    # halo: kernel support reach at the coarsest level + DMC stencil
    halo = vs * (2 ** cfg.tree_depth) + 2 * vs

    lo = xyz.min(0)
    ids = np.floor((xyz - lo) / chunk_size).astype(np.int64)
    uniq = np.unique(ids, axis=0)
    host = jax.devices("cpu")[0] if jax.devices("cpu") else None

    chunks = []
    for cid in uniq:
        c_lo = lo + cid * chunk_size
        c_hi = c_lo + chunk_size
        sel = np.all((xyz >= c_lo - halo) & (xyz < c_hi + halo), axis=1)
        if sel.sum() < 16:
            continue
        field = recon.reconstruct(
            xyz[sel],
            None if normal is None else normal[sel],
            sensor=None if sensor is None else sensor[sel],
            detail_level=None, voxel_size=vs,
            approx_kernel_grad=approx_kernel_grad, solver_tol=solver_tol)
        if host is not None:
            field = jax.device_put(field, host)  # park on host RAM
        chunks.append({"lo": c_lo, "hi": c_hi, "field": field})
    return ChunkedField(chunks, chunk_size, vs)
