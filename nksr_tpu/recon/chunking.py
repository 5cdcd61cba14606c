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

    def __init__(self, chunks, chunk_size: float, voxel_size: float,
                 origin=None, id_lo=None, id_hi=None):
        self.chunks = chunks  # dicts: {cid, field, lo, hi}
        self.chunk_size = chunk_size
        self.voxel_size = voxel_size
        self.origin = origin
        self.id_lo = id_lo
        self.id_hi = id_hi

    def _own_cell(self, pts: np.ndarray) -> np.ndarray:
        """Chunk cell owning each point; clamped so boundary geometry maps
        onto an existing cell instead of the void outside the scene."""
        cell = np.floor((pts - self.origin) / self.chunk_size).astype(
            np.int64)
        return np.clip(cell, self.id_lo, self.id_hi)

    # ------------------------------------------------------------- queries
    def evaluate_f_bar(self, x: np.ndarray) -> np.ndarray:
        """Partition-of-unity blended field — the SAME field the mesher
        extracts (queries and extract_dual_mesh agree by construction).
        Chunks without host tables fall back to owner-cell routing."""
        x = np.asarray(x, np.float32)
        host_chunks = [ch for ch in self.chunks
                       if hasattr(ch["field"], "host_grids")]
        if host_chunks:
            return self._blend_eval(host_chunks, x)
        out = np.full(x.shape[0], -self.voxel_size, np.float32)
        cells = self._own_cell(x)
        for ch in self.chunks:
            own = np.all(cells == ch["cid"], axis=1)
            if own.any():
                vals = ch["field"].evaluate_f_bar(x[own])
                out[own] = np.asarray(vals)
        return out

    def _chunk_weight(self, ch, pts, blend):
        """Partition-of-unity weight: linear ramps of width 2*blend at
        interior cell boundaries (neighbors' ramps sum to 1), extended
        past the scene edge at extreme cells."""
        lo = self.origin + ch["cid"] * self.chunk_size
        hi = lo + self.chunk_size
        w = np.ones(pts.shape[0], np.float32)
        for a in range(3):
            rise = np.clip((pts[:, a] - lo[a]) / (2 * blend) + 0.5, 0, 1)
            fall = np.clip((hi[a] - pts[:, a]) / (2 * blend) + 0.5, 0, 1)
            if ch["cid"][a] == self.id_lo[a]:
                rise = np.ones_like(rise)
            if ch["cid"][a] == self.id_hi[a]:
                fall = np.ones_like(fall)
            w *= rise * fall
        return w

    def _blend_eval(self, host_chunks, pts, grad=False):
        blend = 2.0 * self.voxel_size
        acc = np.zeros(pts.shape[0], np.float32)
        gacc = np.zeros((pts.shape[0], 3), np.float32)
        wsum = np.zeros(pts.shape[0], np.float32)
        for ch in host_chunks:
            w = self._chunk_weight(ch, pts, blend)
            sel = w > 0
            if not sel.any():
                continue
            hf = ch["field"]
            if grad:
                v, g = hf._eval_batched(pts[sel], grad=True)
            else:
                v = hf._eval_batched(pts[sel])
                m = hf._mask_host(pts[sel])
                v = np.where(m, v, -self.voxel_size)
            acc[sel] += w[sel] * v
            if grad:
                gacc[sel] += w[sel, None] * g
            wsum[sel] += w[sel]
        vals = np.where(wsum > 0, acc / np.maximum(wsum, 1e-12),
                        -self.voxel_size).astype(np.float32)
        if grad:
            return vals, gacc / np.maximum(wsum[:, None], 1e-12)
        return vals

    # ------------------------------------------------------------- meshing
    def extract_dual_mesh(self, mise_iter: int = 0, grid_upsample: int = 1,
                          max_points: Optional[int] = None) -> TriangleMesh:
        """One GLOBAL dual-MC over the union lattice; every corner/vertex
        is evaluated by its owning chunk's field.  This mirrors the
        reference's stitch-then-mesh order (NKSR-USAGE.md:141-170) and is
        seamless by construction — no duplicated vertices to weld."""
        from ..meshing.host_mc import (dual_mc_on_lattice,
                                       extraction_lattice_host)
        host_chunks = [ch for ch in self.chunks
                       if hasattr(ch["field"], "host_grids")]
        if not host_chunks:
            return self._extract_per_chunk(mise_iter, grid_upsample,
                                           max_points)
        for ch in host_chunks:
            ch["field"].field = jax.device_put(ch["field"].field)
        u = max(int(grid_upsample), 1)
        s = self.voxel_size / u
        import numpy as _np
        from ..core import host_build as HB
        # union of all chunks' lattices (the lattice is a global integer
        # grid, so overlapping halo regions dedup exactly via the keys)
        vox_parts = [extraction_lattice_host(ch["field"].host_grids,
                                             ch["field"].adaptive_depth, u)
                     for ch in host_chunks]
        vox = HB.unpack64(np.unique(HB.pack64(
            np.concatenate(vox_parts, 0)))).astype(np.int64)

        def route_eval(pts, grad=False):
            return self._blend_eval(host_chunks, pts, grad=grad)

        tex = next((getattr(ch["field"].field, "texture_field", None)
                    for ch in host_chunks), None)
        return dual_mc_on_lattice(
            vox, s, route_eval,
            eval_grad=(lambda p: route_eval(p, grad=True)),
            mise_iter=mise_iter, texture=tex)

    def _extract_per_chunk(self, mise_iter, grid_upsample, max_points):
        verts, tris, cols = [], [], []
        off = 0
        for ch in self.chunks:
            field = jax.device_put(ch["field"])
            mesh = field.extract_dual_mesh(mise_iter=mise_iter,
                                           grid_upsample=grid_upsample,
                                           max_points=max_points)
            if mesh.v.shape[0] == 0 or mesh.f.shape[0] == 0:
                continue
            tri_c = mesh.v[mesh.f].mean(1)
            own = np.all(self._own_cell(tri_c) == ch["cid"], axis=1)
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
            # park device arrays on host RAM (the chunk_tmp_device analog);
            # HostField wraps the pytree, so park its inner field
            if hasattr(field, "field"):
                field.field = jax.device_put(field.field, host)
            else:
                field = jax.device_put(field, host)
        chunks.append({"cid": cid, "lo": c_lo, "hi": c_hi, "field": field})
    return ChunkedField(chunks, chunk_size, vs, origin=lo,
                        id_lo=uniq.min(0), id_hi=uniq.max(0))
