"""Lattice-native field evaluation: dense tables + one sorted gather per
query, replacing the generic host-table evaluation path for fields solved
by the dense-lattice engine (fields/lattice.py).

Why: the generic ``HostField._eval_batched`` rebuilds host support-index
tables (numpy searchsorted over 8 corners x depth) for EVERY query batch
and gathers per-depth feature rows on device — measured ~450 s for the
~8M field evaluations of a 1M-point ``extract_dual_mesh(mise_iter=1)``
(scripts/measure_e2e_phases.py).  On the dense lattice the same math is:

  * one-time: scatter the solved coefficients onto the dense lattice and
    run the AV0 cascade (fields/lattice.py) -> a (cells_0, depth*8k)
    fused support table; corner-cat the basis features -> per-depth
    (cells_d, 8*Cb) tables; fold per-depth corner activity into ONE
    (cells_0,) trust-mask buffer (the LayerField union-of-support mask).
  * per query: integer cell ids on the host (native flat_cells — the
    same fused pass the solve planner uses), then ONE 128-lane row
    gather from AV0 + one per-depth feature-row gather + the basis MLP
    on the MXU.  No searchsorted, no per-depth support joins.

Correctness notes:
  * The per-corner activity mask that row ASSEMBLY needs (inactive
    corner voxels must contribute zero basis) is unnecessary here:
    inactive voxels have exactly-zero solved coefficients (masked at
    extraction in lattice_solve), so their AV0 lanes are zero and the
    value contribution vanishes identically.
  * Out-of-lattice queries alias to dense cell 0 (flat_cells bounds
    rule), whose margin-2 ring is structurally inactive: value 0,
    mask negative — the sparse path's idx==-1 semantics.

Reference behavior being served: ``field.evaluate_f`` /
``evaluate_f_bar`` / ``extract_dual_mesh`` on a solved KernelField
(/root/reference/models/nksr_net.py:214,284, NKSR-USAGE.md:77).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import lattice as LAT


class LatticeEvalTables(NamedTuple):
    """Device tables prepared once per solved field."""
    av0: jnp.ndarray                      # (cells_0, depth*8k) fused coeffs
    fc: Tuple[jnp.ndarray, ...]           # per depth (cells_d, 8*Cb)
    mask0: jnp.ndarray                    # (cells_0,) >0 where trusted
    shell0: jnp.ndarray                   # (cells_0,) >0 on adaptive-depth
    #                                       VOXELS (the extraction shell —
    #                                       host_mc.extraction_lattice_host
    #                                       semantics)


@functools.lru_cache(maxsize=32)
def _prepare_fn(spec: LAT.LatticeSpec, cdt_str: str):
    cdt = jnp.dtype(cdt_str)

    def fn(basis_features, alphas, vox_cell, vox_active):
        k, depth = spec.k, spec.depth
        xs, fc, mask_parts, occ_parts = [], [], [], []
        for d in range(depth):
            nc = spec.n_cells(d)
            cap = vox_cell[d].shape[0]
            a = jnp.where(vox_active[d][:, None],
                          alphas[d].reshape(cap, k), 0.0)
            dense = jnp.zeros((nc, k)).at[vox_cell[d]].add(a, mode="drop")
            xs.append(dense.reshape(nc * k // 128, 128))
            cb = basis_features[d].shape[-1]
            fd = jnp.zeros((nc, cb)).at[vox_cell[d]].add(
                jnp.where(vox_active[d][:, None], basis_features[d], 0.0),
                mode="drop")
            fc.append(LAT._corner_cat(fd.reshape(-1), spec, d, cb)
                      .astype(cdt))
            ad = jnp.zeros((nc,)).at[vox_cell[d]].add(
                vox_active[d].astype(jnp.float32), mode="drop")
            # any active corner -> the cell is inside this depth's support
            any_c = (LAT._corner_cat(ad, spec, d, 1) > 0).any(-1)
            mask_parts.append(any_c.astype(jnp.float32))
            occ_parts.append(ad)
        av0 = LAT._av0_cascade(spec, tuple(xs), cdt)
        # union-of-support mask over ALL depths (LayerField semantics,
        # fields/neural_field.py LayerField.evaluate_mask)
        mask0 = mask_parts[0]
        for d in range(1, depth):
            up = LAT._upsample_to_0(mask_parts[d][:, None], spec, d,
                                    tuple(int(0) for _ in range(3)))
            mask0 = jnp.maximum(mask0, up[:, 0])
        # extraction shell: union of adaptive-depth VOXEL occupancies
        # (the mesher's extraction lattice, host_mc semantics)
        shell0 = occ_parts[0]
        for d in range(1, spec.adaptive_depth):
            up = LAT._upsample_to_0(occ_parts[d][:, None], spec, d,
                                    tuple(int(0) for _ in range(3)))
            shell0 = jnp.maximum(shell0, up[:, 0])
        return LatticeEvalTables(av0=av0, fc=tuple(fc), mask0=mask0,
                                 shell0=shell0)
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _prepare_from_dense_fn(spec: LAT.LatticeSpec, cdt_str: str):
    """Table prep when the solve already returned its packed dense
    coefficient lattices (lattice_solve(return_dense=True)): skips the
    alphas re-scatter, building only the AV0 cascade, the corner feature
    tables, and the 1-wide activity masks.  (The feature tables are NOT
    reused from the solve: keeping them alive as solve outputs extended
    their ~2.6 GB lifetime across the CG loop and OOMed the bench-scale
    solve on v5e.)"""
    cdt = jnp.dtype(cdt_str)

    def fn(dense_xs, basis_features, vox_cell, vox_active):
        depth = spec.depth
        av0 = LAT._av0_cascade(spec, dense_xs, cdt)
        fc, mask_parts, occ_parts = [], [], []
        for d in range(depth):
            nc = spec.n_cells(d)
            cb = basis_features[d].shape[-1]
            fd = jnp.zeros((nc, cb)).at[vox_cell[d]].add(
                jnp.where(vox_active[d][:, None], basis_features[d], 0.0),
                mode="drop")
            fc.append(LAT._corner_cat(fd.reshape(-1), spec, d, cb)
                      .astype(cdt))
            ad = jnp.zeros((nc,)).at[vox_cell[d]].add(
                vox_active[d].astype(jnp.float32), mode="drop")
            any_c = (LAT._corner_cat(ad, spec, d, 1) > 0).any(-1)
            mask_parts.append(any_c.astype(jnp.float32))
            occ_parts.append(ad)
        mask0 = mask_parts[0]
        for d in range(1, depth):
            up = LAT._upsample_to_0(mask_parts[d][:, None], spec, d,
                                    tuple(int(0) for _ in range(3)))
            mask0 = jnp.maximum(mask0, up[:, 0])
        shell0 = occ_parts[0]
        for d in range(1, spec.adaptive_depth):
            up = LAT._upsample_to_0(occ_parts[d][:, None], spec, d,
                                    tuple(int(0) for _ in range(3)))
            shell0 = jnp.maximum(shell0, up[:, 0])
        return LatticeEvalTables(av0=av0, fc=tuple(fc), mask0=mask0,
                                 shell0=shell0)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _eval_fn(spec: LAT.LatticeSpec, voxel_size: float, grad: bool,
             approx_grad: bool, cap: int, chunk: int = 1 << 17):
    """Jitted evaluation of ``cap`` queries in ONE device program.

    Two measured facts shape this (scripts/measure_e2e_phases.py on the
    tunneled TPU):
      * per-dispatch round-trip cost dominates small batches — a
        71-dispatch loop over 9.2M corner queries spent ~100 s in
        transfer/dispatch latency for ~2 s of device math.  So the whole
        query wave is ONE jit call (one h2d, one d2h), chunked INSIDE
        the graph by ``lax.map``;
      * the integer cell ids are derived on device from x alone
        (elementwise shifts/compares) — no host passes, no index upload.
    """
    offs_np = LAT._corner_offsets()
    # largest divisor of cap <= the requested chunk: caps come from the
    # {2^k, 3*2^(k-2)} bucket family (_bucket_cap / lattice_mc._next_cap),
    # so a plain min() can leave cap % chunk != 0 (e.g. cap 3*2^16 with
    # the default 2^17 chunk — crashed the 3*2^k corner-count buckets)
    chunk = min(chunk, cap)
    while cap % chunk:
        chunk >>= 1
    assert cap % chunk == 0

    def fn(interp_params, tables: LatticeEvalTables, origins, x):
        from .support import InterpolatorFn
        depth, k = spec.depth, spec.k
        interp = InterpolatorFn(
            params={"params": interp_params},
            module=None)  # module unused by _interp_layers
        raw_layers = [LAT._interp_layers(interp, d) for d in range(depth)]
        layers8 = [LAT._blockdiag8(ls) for ls in raw_layers]
        tan_consts = [[jnp.tile(raw_layers[d][0][0][a], 8)
                       for a in range(3)] for d in range(depth)]
        offs = jnp.asarray(offs_np)
        w8 = 8 * k

        def chunk_fn(xc):
            # world depth-0 cell + per-depth dense flat ids (flat_cells
            # semantics: arithmetic >> nests exactly; out-of-bounds -> 0,
            # which reads the structurally-inactive margin)
            c0 = jnp.floor(xc / voxel_size).astype(jnp.int32)
            cells = []
            for d in range(depth):
                X, Y, Z = spec.dims[d]
                loc = (c0 >> d) - origins[d][None, :]
                ok = jnp.all((loc >= 0) & (loc < jnp.asarray([X, Y, Z])),
                             axis=-1)
                flat = (loc[:, 0] * Y + loc[:, 1]) * Z + loc[:, 2]
                cells.append(jnp.where(ok, flat, 0))
            flat0 = cells[0]

            avr = jnp.take(tables.av0, flat0, axis=0)      # (C, lanes)
            val = jnp.zeros((xc.shape[0],), jnp.float32)
            gout = jnp.zeros((xc.shape[0], 3), jnp.float32)
            for d in range(depth):
                vs_d = voxel_size * (2.0 ** d)
                cell_d = (c0 >> d).astype(jnp.float32)
                z0 = (xc / vs_d)[:, None, :] - cell_d[:, None, :] \
                    - offs[None]
                fcg = jnp.take(tables.fc[d], cells[d], axis=0)
                cb = fcg.shape[-1] // 8
                xin = jnp.concatenate([z0.astype(fcg.dtype),
                                       fcg.reshape(-1, 8, cb)],
                                      axis=-1).reshape(-1, 8 * (3 + cb))
                want_tan = grad and not approx_grad
                raw, draws = LAT._raw_blockdiag(
                    layers8[d], xin, tan_consts[d] if want_tan else [])
                w, dw = LAT._window_grad(z0)               # (C,8),(C,8,3)
                av_d = avr[:, d * w8:(d + 1) * w8].astype(jnp.float32)
                bw = raw.astype(jnp.float32) * jnp.repeat(w, k, axis=-1)
                val = val + jnp.sum(bw * av_d, axis=-1)
                if grad:
                    for a in range(3):
                        db = raw.astype(jnp.float32) \
                            * jnp.repeat(dw[..., a], k, axis=-1)
                        if want_tan:
                            db = db + draws[a].astype(jnp.float32) \
                                * jnp.repeat(w, k, axis=-1)
                        gout = gout.at[:, a].add(
                            jnp.sum(db * av_d, axis=-1) / vs_d)
            mask = jnp.take(tables.mask0, flat0) > 0
            if grad:
                return val, mask, gout
            return val, mask

        nb = cap // chunk
        outs = jax.lax.map(chunk_fn, x.reshape(nb, chunk, 3))
        return jax.tree_util.tree_map(
            lambda o: o.reshape((cap,) + o.shape[2:]), outs)
    return jax.jit(fn)


def _bucket_cap(n: int) -> int:
    """Smallest of {2^k, 3*2^(k-2)} >= n (>= 4096): pow2-family buckets
    bound the padding waste at 33% while keeping program reuse."""
    n = max(n, 1 << 12)
    k = int(np.ceil(np.log2(n)))
    for c in (3 << (k - 2), 1 << k):
        if c >= n and c % min(c, 1 << 17) == 0:
            return c
    return 1 << k


class LatticeEvalContext:
    """Carried by HostField when the field was solved on the lattice.

    Holds the plan-derived integer geometry (host numpy) and lazily
    prepares the device tables on first query."""

    def __init__(self, spec: LAT.LatticeSpec, origins: np.ndarray,
                 interp_params, basis_features, alphas,
                 vox_cell, vox_active, voxel_size: float,
                 approx_grad: bool, compute_dtype: str = "float32",
                 dense_xs=None):
        self.spec = spec
        self.origins = np.asarray(origins)
        self.interp_params = interp_params
        self.basis_features = basis_features
        self.alphas = alphas
        self.vox_cell = vox_cell
        self.vox_active = vox_active
        self.voxel_size = float(voxel_size)
        self.approx_grad = bool(approx_grad)
        self.compute_dtype = compute_dtype
        # packed dense coefficient lattices from
        # lattice_solve(return_dense=True), already in HBM
        self.dense_xs = dense_xs
        self._tables: Optional[LatticeEvalTables] = None

    def tables(self) -> LatticeEvalTables:
        if self._tables is None:
            if self.dense_xs is not None:
                self._tables = _prepare_from_dense_fn(
                    self.spec, self.compute_dtype)(
                    self.dense_xs, self.basis_features,
                    self.vox_cell, self.vox_active)
            else:
                self._tables = _prepare_fn(self.spec, self.compute_dtype)(
                    self.basis_features, self.alphas,
                    self.vox_cell, self.vox_active)
        return self._tables

    def eval_batched(self, x: np.ndarray, grad: bool = False,
                     batch: Optional[int] = None,
                     max_chunk: Optional[int] = None):
        """values (n,), mask (n,) [, grads (n,3)] for all n queries.

        The whole wave runs as ONE jit dispatch (one h2d / one d2h),
        pow2-bucketed in total size for program reuse, with lax.map
        chunking inside the graph (see _eval_fn).  ``batch`` overrides
        the bucket cap (mainly for tests); ``max_chunk`` lowers the
        in-graph chunk size (the ``max_points`` memory knob of
        ``extract_dual_mesh``, reference models/nksr_net.py:284)."""
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        cap = batch or _bucket_cap(n)
        tables = self.tables()
        chunk = 1 << 17
        if max_chunk is not None:
            # largest power of two <= max_chunk that divides the cap
            c = 1 << max(int(np.log2(max(int(max_chunk), 1))), 0)
            while cap % c:
                c >>= 1
            chunk = max(min(chunk, c), 1)
        fn = _eval_fn(self.spec, self.voxel_size, grad,
                      self.approx_grad, cap, chunk=chunk)
        origins = jnp.asarray(self.origins.astype(np.int32))
        pad = cap - n
        xp = np.pad(x, ((0, pad), (0, 0))) if pad else x
        out = fn(self.interp_params, tables, origins, jnp.asarray(xp))
        vals = np.asarray(out[0])[:n]
        mask = np.asarray(out[1])[:n]
        if grad:
            return vals, mask, np.asarray(out[2])[:n]
        return vals, mask
