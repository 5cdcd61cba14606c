"""Stage-level timing of the dense conv3d UNet at bench scale.

Builds the real lattice plan for the bench scene, then times on device:
  (a) the full dense_unet_apply;
  (b) encoder point-splat only;
  (c) conv stack only (splat output fed as a constant).

Usage: python scripts/measure_dense_unet.py [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def drain_time(fn, *args, reps=3):
    from nksr_tpu.utils.profiling import drain
    out = fn(*args)
    drain(jax_first_leaf(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        drain(jax_first_leaf(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def jax_first_leaf(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)[0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import jax
    import jax.numpy as jnp
    from bench import synthetic_scene
    from nksr_tpu.models.pipeline import PipelineConfig, init_params
    from nksr_tpu.core import host_build as HB
    from nksr_tpu.fields.lattice import plan_lattice
    from nksr_tpu.models import dense_unet as DU

    xyz, nrm = synthetic_scene(n)
    cfg = PipelineConfig(conv_dtype="bfloat16", voxel_size=0.1)
    params = init_params(cfg, jax.random.PRNGKey(0))

    grids, orders = HB.build_splat_grids_ex(xyz, cfg.voxel_size,
                                            cfg.tree_depth)
    caps = tuple(max(1 << int(np.ceil(np.log2(len(g.keys) * 1.05))), 512)
                 for g in grids)
    plan = plan_lattice(grids, caps, xyz, orders[0][0], orders[0][1],
                        cfg.voxel_size, cfg.tree_depth, cfg.adaptive_depth,
                        k=cfg.kernel_dim)
    spec = plan.spec
    print("dims", spec.dims[0], "cells0", spec.n_cells(0), flush=True)
    dt = DU.build_tables(spec, plan.origins, grids, caps, grids, caps)
    origins = jnp.asarray(plan.origins.astype(np.int32))
    cap_pts = 1 << int(np.ceil(np.log2(n)))
    xyz_p = jnp.asarray(np.pad(xyz, ((0, cap_pts - n), (0, 0))))
    feat = jnp.asarray(np.pad(nrm, ((0, cap_pts - n), (0, 0))))
    mask = jnp.asarray(np.arange(cap_pts) < n)

    full = jax.jit(lambda p, o, x, f, m: DU.dense_unet_apply(
        cfg, p, spec, o, dt, x, f, m))
    t = drain_time(full, params, origins, xyz_p, feat, mask)
    print(f"full dense_unet_apply: {t*1e3:.0f} ms", flush=True)

    # encoder splat alone (copy of the splat block)
    def splat(x, f, m):
        voxel_size = cfg.voxel_size
        g = x / voxel_size
        base = jnp.floor(g).astype(jnp.int32)
        frac = g - base.astype(jnp.float32)
        offs = jnp.asarray(np.stack(np.meshgrid(*([np.arange(2)] * 3),
                                                indexing="ij"),
                                    -1).reshape(8, 3), jnp.int32)
        corner = base[:, None, :] + offs[None]
        w = jnp.prod(jnp.where(offs[None].astype(bool), frac[:, None, :],
                               1.0 - frac[:, None, :]), axis=-1)
        X, Y, Z = spec.dims[0]
        loc = corner - origins[0][None, None, :]
        ok = jnp.all((loc >= 0) & (loc < jnp.asarray([X, Y, Z])), axis=-1)
        cid = (loc[..., 0] * Y + loc[..., 1]) * Z + loc[..., 2]
        cid = jnp.where(ok, cid, spec.n_cells(0))
        wm = jnp.where(m[:, None], w, 0.0)
        offset = (x[:, None, :]
                  - corner.astype(jnp.float32) * voxel_size) / voxel_size
        raw = jnp.concatenate([
            jnp.broadcast_to(f[:, None, :], (x.shape[0], 8, f.shape[-1])),
            offset], -1)
        nc0 = spec.n_cells(0)
        acc = jnp.zeros((nc0 + 1, raw.shape[-1])).at[cid.reshape(-1)].add(
            (raw * wm[..., None]).reshape(-1, raw.shape[-1]), mode="drop")
        wsum = jnp.zeros((nc0 + 1,)).at[cid.reshape(-1)].add(
            wm.reshape(-1), mode="drop")
        return acc, wsum

    t = drain_time(jax.jit(splat), xyz_p, feat, mask)
    print(f"encoder splat scatters: {t*1e3:.0f} ms", flush=True)

    # conv stack only: start from a fixed depth-0 feature field
    f0 = jnp.zeros((spec.n_cells(0), cfg.f_maps), jnp.float32)

    def convs(p, f0):
        occ = []
        for d in range(spec.depth):
            mm = jnp.zeros((spec.n_cells(d),), bool).at[
                dt.enc_cell[d]].max(dt.enc_active[d], mode="drop")
            occ.append(mm)
        up = p["params"]["unet"]
        cdt = jnp.dtype(cfg.conv_dtype)
        f = f0
        enc_feats = []
        for d in range(spec.depth):
            f = DU._conv_block(up[f"enc_{d}"], f, occ[d], spec.dims[d], cdt)
            enc_feats.append(f)
            if d < spec.depth - 1:
                f = DU._down(f, up[f"down_{d}"], up[f"down_b_{d}"],
                             spec.dims[d], spec.dims[d + 1], cdt)
        g = enc_feats[-1]
        for d in range(spec.depth - 1, -1, -1):
            g = DU._conv_block(up[f"dec_{d}"], g, occ[d], spec.dims[d], cdt)
            if d > 0:
                h = DU._up(g, up[f"up_{d}"], spec.dims[d], spec.dims[d - 1],
                           cdt)
                g = jnp.where(occ[d - 1][:, None], h + enc_feats[d - 1], 0.0)
        return g

    t = drain_time(jax.jit(convs), params, f0)
    print(f"conv stack (enc+dec, all depths): {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
