"""Reconstruction benchmark (runs on the real TPU chip): honest
points -> mesh, mirroring the reference claim being chased
("reconstructing millions of points in a few seconds" on an RTX 3090,
/root/reference/README.md:20; the user-visible recipe is
reconstruct + extract_dual_mesh(mise_iter=1),
/root/reference/examples/recons_simple.py:25-30).

Baseline: 300k points/s end-to-end (1M pts in ~3.3 s).

Primary metric: end-to-end points->mesh throughput on the splat
structure (full surface shell — the representative workload that does
not depend on training state).  The JSON line also reports the
reconstruct-only split and, when a trained checkpoint is present
(runs/synth_tpu/best.ckpt or NKSR_BENCH_CKPT), the predicted-structure
path timing (the reference's default inference route).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pts/s", "vs_baseline": N, ...}
"""

import json
import os
import time

import numpy as np

BASELINE_PTS_PER_S = 3.0e5


def synthetic_scene(n: int, seed: int = 0, half_extent: float = 20.0):
    """A wavy terrain patch with analytic normals — scene-like input."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-half_extent, half_extent, size=(n, 2)) \
        .astype(np.float32)
    h = (np.sin(0.3 * xy[:, 0]) * np.cos(0.25 * xy[:, 1])
         + 0.3 * np.sin(1.1 * xy[:, 0] + 0.7 * xy[:, 1]))
    xyz = np.concatenate([xy, h[:, None].astype(np.float32)], 1)
    dx = 0.3 * np.cos(0.3 * xy[:, 0]) * np.cos(0.25 * xy[:, 1]) \
        + 0.33 * np.cos(1.1 * xy[:, 0] + 0.7 * xy[:, 1])
    dy = -0.25 * np.sin(0.3 * xy[:, 0]) * np.sin(0.25 * xy[:, 1]) \
        + 0.21 * np.cos(1.1 * xy[:, 0] + 0.7 * xy[:, 1])
    nrm = np.stack([-dx, -dy, np.ones(n, np.float32)], 1)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return xyz, nrm.astype(np.float32)


def _time_once(recon, xyz, nrm, drain, structure, **kw):
    """One full points->mesh pass; returns (t_recon, t_mesh, mesh)."""
    t0 = time.perf_counter()
    f = recon.reconstruct(xyz, nrm, structure=structure, **kw)
    drain(f.alpha)
    t1 = time.perf_counter()
    m = f.extract_dual_mesh(mise_iter=1)
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1, m


def main():
    n = int(os.environ.get("NKSR_BENCH_N", 1_000_000))
    from nksr_tpu import Reconstructor
    from nksr_tpu.utils.profiling import drain

    # engines (dense conv3d UNet, Pallas cascade, dense dual-MC) resolve
    # to their fast defaults on their own — the bench sets NO env vars,
    # so a Reconstructor().reconstruct() user gets the benched path
    xyz, nrm = synthetic_scene(n)
    from nksr_tpu.models.pipeline import PipelineConfig
    # bf16 UNet convs (f32 accumulation) — MXU-native inference config
    recon = Reconstructor(config=PipelineConfig(conv_dtype="bfloat16"))

    # 16 CG iterations reach the surface-error floor of the primal
    # formulation (scripts/compare_formulations.py: vert err 0.0051 at
    # 16 iters vs 0.0049 fully converged, 5% of the voxel size); the
    # rel-residual tol is kept as the reference-compatible early exit
    kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-4,
              solver_max_iters=16)

    # warmup (compile).  NOTE: the barrier is a tiny device-to-host fetch
    # (utils.profiling.drain) — jax.block_until_ready does NOT wait for
    # execution on tunneled TPU platforms and would report dispatch time.
    # The previous field must be dropped BEFORE re-reconstructing: its
    # evaluator tables (~4 GB HBM at this scale) would otherwise stay
    # live across the next solve.
    err = None
    try:
        _time_once(recon, xyz, nrm, drain, "splat", **kw)
    except Exception as e:
        # dense-UNet path failed (e.g. HBM pressure on a different chip
        # generation): fall back to the sparse-UNet config so the bench
        # always reports a number.  The retry must run OUTSIDE this
        # except block: the exception's traceback pins the failed
        # attempt's device buffers, which kept HBM full during the
        # retry (observed double-OOM).
        err = str(e)[:400]
    if err is not None:
        import gc
        import sys
        print(f"[bench] dense-UNet path failed, falling back: {err}",
              file=sys.stderr, flush=True)
        os.environ["NKSR_DENSE_UNET"] = "0"
        gc.collect()
        _time_once(recon, xyz, nrm, drain, "splat", **kw)

    reps = int(os.environ.get("NKSR_BENCH_REPS", 2))
    t_rec, t_mesh, n_verts = [], [], 0
    for _ in range(reps):
        tr, tm, m = _time_once(recon, xyz, nrm, drain, "splat", **kw)
        t_rec.append(tr)
        t_mesh.append(tm)
        n_verts = int(m.v.shape[0])
        m = None
    tr = min(t_rec)
    tm = min(t_mesh)
    total = tr + tm

    extra = {"unet": getattr(recon, "_last_unet_engine", "unknown")}
    if err is not None:
        # make cross-round comparisons self-describing: a fallback lap
        # measures the sparse-UNet engine, not the headline dense path
        extra["fallback"] = True
        extra["fallback_error"] = err[:200]

    # adaptive structure (the reference's normal-variation builder,
    # models/nksr_net.py:175-179): one warmed lap — the terrain is
    # everywhere-curved so the hierarchy stays near-full; the row mainly
    # proves the route is benched, not a different speed class
    if os.environ.get("NKSR_BENCH_ADAPTIVE", "1") == "1":
        try:
            _time_once(recon, xyz, nrm, drain, "adaptive", **kw)  # compile
            tr_a, tm_a, ma = _time_once(recon, xyz, nrm, drain,
                                        "adaptive", **kw)
            extra["adaptive_pts_per_s"] = round(n / (tr_a + tm_a), 1)
            extra["adaptive_reconstruct_s"] = round(tr_a, 2)
            extra["adaptive_mesh_s"] = round(tm_a, 2)
            extra["adaptive_mesh_verts"] = int(ma.v.shape[0])
            ma = None
        except Exception as e:
            extra["adaptive_error"] = str(e)[:200]

    # ---- predicted route at FULL bench scale (the reference's default
    # inference workload, examples/recons_waymo.py:30-37): the scene
    # checkpoint is trained at the bench operating point (voxel 0.1,
    # configs/synth/train_scene.yaml) so the structure prediction is
    # meaningful on the bench terrain
    scene_ckpt = os.environ.get("NKSR_BENCH_SCENE_CKPT")
    if scene_ckpt is None:
        # newest scene-trained checkpoint wins: the round-5
        # reference-capacity run (f_maps 32 + UDF head) ahead of the
        # round-4 f_maps-16 run
        for cand in ("runs/scene_big/best.ckpt", "runs/scene_big/last.ckpt",
                     "runs/scene_tpu/best.ckpt", "runs/scene_tpu/last.ckpt"):
            if os.path.exists(cand):
                scene_ckpt = cand
                break
    if scene_ckpt and os.path.exists(scene_ckpt):
        try:
            import jax
            from nksr_tpu.train import driver, loop as T
            from nksr_tpu.utils import checkpoint as CKPT
            from nksr_tpu.utils.config import load_config
            rcfg = load_config(os.path.join(os.path.dirname(scene_ckpt),
                                            "config.yaml"))
            pcfg_s = driver.pipeline_config_from_yaml(rcfg)
            import dataclasses
            pcfg_s = dataclasses.replace(pcfg_s, conv_dtype="bfloat16")
            st = T.init_state(pcfg_s, T.TrainConfig(),
                              jax.random.PRNGKey(0))
            st = CKPT.load_params(scene_ckpt, st)
            rp = Reconstructor(config=pcfg_s, params=st.params)
            sst = os.stat(scene_ckpt)
            extra["scene_ckpt"] = scene_ckpt
            extra["scene_ckpt_mtime"] = int(sst.st_mtime)
            # same discipline as the splat headline: one warmup pass
            # (compiles) then >=2 timed steady laps — min() over a set
            # that includes the compile lap effectively measured ONE
            # steady lap (round-4 verdict: the driver-captured number
            # was half the steady-state claim)
            reps_p = []
            for i in range(3):
                t0 = time.perf_counter()
                fp = rp.reconstruct(xyz, nrm, structure="predicted", **kw)
                drain(fp.alpha)
                t1 = time.perf_counter()
                mp = fp.extract_dual_mesh(mise_iter=1)
                if i > 0:   # lap 0 is the compile warmup
                    reps_p.append((t1 - t0, time.perf_counter() - t1))
                extra["predicted_mesh_verts"] = int(mp.v.shape[0])
                fp = mp = None
            tr_p = min(r[0] for r in reps_p)
            tm_p = min(r[1] for r in reps_p)
            extra["predicted_pts_per_s"] = round(n / (tr_p + tm_p), 1)
            extra["predicted_n"] = n
            extra["predicted_reconstruct_s"] = round(tr_p, 2)
            extra["predicted_mesh_s"] = round(tm_p, 2)
        except Exception as e:   # never fail the bench over the extra
            extra["predicted_error"] = str(e)[:200]

    ckpt = os.environ.get("NKSR_BENCH_CKPT")
    if ckpt is None:   # newest committed checkpoint wins
        for cand in ("runs/synth_r3c/best.ckpt", "runs/synth_r3c/last.ckpt",
                     "runs/synth_tpu/last.ckpt"):
            if os.path.exists(cand):
                ckpt = cand
                break
        else:
            ckpt = "runs/synth_tpu/last.ckpt"
    if "predicted_pts_per_s" not in extra and os.path.exists(ckpt):
        # predicted-structure path (the reference default) with trained
        # weights, AT THE CHECKPOINT'S OWN OPERATING POINT: its trained
        # voxel size (runs/synth_tpu/config.yaml), on a terrain patch
        # dense enough for that resolution
        st = os.stat(ckpt)
        extra["ckpt"] = ckpt            # weight provenance: results from
        extra["ckpt_mtime"] = int(st.st_mtime)  # different workspaces
        extra["ckpt_bytes"] = st.st_size        # must be comparable
        try:
            import jax
            from nksr_tpu.train import driver, loop as T
            from nksr_tpu.utils import checkpoint as CKPT
            from nksr_tpu.utils.config import load_config
            # the checkpoint's own architecture (tree_depth etc. differ
            # from the bench config)
            rcfg_path = os.path.join(os.path.dirname(ckpt), "config.yaml")
            rcfg = load_config(rcfg_path)
            pcfg = driver.pipeline_config_from_yaml(rcfg)
            state = T.init_state(pcfg, T.TrainConfig(),
                                 jax.random.PRNGKey(0))
            state = CKPT.load_params(ckpt, state)
            rp = Reconstructor(config=pcfg, params=state.params)
            np_ = min(n, 250_000)
            xp_, nrm_p = synthetic_scene(np_, seed=1, half_extent=5.0)
            kwp = dict(detail_level=None,
                       voxel_size=float(rcfg["voxel_size"]),
                       solver_tol=1e-4, solver_max_iters=16)
            reps_p = []
            for i in range(3):   # lap 0 is the compile warmup
                t0 = time.perf_counter()
                fp = rp.reconstruct(xp_, nrm_p, structure="predicted",
                                    **kwp)
                drain(fp.alpha)
                mp = fp.extract_dual_mesh(mise_iter=1)
                if i > 0:
                    reps_p.append(time.perf_counter() - t0)
                extra["predicted_mesh_verts"] = int(mp.v.shape[0])
                fp = mp = None
            extra["predicted_pts_per_s"] = round(np_ / min(reps_p), 1)
            extra["predicted_n"] = np_
        except Exception as e:   # never fail the bench over the extra
            extra["predicted_error"] = str(e)[:120]

    pts_per_s = n / total
    print(json.dumps({
        "metric": "points_to_mesh_1m_scene_throughput",
        "value": round(pts_per_s, 1),
        "unit": "pts/s",
        "vs_baseline": round(pts_per_s / BASELINE_PTS_PER_S, 3),
        "reconstruct_s": round(tr, 2),
        "extract_mesh_s": round(tm, 2),
        "mesh_verts": n_verts,
        "reconstruct_only_pts_per_s": round(n / tr, 1),
        **extra,
    }))


if __name__ == "__main__":
    main()
