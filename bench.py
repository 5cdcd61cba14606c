"""Reconstruction throughput benchmark (runs on the real TPU chip).

Baseline: the reference advertises "millions of points in a few seconds"
on an RTX 3090 (/root/reference/README.md:20, BASELINE.md) — we take
300k points/s end-to-end (1M pts in ~3.3 s) as the reference number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pts/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PTS_PER_S = 3.0e5


def synthetic_scene(n: int, seed: int = 0):
    """A wavy terrain patch with analytic normals — scene-like input."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-20.0, 20.0, size=(n, 2)).astype(np.float32)
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


def main():
    n = int(os.environ.get("NKSR_BENCH_N", 1_000_000))
    from nksr_tpu import Reconstructor
    from nksr_tpu.utils.profiling import drain

    xyz, nrm = synthetic_scene(n)
    from nksr_tpu.models.pipeline import PipelineConfig
    # bf16 UNet convs (f32 accumulation) — MXU-native inference config
    recon = Reconstructor(config=PipelineConfig(conv_dtype="bfloat16"))

    # structure='splat' keeps the full surface shell active — the
    # representative (worst-case) workload independent of training state
    kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-4,
              solver_max_iters=32, structure="splat")

    # warmup (compile).  NOTE: the barrier is a tiny device-to-host fetch
    # (utils.profiling.drain) — jax.block_until_ready does NOT wait for
    # execution on tunneled TPU platforms and would report dispatch time.
    f = recon.reconstruct(xyz, nrm, **kw)
    drain(f.alpha)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        f = recon.reconstruct(xyz, nrm, **kw)
        drain(f.alpha)
    dt = (time.perf_counter() - t0) / reps

    pts_per_s = n / dt
    print(json.dumps({
        "metric": "reconstruct_1m_scene_throughput",
        "value": round(pts_per_s, 1),
        "unit": "pts/s",
        "vs_baseline": round(pts_per_s / BASELINE_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
