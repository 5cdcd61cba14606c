"""Whole-pipeline HLO-level trace at bench scale: reconstruct (2 CG
iters to expose the fixed phase) + extract_dual_mesh, profiled with the
JAX profiler; prints per-XLA-module totals and the top ops inside each.

Usage: python scripts/profile_e2e_trace.py [n_points] [iters]
"""

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_dir = "/tmp/e2e_trace"
    import jax
    from bench import synthetic_scene
    from nksr_tpu import Reconstructor
    from nksr_tpu.utils.profiling import drain

    xyz, nrm = synthetic_scene(n)
    recon = Reconstructor()
    kw = dict(detail_level=None, voxel_size=0.1, solver_tol=1e-12,
              solver_max_iters=iters, structure="splat")
    t0 = time.time()
    f = recon.reconstruct(xyz, nrm, **kw)
    m = f.extract_dual_mesh(mise_iter=1)
    print(f"compile pass {time.time()-t0:.1f}s "
          f"({m.v.shape[0]} verts)", flush=True)
    f = m = None

    with jax.profiler.trace(out_dir):
        t0 = time.time()
        f = recon.reconstruct(xyz, nrm, **kw)
        drain(f.alpha)
        t1 = time.time()
        m = f.extract_dual_mesh(mise_iter=1)
        t2 = time.time()
    print(f"steady: reconstruct {t1-t0:.2f}s mesh {t2-t1:.2f}s "
          f"({m.v.shape[0]} verts)", flush=True)

    fl = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                          recursive=True))
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(fl[-1], "rb").read())
    mods = []           # (start, dur, name)
    opev = []           # (start, dur, opname)
    for pl in pd.planes:
        if "TPU" not in pl.name:
            continue
        for ln in pl.lines:
            if ln.name == "XLA Modules":
                for e in ln.events:
                    mods.append((e.start_ns, e.duration_ns,
                                 e.name.split("(")[0]))
            elif ln.name == "XLA Ops":
                for e in ln.events:
                    mm = re.match(r"%(\S+?)(?:\.\d+)? = ", e.name)
                    key = mm.group(1) if mm else e.name[:40]
                    opev.append((e.start_ns, e.duration_ns, key))
    mods.sort()
    print(f"\n{len(mods)} module executions:")
    for s, d, name in mods:
        if d < 3e6:
            continue
        print(f"  {d/1e6:9.1f} ms  {name}")
        # top ops inside this module window
        inside = {}
        for es, ed, k in opev:
            if s <= es < s + d:
                inside[k] = inside.get(k, 0.0) + ed
        for k, v in sorted(inside.items(), key=lambda kv: -kv[1])[:10]:
            print(f"      {v/1e6:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
