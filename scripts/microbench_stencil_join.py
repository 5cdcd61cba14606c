"""Microbenchmark stencil_join at bench shapes (2M keys x 27 offsets).

Usage: env -u PYTHONPATH python scripts/microbench_stencil_join.py
(no jax import needed)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from nksr_tpu.core import host_build as HB
    from nksr_tpu.ops.gather_scatter import stencil_offsets
    from nksr_tpu import native as NAT

    rng = np.random.default_rng(0)
    # clustered voxel keys like a real scene: ~2M surface voxels
    n = 2_000_000
    xy = rng.uniform(-200, 200, (n, 2))
    z = 10 * np.sin(0.1 * xy[:, 0]) * np.cos(0.07 * xy[:, 1])
    coords = np.round(np.concatenate([xy, z[:, None]], 1)).astype(np.int64)
    keys = np.unique(HB.pack64(coords))
    print(f"unique keys: {len(keys)}")

    offs = stencil_offsets(3).astype(np.int64)
    deltas = np.array([HB._offset_delta(o) for o in offs], np.int64)

    for fn_name in ("stencil_join", "stencil_join_cols"):
        fn = getattr(NAT, fn_name, None)
        if fn is None:
            print(f"{fn_name}: absent")
            continue
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(keys, keys, deltas, cap=len(keys))
            t.append(time.perf_counter() - t0)
        per = min(t) / (len(keys) * len(deltas)) * 1e9
        print(f"{fn_name}: {min(t):.3f}s  ({per:.1f} ns/entry)  "
              f"hits={np.count_nonzero(out >= 0)}")
        if fn_name == "stencil_join":
            ref = out
        else:
            assert np.array_equal(ref, out), "column variant mismatch"
            print("column variant matches row variant")


if __name__ == "__main__":
    main()
