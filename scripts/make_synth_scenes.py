"""Generate a synthetic SCENE-scale corpus (terrain patches) in the
ONet/ShapeNet layout, for training the predicted-structure route at the
benchmark operating point (voxel 0.1, open wavy terrain — the same
surface family bench.py's 1M-point scene draws from, different
parameters per item).

Each item: a wavy height-field patch over [0,S]x[0,S] with analytic
normals (pointcloud.npz) and uniform occupancy samples z<h(x,y)
(points.npz).  Mirrors the reference's object/scene data mixing intent
(/root/reference/dataset/shapenet.py:73-135 format;
README.md "from objects to kilometer-scale scenes").

Usage: python scripts/make_synth_scenes.py [root] [n_items] [n_pts] [S]
"""

import sys
from pathlib import Path

import numpy as np


def terrain(rng):
    """Random height-field params; returns h(x, y) and its gradient."""
    a1 = rng.uniform(0.6, 1.4)
    f1x = rng.uniform(0.2, 0.45)
    f1y = rng.uniform(0.2, 0.45)
    a2 = rng.uniform(0.15, 0.45)
    f2x = rng.uniform(0.8, 1.4)
    f2y = rng.uniform(0.5, 1.0)
    p1 = rng.uniform(0, 2 * np.pi, 2)
    p2 = rng.uniform(0, 2 * np.pi)

    def h(x, y):
        return (a1 * np.sin(f1x * x + p1[0]) * np.cos(f1y * y + p1[1])
                + a2 * np.sin(f2x * x + f2y * y + p2))

    def grad(x, y):
        dx = (a1 * f1x * np.cos(f1x * x + p1[0]) * np.cos(f1y * y + p1[1])
              + a2 * f2x * np.cos(f2x * x + f2y * y + p2))
        dy = (-a1 * f1y * np.sin(f1x * x + p1[0]) * np.sin(f1y * y + p1[1])
              + a2 * f2y * np.cos(f2x * x + f2y * y + p2))
        return dx, dy

    return h, grad


def main(root="data/synth_scene", n_items=48, n_pts=30000, S=5.0):
    rng = np.random.default_rng(7)
    root = Path(root)
    cat = root / "terrain"
    cat.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n_items):
        h, grad = terrain(rng)
        xy = rng.uniform(0, S, size=(n_pts, 2)).astype(np.float32)
        z = h(xy[:, 0], xy[:, 1])
        pts = np.concatenate([xy, z[:, None].astype(np.float32)], 1)
        dx, dy = grad(xy[:, 0], xy[:, 1])
        nrm = np.stack([-dx, -dy, np.ones(n_pts)], 1)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        d = cat / f"terrain_{i:03d}"
        d.mkdir(exist_ok=True)
        np.savez(d / "pointcloud.npz", points=pts.astype(np.float32),
                 normals=nrm.astype(np.float32))
        # occupancy: below the height field, sampled in the z band the
        # surface actually occupies (+/- margin)
        q = np.empty((4096, 3), np.float32)
        q[:, :2] = rng.uniform(0, S, size=(4096, 2))
        q[:, 2] = rng.uniform(z.min() - 0.5, z.max() + 0.5, size=4096)
        occ = (q[:, 2] < h(q[:, 0], q[:, 1])).astype(np.uint8)
        np.savez(d / "points.npz", points=q, occupancies=np.packbits(occ))
        names.append(d.name)
        if (i + 1) % 16 == 0:
            print(f"  {i + 1}/{n_items}", flush=True)
    n_val = max(n_items // 8, 1)
    for split, sl in [("train", slice(0, n_items - 2 * n_val)),
                      ("val", slice(n_items - 2 * n_val, n_items - n_val)),
                      ("test", slice(n_items - n_val, n_items))]:
        (cat / f"{split}.lst").write_text("\n".join(names[sl]) + "\n")
    print(f"wrote {n_items} terrain patches under {cat}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "data/synth_scene",
         *(int(a) for a in args[1:3]),
         *([float(args[3])] if len(args) > 3 else []))
