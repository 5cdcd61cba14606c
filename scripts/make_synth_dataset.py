"""Generate a tiny synthetic ShapeNet/ONet-format dataset (spheres,
boxes, tori) for harness smoke tests and sandbox training runs."""

import os
import sys
from pathlib import Path

import numpy as np


def sdf_shape(kind, p, r):
    if kind == "sphere":
        return np.linalg.norm(p, axis=-1) - r
    if kind == "box":
        q = np.abs(p) - r
        return (np.linalg.norm(np.maximum(q, 0), axis=-1)
                + np.minimum(q.max(-1), 0))
    if kind == "torus":
        xy = np.linalg.norm(p[..., :2], axis=-1) - r
        return np.sqrt(xy ** 2 + p[..., 2] ** 2) - 0.35 * r


def surface_points(kind, r, n, rng):
    # rejection-project: sample near surface, project via SDF gradient
    p = rng.uniform(-0.55, 0.55, (n * 4, 3)).astype(np.float32)
    eps = 1e-3
    d = sdf_shape(kind, p, r)
    g = np.stack([(sdf_shape(kind, p + eps * np.eye(3)[a], r) - d) / eps
                  for a in range(3)], -1)
    g /= np.linalg.norm(g, axis=-1, keepdims=True) + 1e-9
    p = p - d[:, None] * g
    d2 = sdf_shape(kind, p, r)
    keep = np.abs(d2) < 1e-3
    p, g = p[keep][:n], g[keep][:n]
    return p.astype(np.float32), g.astype(np.float32)


def main(root, n_shapes=6, n_pts=20000, seed=0):
    rng = np.random.default_rng(seed)
    root = Path(root)
    kinds = ["sphere", "box", "torus"]
    cat = root / "synth"
    cat.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n_shapes):
        kind = kinds[i % 3]
        r = float(rng.uniform(0.3, 0.45))
        pts, nrm = surface_points(kind, r, n_pts, rng)
        d = cat / f"{kind}_{i:03d}"
        d.mkdir(exist_ok=True)
        np.savez(d / "pointcloud.npz", points=pts, normals=nrm)
        q = rng.uniform(-0.55, 0.55, (4096, 3)).astype(np.float32)
        occ = (sdf_shape(kind, q, r) < 0).astype(np.uint8)
        np.savez(d / "points.npz", points=q,
                 occupancies=np.packbits(occ))
        names.append(d.name)
    for split, sl in [("train", slice(0, max(n_shapes - 2, 1))),
                      ("val", slice(max(n_shapes - 2, 1), n_shapes)),
                      ("test", slice(max(n_shapes - 2, 1), n_shapes))]:
        (cat / f"{split}.lst").write_text("\n".join(names[sl]) + "\n")
    print(f"wrote {n_shapes} shapes under {cat}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "data/synth",
         *(int(a) for a in sys.argv[2:]))
