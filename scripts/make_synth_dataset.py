"""Generate a synthetic ShapeNet/ONet-format dataset for harness smoke
tests and sandbox training runs (no external data in this environment).

Shapes are randomly rotated/offset primitives and 2-primitive unions
(sphere, box, torus, ellipsoid, capsule) with analytic SDFs; each item
gets an oriented surface cloud (pointcloud.npz) and uniform occupancy
samples (points.npz), matching the ONet layout the ShapeNet dataset
class reads (/root/reference/dataset/shapenet.py:73-135 format).
"""

import sys
from pathlib import Path

import numpy as np

KINDS = ["sphere", "box", "torus", "ellipsoid", "capsule", "union"]


def _rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def sdf_primitive(kind, p, prm):
    if kind == "sphere":
        return np.linalg.norm(p, axis=-1) - prm["r"]
    if kind == "box":
        q = np.abs(p) - prm["half"]
        return (np.linalg.norm(np.maximum(q, 0), axis=-1)
                + np.minimum(q.max(-1), 0))
    if kind == "torus":
        xy = np.linalg.norm(p[..., :2], axis=-1) - prm["r"]
        return np.sqrt(xy ** 2 + p[..., 2] ** 2) - prm["r2"]
    if kind == "ellipsoid":
        # exact-enough SDF via scaled-space normalization
        k0 = np.linalg.norm(p / prm["abc"], axis=-1)
        k1 = np.linalg.norm(p / prm["abc"] ** 2, axis=-1)
        return k0 * (k0 - 1.0) / (k1 + 1e-12)
    if kind == "capsule":
        h = prm["h"]
        pz = np.clip(p[..., 2], -h, h)
        q = p.copy()
        q[..., 2] -= pz
        return np.linalg.norm(q, axis=-1) - prm["r"]
    raise ValueError(kind)


class Shape:
    """One or two posed primitives, combined by union."""

    def __init__(self, rng, allow_union=True):
        kind = KINDS[rng.integers(0, len(KINDS))]
        if kind == "union" and allow_union:
            self.parts = [Shape(rng, False), Shape(rng, False)]
            self.kind = "union"
            return
        self.parts = None
        self.kind = kind if kind != "union" else "sphere"
        self.R = _rot(rng)
        self.t = rng.uniform(-0.12, 0.12, 3)
        r = float(rng.uniform(0.22, 0.4))
        self.prm = {
            "r": r, "r2": 0.35 * r,
            "half": rng.uniform(0.18, 0.38, 3),
            "abc": rng.uniform(0.2, 0.42, 3),
            "h": float(rng.uniform(0.1, 0.3)),
        }

    def sdf(self, p):
        if self.parts is not None:
            return np.minimum(self.parts[0].sdf(p), self.parts[1].sdf(p))
        q = (p - self.t) @ self.R.T
        return sdf_primitive(self.kind, q, self.prm)

    def name(self):
        if self.parts is not None:
            return "union"
        return self.kind


def surface_points(shape, n, rng):
    """Sample near-surface, project along the numeric SDF gradient."""
    pts, nrms = [], []
    eps = 1e-3
    eye = np.eye(3)
    while sum(len(p) for p in pts) < n:
        p = rng.uniform(-0.62, 0.62, (n * 4, 3))
        d = shape.sdf(p)
        p = p[np.abs(d) < 0.2]
        for _ in range(4):   # a few Newton projections
            d = shape.sdf(p)
            g = np.stack([(shape.sdf(p + eps * eye[a]) - d) / eps
                          for a in range(3)], -1)
            g /= np.linalg.norm(g, axis=-1, keepdims=True) + 1e-9
            p = p - d[:, None] * g
        d = shape.sdf(p)
        keep = np.abs(d) < 2e-4
        p, g = p[keep], g[keep]
        pts.append(p)
        nrms.append(g)
    p = np.concatenate(pts)[:n]
    g = np.concatenate(nrms)[:n]
    return p.astype(np.float32), g.astype(np.float32)


def main(root, n_shapes=6, n_pts=20000, seed=0):
    rng = np.random.default_rng(seed)
    root = Path(root)
    cat = root / "synth"
    cat.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n_shapes):
        shape = Shape(rng)
        pts, nrm = surface_points(shape, n_pts, rng)
        d = cat / f"{shape.name()}_{i:03d}"
        d.mkdir(exist_ok=True)
        np.savez(d / "pointcloud.npz", points=pts, normals=nrm)
        q = rng.uniform(-0.62, 0.62, (4096, 3)).astype(np.float32)
        occ = (shape.sdf(q) < 0).astype(np.uint8)
        np.savez(d / "points.npz", points=q,
                 occupancies=np.packbits(occ))
        names.append(d.name)
        if (i + 1) % 16 == 0:
            print(f"  {i + 1}/{n_shapes}", flush=True)
    n_val = max(n_shapes // 8, 1)
    for split, sl in [("train", slice(0, n_shapes - 2 * n_val)),
                      ("val", slice(n_shapes - 2 * n_val, n_shapes - n_val)),
                      ("test", slice(n_shapes - n_val, n_shapes))]:
        (cat / f"{split}.lst").write_text("\n".join(names[sl]) + "\n")
    print(f"wrote {n_shapes} shapes under {cat}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "data/synth",
         *(int(a) for a in sys.argv[2:]))
