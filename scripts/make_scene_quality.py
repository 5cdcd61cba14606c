"""Scene-scale quality rows: held-out synthetic scenes + the bench
terrain against its ANALYTIC surface, at the reference's scene eval
density (5e6 mesh samples — /root/reference/models/nksr_net.py:301-303).

Appends/maintains the "Scene-scale quality" section of QUALITY.md.

Usage:
  python scripts/make_scene_quality.py <config> <ckpt> [limit] [out_md]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_terrain_rows(recon, structures):
    """The 1M-point bench terrain vs its analytic height field: the
    vertical distance |v_z - h(v_x, v_y)| of mesh samples is true
    geometric error (up to slope factor) — free, exact scene GT."""
    from bench import synthetic_scene
    xyz, nrm = synthetic_scene(1_000_000)

    def h(x, y):
        return (np.sin(0.3 * x) * np.cos(0.25 * y)
                + 0.3 * np.sin(1.1 * x + 0.7 * y))

    rows = []
    for structure in structures:
        f = recon.reconstruct(xyz, nrm, detail_level=None, voxel_size=0.1,
                              solver_tol=1e-4, solver_max_iters=16,
                              structure=structure)
        mesh = f.extract_dual_mesh(mise_iter=1)
        v = np.asarray(mesh.v)
        used = np.unique(np.asarray(mesh.f))
        v = v[used]
        inner = (np.abs(v[:, 0]) < 19.0) & (np.abs(v[:, 1]) < 19.0)
        v = v[inner]
        d = np.abs(v[:, 2] - h(v[:, 0], v[:, 1]))
        rows.append({
            "structure": structure,
            "verts": int(len(v)),
            "vert_err_mean": float(d.mean()),
            "vert_err_q90": float(np.quantile(d, 0.9)),
            "vert_err_max": float(d.max()),
        })
        print(f"  [terrain/{structure}] verts {len(v)} err mean "
              f"{d.mean():.4f} q90 {np.quantile(d, 0.9):.4f}", flush=True)
        f = mesh = None
    return rows


def main():
    cfg_path, ckpt = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    out_md = sys.argv[4] if len(sys.argv) > 4 else "QUALITY.md"
    import jax

    from nksr_tpu import Reconstructor
    from nksr_tpu.data import DatasetSpec as DS, build_dataset
    from nksr_tpu.train import driver, loop as T
    from nksr_tpu.utils import checkpoint as CKPT
    from nksr_tpu.utils.config import load_config
    from nksr_tpu.utils.metrics import MeshEvaluator

    cfg = load_config(cfg_path)
    pcfg = driver.pipeline_config_from_yaml(cfg)
    tcfg = driver.train_config_from_yaml(cfg)
    state = T.init_state(pcfg, tcfg, jax.random.PRNGKey(0))
    trained = CKPT.load_params(ckpt, state)
    step = int(trained.step)
    recon = Reconstructor(config=pcfg, params=trained.params)

    spec = [DS.SHAPE_NAME, DS.INPUT_PC, DS.TARGET_NORMAL, DS.GT_DENSE_PC,
            DS.GT_DENSE_NORMAL, DS.GT_ONET_SAMPLE]
    te = cfg.get("test_dataset", cfg.get("val_dataset"))
    ds = build_dataset(te.get("name", "ShapeNet"), spec,
                       **te.get("args", {}))
    # scene eval density (reference: 5e6 samples for scenes with GT
    # geometry, 5e5 for objects — models/nksr_net.py:301-303)
    ev = MeshEvaluator(n_points=5_000_000)

    structures = ("predicted", "splat", "adaptive")
    results = {}
    for structure in structures:
        rows = []
        for i in range(min(len(ds), limit)):
            item = ds[i]
            xyz = np.asarray(item[DS.INPUT_PC], np.float32)
            nrm = np.asarray(item[DS.TARGET_NORMAL], np.float32)
            try:
                f = recon.reconstruct(xyz, nrm, detail_level=None,
                                      voxel_size=pcfg.voxel_size,
                                      solver_max_iters=16,
                                      solver_tol=1e-4,
                                      structure=structure)
                mesh = f.extract_dual_mesh(mise_iter=1)
                if mesh.v.shape[0] < 10:
                    raise RuntimeError("empty mesh")
                m = ev.eval_mesh(
                    mesh, np.asarray(item[DS.GT_DENSE_PC]),
                    np.asarray(item[DS.GT_DENSE_NORMAL]),
                    onet_samples=item.get(DS.GT_ONET_SAMPLE))
            except Exception as e:
                print(f"  [{structure}] {item[DS.SHAPE_NAME]}: FAILED "
                      f"{e}", flush=True)
                continue
            m["source"] = item[DS.SHAPE_NAME]
            rows.append(m)
            print(f"  [{structure}] {m['source']}: chamfer-L1 "
                  f"{m['chamfer-L1']:.4f} f-score {m['f-score']:.3f}",
                  flush=True)
            f = mesh = None
        agg = {k: float(np.nanmean([r[k] for r in rows]))
               for k in rows[0] if k != "source"} if rows else {}
        results[structure] = (rows, agg)

    import os
    terrain = []
    if os.environ.get("NKSR_SCENE_TERRAIN", "1") == "1":
        terrain = bench_terrain_rows(recon, structures)

    keys = ["chamfer-L1", "chamfer-L2", "f-score", "f-score-15",
            "f-score-20", "normals", "iou"]
    lines = [
        "",
        "## Scene-scale quality (held-out scenes + bench terrain)",
        "",
        f"Scene checkpoint: `{ckpt}` (step {step}), config "
        f"`{cfg_path}`, voxel_size {pcfg.voxel_size}; held-out test "
        f"split of the terrain corpus, MeshEvaluator with 5e6 mesh "
        "samples (the reference's scene eval density, "
        "models/nksr_net.py:301-303); solver at the production bench "
        "operating point (16 iters, tol 1e-4).",
        "",
        "| route | " + " | ".join(keys) + " | n |",
        "|---|" + "---|" * (len(keys) + 1),
    ]
    for structure in structures:
        rows, agg = results[structure]
        if not agg:
            lines.append(f"| scene/{structure} | " +
                         " | ".join(["failed"] * len(keys)) + " | 0 |")
            continue
        lines.append(
            f"| scene/{structure} | "
            + " | ".join(f"{agg.get(k, float('nan')):.4f}"
                         for k in keys)
            + f" | {len(rows)} |")
    lines += [
        "",
        "Bench terrain (1M points, analytic GT — exact mesh-vertex "
        "error in scene units, voxel 0.1):",
        "",
        "| route | verts | vert err mean | q90 | max |",
        "|---|---|---|---|---|",
    ]
    for r in terrain:
        lines.append(
            f"| terrain/{r['structure']} | {r['verts']} | "
            f"{r['vert_err_mean']:.4f} | {r['vert_err_q90']:.4f} | "
            f"{r['vert_err_max']:.4f} |")
    lines.append("")

    text = "\n".join(lines)
    out = Path(out_md)
    existing = out.read_text() if out.exists() else "# QUALITY\n"
    marker = "\n## Scene-scale quality"
    if marker in existing:
        existing = existing[: existing.index(marker)]
    out.write_text(existing.rstrip("\n") + "\n" + text)
    print(f"wrote scene section -> {out_md}")


if __name__ == "__main__":
    main()
