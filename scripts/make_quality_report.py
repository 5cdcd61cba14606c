"""Generate QUALITY.md: reconstruction quality of a trained checkpoint
through the production inference path (Reconstructor + dense dual-MC),
per test shape and aggregated — the committed evidence the reference
provides via test.py + metrics.py (/root/reference/README.md:113-121,
metrics.py:76-192).

Usage:
  python scripts/make_quality_report.py <config> <ckpt> [limit] [out_md] \
      [noise_ckpt]

``noise_ckpt``: optional checkpoint trained with the noise recipe
(configs/synth/train_noise.yaml) — adds `noise-trained/...+noise` rows so
the report shows what noise training buys over the clean-trained model
on the same perturbed inputs.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    cfg_path, ckpt = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 12
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

    spec = [DS.SHAPE_NAME, DS.INPUT_PC, DS.TARGET_NORMAL, DS.GT_DENSE_PC,
            DS.GT_DENSE_NORMAL, DS.GT_ONET_SAMPLE]
    te = cfg.get("test_dataset", cfg.get("val_dataset"))
    ds = build_dataset(te.get("name", "ShapeNet"), spec,
                       **te.get("args", {}))
    ev = MeshEvaluator(n_points=500000)

    def run(params, structure, label, noise=None):
        """``noise=(stddev, outlier_ratio)`` perturbs the INPUT cloud the
        way the training noise recipe does (configs/synth/train_noise.yaml
        semantics — the reference's train_3k_noise.yaml robustness
        setting); GT stays clean."""
        recon = Reconstructor(config=pcfg, params=params)
        rows = []
        nrng = np.random.default_rng(1234)
        for i in range(min(len(ds), limit)):
            item = ds[i]
            xyz = np.asarray(item[DS.INPUT_PC], np.float32)
            nrm = np.asarray(item[DS.TARGET_NORMAL], np.float32)
            if noise is not None:
                from nksr_tpu.data.transforms import (PointcloudNoise,
                                                      PointcloudOutliers)
                d = {DS.INPUT_PC: xyz}
                d = PointcloudNoise(noise[0])(d, nrng)
                d = PointcloudOutliers(noise[1])(d, nrng)
                xyz = d[DS.INPUT_PC]
            try:
                f = recon.reconstruct(xyz, nrm, detail_level=None,
                                      voxel_size=pcfg.voxel_size,
                                      solver_max_iters=64,
                                      solver_tol=1e-5,
                                      structure=structure)
                mesh = f.extract_dual_mesh(mise_iter=1)
                if mesh.v.shape[0] < 10:
                    raise RuntimeError("empty mesh")
                m = ev.eval_mesh(
                    mesh, np.asarray(item[DS.GT_DENSE_PC]),
                    np.asarray(item[DS.GT_DENSE_NORMAL]),
                    onet_samples=item.get(DS.GT_ONET_SAMPLE))
            except Exception as e:
                print(f"  [{label}] {item[DS.SHAPE_NAME]}: FAILED {e}",
                      flush=True)
                continue
            m["source"] = item[DS.SHAPE_NAME]
            rows.append(m)
            print(f"  [{label}] {m['source']}: chamfer-L1 "
                  f"{m['chamfer-L1']:.4f} f-score {m['f-score']:.3f}",
                  flush=True)
        agg = {k: float(np.nanmean([r[k] for r in rows]))
               for k in rows[0] if k != "source"} if rows else {}
        return rows, agg

    noise = (0.005, 0.01)   # the train_noise.yaml operating point
    results = {}
    results["trained/predicted"] = run(trained.params, "predicted",
                                       "trained/predicted")
    results["trained/splat"] = run(trained.params, "splat",
                                   "trained/splat")
    # the reference's third structure builder
    # (build_adaptive_normal_variation, models/nksr_net.py:175-179)
    results["trained/adaptive"] = run(trained.params, "adaptive",
                                      "trained/adaptive")
    results["trained/predicted+noise"] = run(
        trained.params, "predicted", "trained/predicted+noise",
        noise=noise)
    results["trained/splat+noise"] = run(
        trained.params, "splat", "trained/splat+noise", noise=noise)
    noise_ckpt = sys.argv[5] if len(sys.argv) > 5 else None
    if noise_ckpt:
        ntrained = CKPT.load_params(
            noise_ckpt, T.init_state(pcfg, tcfg, jax.random.PRNGKey(0)))
        results["noise-trained/predicted+noise"] = run(
            ntrained.params, "predicted", "noise-trained/predicted+noise",
            noise=noise)
        results["noise-trained/splat+noise"] = run(
            ntrained.params, "splat", "noise-trained/splat+noise",
            noise=noise)
        # CLEAN-input rows for the noise-trained model: the reference
        # evaluates its noise recipes both ways
        # (configs/shapenet/train_3k_noise.yaml) — these quantify what
        # noise training costs on clean data
        results["noise-trained/predicted"] = run(
            ntrained.params, "predicted", "noise-trained/predicted")
        results["noise-trained/splat"] = run(
            ntrained.params, "splat", "noise-trained/splat")
    untrained = T.init_state(pcfg, tcfg, jax.random.PRNGKey(0))
    results["untrained/splat"] = run(untrained.params, "splat",
                                     "untrained/splat")

    keys = ["chamfer-L1", "chamfer-L2", "f-score", "f-score-15",
            "f-score-20", "normals", "iou"]
    lines = [
        "# QUALITY — trained-model reconstruction metrics",
        "",
        f"Checkpoint: `{ckpt}` (step {step}), config `{cfg_path}`, "
        f"voxel_size {pcfg.voxel_size}.",
        "Production inference route: `Reconstructor.reconstruct` -> "
        "`extract_dual_mesh(mise_iter=1)` (dense device dual-MC); "
        "MeshEvaluator with 5e5 mesh samples (reference metrics.py "
        "semantics: chamfer-L1/L2, f-scores, normal consistency, "
        "ray-cast occupancy IoU).",
        "",
        f"Test set: {min(len(ds), limit)} held-out synthetic shapes "
        "(scripts/make_synth_dataset.py — this sandbox has no egress, "
        "so ShapeNet itself is unavailable; the synthetic ONet-format "
        "set exercises the identical pipeline).",
        "",
        "| Pipeline | " + " | ".join(keys) + " |",
        "|---|" + "---|" * len(keys),
    ]
    for label, (rows, agg) in results.items():
        if not agg:
            lines.append(f"| {label} | (no meshes) " +
                         "| " * (len(keys) - 1) + "|")
            continue
        lines.append("| " + label + " | " + " | ".join(
            f"{agg.get(k, float('nan')):.4f}" for k in keys) + " |")
    lines += [
        "",
        "`trained/predicted` is the reference's default route (the UNet "
        "predicts the decoder hierarchy); `trained/splat` teacher-forces "
        "the full splat shell; the `+noise` rows feed the SAME shapes "
        "with sigma-0.005 Gaussian jitter + 1% bbox outliers on the "
        "input cloud only (the train_noise.yaml recipe, mirroring the "
        "reference's train_3k_noise.yaml) against clean GT — the "
        "noise-robustness evidence; `untrained/splat` is the random-init "
        "baseline (pure screened-RBF behavior from the residual normal "
        "prior) — the gap to it is what training buys.",
    ]
    if noise_ckpt:
        lines += [
            "",
            f"`noise-trained/...` rows use `{noise_ckpt}` "
            "(configs/synth/train_noise.yaml fine-tune) on the same "
            "perturbed inputs — the delta vs `trained/...+noise` is "
            "what noise training buys.",
        ]
    lines += [
        "",
        "Per-sample rows: `runs/quality/metrics_*.json`.",
    ]
    Path(out_md).write_text("\n".join(lines) + "\n")
    outdir = Path("runs/quality")
    outdir.mkdir(parents=True, exist_ok=True)
    for label, (rows, agg) in results.items():
        safe = label.replace("/", "_")
        (outdir / f"metrics_{safe}.json").write_text(
            json.dumps({"rows": rows, "aggregate": agg}, indent=1,
                       default=float))
    print("wrote", out_md)


if __name__ == "__main__":
    main()
