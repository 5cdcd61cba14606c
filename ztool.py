#!/usr/bin/env python
"""Ops tooling: run hygiene for training directories.

Counterpart of the reference's operator CLI (SURVEY.md §2.1 "ztool"):
  * ``clean``   — delete checkpoints of premature/crashed runs
  * ``upload``  — copy run checkpoints to a destination (rsync-style)
  * ``list``    — summarize runs (steps, best val, last update)
(The reference's wandb/GPU-squatter features don't apply in this
environment; cleaning keys off run directories instead of wandb IDs.)
"""

import argparse
import shutil
import time
from pathlib import Path

import numpy as np


def run_summary(run: Path):
    info = {"run": run.name, "ckpts": 0, "steps": None, "best": None,
            "age_h": None}
    ckpts = list(run.glob("*.ckpt"))
    info["ckpts"] = len(ckpts)
    if ckpts:
        newest = max(c.stat().st_mtime for c in ckpts)
        info["age_h"] = (time.time() - newest) / 3600
    csv = run / "metrics.csv"
    if csv.exists():
        lines = csv.read_text().strip().splitlines()
        info["steps"] = len(lines) - 1
        try:
            import csv as _csv
            rows = list(_csv.DictReader(lines))
            vals = [float(r["val/sum"]) for r in rows
                    if r.get("val/sum") not in (None, "",)]
            if vals:
                info["best"] = min(vals)
        except Exception:
            pass
    return info


def cmd_list(args):
    root = Path(args.root)
    for run in sorted(p for p in root.iterdir() if p.is_dir()):
        s = run_summary(run)
        print(f"{s['run']:<30} ckpts={s['ckpts']} steps={s['steps']} "
              f"best={s['best']} age_h="
              f"{s['age_h']:.1f}" if s['age_h'] is not None else
              f"{s['run']:<30} (empty)")


def cmd_clean(args):
    """Remove runs that died early (few steps, stale)."""
    root = Path(args.root)
    for run in sorted(p for p in root.iterdir() if p.is_dir()):
        s = run_summary(run)
        premature = (s["steps"] or 0) < args.min_steps
        stale = s["age_h"] is None or s["age_h"] > args.min_age_h
        if premature and stale:
            print(f"removing premature run {run} "
                  f"(steps={s['steps']}, age={s['age_h']})")
            if not args.dry_run:
                shutil.rmtree(run)


def cmd_upload(args):
    src, dst = Path(args.src), Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    for pat in args.patterns:
        for f in src.glob(pat):
            print(f"copy {f} -> {dst / f.name}")
            if not args.dry_run:
                shutil.copy2(f, dst / f.name)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("list")
    p.add_argument("--root", default="runs")
    p.set_defaults(fn=cmd_list)
    p = sub.add_parser("clean")
    p.add_argument("--root", default="runs")
    p.add_argument("--min_steps", type=int, default=100)
    p.add_argument("--min_age_h", type=float, default=6.0)
    p.add_argument("--dry_run", action="store_true")
    p.set_defaults(fn=cmd_clean)
    p = sub.add_parser("upload")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--patterns", nargs="*",
                   default=["*.ckpt", "metrics.csv", "config.yaml"])
    p.add_argument("--dry_run", action="store_true")
    p.set_defaults(fn=cmd_upload)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
