"""Shared example utilities: data loading + memory warnings.

Reference examples pull assets from the network
(/root/reference/examples/common.py behavior); this sandbox is
zero-egress, so examples use the vendored bunny/spot assets and synthetic
scenes.
"""

import sys
from pathlib import Path

import numpy as np

# allow running straight from a checkout (no pip install needed)
_ROOT = Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))

ASSETS = Path("/root/reference/assets")


def load_bunny_example():
    from nksr_tpu.data import read_ply
    return read_ply(ASSETS / "bunny.ply")


def load_spot_example():
    from nksr_tpu.data import read_ply_full
    return read_ply_full(ASSETS / "spot.ply")


def make_terrain_scene(n=200000, extent=40.0, seed=0):
    """Synthetic lidar-like terrain with sensor positions."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-extent / 2, extent / 2, size=(n, 2)).astype(np.float32)
    h = (np.sin(0.3 * xy[:, 0]) * np.cos(0.25 * xy[:, 1])
         + 0.3 * np.sin(1.1 * xy[:, 0] + 0.7 * xy[:, 1]))
    xyz = np.concatenate([xy, h[:, None].astype(np.float32)], 1)
    sensor = np.zeros_like(xyz)
    sensor[:, 2] = 10.0
    return xyz, sensor


def warning_on_low_memory(mb: float):
    """Host-RAM advisory (the reference warns on low GPU memory;
    XLA on TPU preallocates, so only host RAM is dynamic here)."""
    try:
        import psutil
        free = psutil.virtual_memory().available / 1e6
    except ImportError:
        free = float("inf")
    if free < mb:
        print(f"[warn] less than {mb:.0f} MB host RAM free")
