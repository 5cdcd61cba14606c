"""Checkpoint IO: native (flax msgpack) + torch state-dict import shim.

Reference contract: ``load_checkpoint_from_url(url)`` returns
``{'state_dict': ...}`` consumed by ``network.load_state_dict``
(/root/reference/models/nksr_net.py:36-38).  This sandbox has no egress, so
URLs resolve against a local cache directory (``NKSR_TPU_CKPT_DIR``).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


# ------------------------------------------------------------- native format
def save_params(path, params) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path, template) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# --------------------------------------------------------------- torch shim
def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if prefix or k else k))
        return out
    out[prefix[:-1]] = tree
    return out


def torch_state_dict_to_params(cfg, state_dict: Dict[str, Any], template):
    """Best-effort torch ``state_dict`` -> flax params for our canonical
    export naming (utils.checkpoint.params_to_torch_state_dict): a
    round-trippable mapping so torch-side tooling can exchange weights.

    Keys are matched by normalized path; Linear kernels are transposed
    (torch stores (out, in)).  Unknown reference-wheel checkpoints with
    different module names will raise with the unmatched keys listed.
    """
    import jax.numpy as jnp

    flat_t = {k: np.asarray(getattr(v, "numpy", lambda: v)())
              for k, v in state_dict.items()}
    flat_p = _flatten(template)
    new = {}
    missing = []
    for pk, pv in flat_p.items():
        tk = pk.replace("params.", "").replace("/", ".")
        cand = None
        for suffix, transpose in (("kernel", True), ("scale", False),
                                  ("bias", False), ("", False)):
            if suffix and not tk.endswith(suffix):
                continue
            base = tk[: -len(suffix)].rstrip(".") if suffix else tk
            torch_name = {"kernel": "weight", "scale": "weight",
                          "bias": "bias", "": None}[suffix]
            key = f"{base}.{torch_name}" if torch_name else base
            if key in flat_t:
                cand = flat_t[key].T if transpose else flat_t[key]
                break
        if cand is None or cand.shape != pv.shape:
            missing.append(pk)
            new[pk] = pv
        else:
            new[pk] = jnp.asarray(cand, pv.dtype)
    if missing and len(missing) == len(flat_p):
        raise ValueError(
            f"state_dict matched no parameters; first keys: "
            f"{list(flat_t)[:5]}")
    # unflatten back into template structure
    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        return new[prefix[:-1]]
    return rebuild(template)


def params_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Canonical torch-style export of our params (inverse of the shim)."""
    flat = _flatten(params)
    out = {}
    for k, v in flat.items():
        tk = k.replace("params.", "")
        arr = np.asarray(v)
        if tk.endswith("kernel"):
            out[tk[: -len("kernel")] + "weight"] = arr.T
        elif tk.endswith("scale"):
            out[tk[: -len("scale")] + "weight"] = arr
        else:
            out[tk] = arr
    return out


# ------------------------------------------------------------ url resolution
PRETRAINED = {
    # names advertised by the reference (README.md:115-117)
    "ks": "ks.pth",
    "snet-n3k-wnormal": "snet-n3k-wnormal.pth",
    "p2s": "p2s.pth",
    "carla": "carla.pth",
}


def load_checkpoint_from_url(url: str) -> Dict[str, Any]:
    """Resolve a checkpoint by URL/name from the local cache
    (``NKSR_TPU_CKPT_DIR``, default ``~/.cache/nksr_tpu``).  This build runs
    in a zero-egress sandbox, so nothing is downloaded."""
    cache = Path(os.environ.get("NKSR_TPU_CKPT_DIR",
                                Path.home() / ".cache" / "nksr_tpu"))
    name = url.rstrip("/").split("/")[-1]
    for p in (cache / name, cache / PRETRAINED.get(name, name)):
        if p.exists():
            if p.suffix in (".pkl", ".pickle"):
                with open(p, "rb") as f:
                    return pickle.load(f)
            try:
                import torch
                return torch.load(p, map_location="cpu")
            except Exception:
                with open(p, "rb") as f:
                    return pickle.load(f)
    raise FileNotFoundError(
        f"checkpoint '{name}' not found under {cache}; place the file "
        f"there (no network egress available)")
