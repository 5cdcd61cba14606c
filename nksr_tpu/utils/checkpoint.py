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


# ----------------------------------------------- reference-wheel key layout
#
# Expected top-level families of the published NKSR checkpoints
# (ks.pth / snet-n3k-wnormal.pth / p2s.pth / carla.pth,
# /root/reference/README.md:115-117).  The wheel's source is not vendored
# in the reference tree (SURVEY.md §0), so the layout below is recovered
# from the usage contract: ``network.load_state_dict(ckpt['state_dict'])``
# where network is ``nksr.NKSRNetwork`` with submodules ``encoder``,
# ``unet``, ``interpolators``, ``sdf_decoder``, ``udf_decoder``
# (/root/reference/models/nksr_net.py:34-38 and the submodule accesses at
# :73-78,92-139) — so state_dict keys are 'encoder.*', 'unet.*',
# 'interpolators.<d>.*', 'sdf_decoder.*', 'udf_decoder.*' (torch
# ModuleList indices for the per-depth interpolators).
#
# Our network is a TPU-first re-design, NOT a module-for-module port:
# the encoder and UNet differ structurally from the wheel's sparse-conv
# stack, so their tensors cannot be meaningfully transplanted.  The
# families whose structure we DO share (per-depth interpolator MLPs and
# the sdf/udf decoder MLPs — plain Dense stacks) are imported by
# REGISTRATION ORDER + SHAPE within each family, which is robust to the
# wheel's (unknown) inner naming: torch state_dicts preserve module
# registration order, and an MLP's (weight, bias) sequence is its
# topology.
REFERENCE_FAMILIES = ("encoder", "unet", "interpolators",
                      "sdf_decoder", "udf_decoder")

# family -> path of the corresponding subtree in our param tree
FAMILY_TO_PARAM_SUBTREE = {
    "interpolators": ("params", "interpolators"),
    "sdf_decoder": ("params", "sdf_decoder"),
    "udf_decoder": ("params", "udf_decoder"),
    "encoder": ("params", "encoder"),
    "unet": ("params", "unet"),
}


def looks_like_reference_state_dict(state_dict: Dict[str, Any]) -> bool:
    tops = {k.split(".")[0] for k in state_dict}
    return bool(tops & set(REFERENCE_FAMILIES)) and \
        not any(k.startswith("params.") for k in state_dict)


def _family_leaves_in_order(subtree, prefix=""):
    """Flax subtree -> [(path, leaf)] in sorted-key order, Dense layers
    ordered by their numeric suffix (Dense_0, Dense_1, ...) so the order
    matches sequential registration."""
    import re

    def sort_key(k):
        m = re.search(r"_(\d+)$", k)
        return (re.sub(r"_\d+$", "", k), int(m.group(1)) if m else -1)

    out = []
    if isinstance(subtree, dict):
        for k in sorted(subtree.keys(), key=sort_key):
            out.extend(_family_leaves_in_order(
                subtree[k], f"{prefix}{k}."))
        return out
    return [(prefix[:-1], subtree)]


def import_reference_state_dict(state_dict: Dict[str, Any], template,
                                strict: bool = False):
    """Import a reference-wheel-layout torch state_dict by family.

    Returns ``(params, report)`` where report maps each family to
    'mapped (N tensors)', 'skipped (architecture differs)' or
    'absent'.  ``strict=True`` raises if any structurally-shared family
    (interpolators / sdf_decoder / udf_decoder) fails to map.
    """
    import jax.numpy as jnp

    flat_t = {k: np.asarray(getattr(v, "numpy", lambda: v)())
              for k, v in state_dict.items()}
    report: Dict[str, str] = {}
    new_flat = dict(_flatten(template))

    for fam in ("interpolators", "sdf_decoder", "udf_decoder"):
        fam_items = [(k, v) for k, v in flat_t.items()
                     if k.split(".")[0] == fam]
        if not fam_items:
            report[fam] = "absent"
            continue
        # torch insertion order == registration order; weights are 2-D
        # (out, in), biases 1-D (out,).  Pair them up in order.
        weights = [(k, v) for k, v in fam_items if v.ndim == 2]
        biases = {k.rsplit(".", 1)[0]: v for k, v in fam_items
                  if v.ndim == 1}
        # our side: Dense leaves of the family subtree, in order
        sub = template
        for p in FAMILY_TO_PARAM_SUBTREE[fam]:
            sub = sub.get(p, {}) if isinstance(sub, dict) else {}
        ours = _family_leaves_in_order(sub)
        our_kernels = [(p, l) for p, l in ours if p.endswith("kernel")]
        if len(weights) != len(our_kernels):
            report[fam] = (f"skipped (layer count mismatch: ckpt "
                           f"{len(weights)} vs ours {len(our_kernels)})")
            if strict:
                raise ValueError(f"{fam}: {report[fam]}")
            continue
        ok = True
        staged = {}
        prefix = ".".join(FAMILY_TO_PARAM_SUBTREE[fam])
        for (tk, tw), (pk, pl) in zip(weights, our_kernels):
            if tw.T.shape != pl.shape:
                report[fam] = (f"skipped (shape mismatch at {tk}: "
                               f"{tw.shape} vs {pl.shape})")
                ok = False
                break
            staged[f"{prefix}.{pk}"] = jnp.asarray(tw.T, pl.dtype)
            tb = biases.get(tk.rsplit(".", 1)[0])
            bkey = f"{prefix}.{pk[: -len('kernel')]}bias"
            if tb is not None and bkey in new_flat and \
                    tb.shape == np.shape(new_flat[bkey]):
                staged[bkey] = jnp.asarray(tb, np.asarray(
                    new_flat[bkey]).dtype)
        if ok:
            new_flat.update(staged)
            report[fam] = f"mapped ({len(staged)} tensors)"
        elif strict:
            raise ValueError(f"{fam}: {report[fam]}")

    for fam in ("encoder", "unet"):
        has = any(k.split(".")[0] == fam for k in flat_t)
        report[fam] = ("skipped (architecture differs: TPU re-design; "
                       "see utils/checkpoint.py REFERENCE_FAMILIES note)"
                       if has else "absent")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        return new_flat[prefix[:-1]]
    return rebuild(template), report


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
