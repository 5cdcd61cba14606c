"""Layered YAML config system.

Replaces the reference's OmegaConf/pycg stack (include chains via
``include_configs``, ``${var}`` interpolation, dotted CLI overrides —
/root/reference/train.py:176-179, configs/default/train.yaml:1-2,
configs/shapenet/data.yaml:1-14) with a small dependency-free
implementation over PyYAML.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import yaml


class Config(dict):
    """dict with attribute access and dotted get/set."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and \
            not isinstance(v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v

    def get_dotted(self, path: str, default=None):
        cur: Any = self
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def set_dotted(self, path: str, value):
        parts = path.split(".")
        cur: Dict = self
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_INTERP = re.compile(r"\$\{([^}]+)\}")


def _interpolate(node: Any, root: Dict) -> Any:
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        def repl(m):
            cur: Any = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return str(cur)
        if _INTERP.fullmatch(node.strip()):
            # whole-string interpolation keeps the referenced type
            cur: Any = root
            for part in node.strip()[2:-1].split("."):
                cur = cur[part]
            return cur
        return _INTERP.sub(repl, node)
    return node


def load_config(path, overrides: Optional[Sequence[str]] = None,
                includes: Optional[Sequence[str]] = None) -> Config:
    """Load YAML with include chains, interpolation and k=v overrides."""
    cfg = _load_with_includes(Path(path))
    for inc in includes or []:
        cfg = _deep_merge(cfg, _load_with_includes(Path(inc)))
    c = Config(cfg)
    for ov in overrides or []:
        k, _, v = ov.partition("=")
        c.set_dotted(k.strip(), yaml.safe_load(v))
    return Config(_interpolate(dict(c), dict(c)))


def _load_with_includes(path: Path) -> Dict:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    incs = raw.pop("include_configs", [])
    if isinstance(incs, str):
        incs = [incs]
    base: Dict = {}
    for inc in incs:
        base = _deep_merge(base, _load_with_includes(
            (path.parent / inc).resolve()))
    return _deep_merge(base, raw)


def save_config(cfg: Dict, path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(dict(cfg), f, sort_keys=False)
