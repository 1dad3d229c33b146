"""YAML config system with ``includes:`` inheritance and CLI dot-overrides.

Equivalent of OCP ``build_config`` used by the reference OC20 runner
(main_oc20.py:94-96; configs like oc20/configs/is2re/all/.../*.yml start with
``includes: [- ../base.yml]``).  Later files override earlier ones; CLI
overrides of the form ``a.b.c=value`` are applied last.
"""

from __future__ import annotations

import ast
import os
from typing import Any, Dict, List, Sequence

import yaml


def _deep_update(base: Dict, update: Dict) -> Dict:
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_config(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    includes = cfg.pop("includes", [])
    merged: Dict[str, Any] = {}
    for inc in includes:
        inc_path = inc if os.path.isabs(inc) else os.path.join(os.path.dirname(path), inc)
        _deep_update(merged, load_config(inc_path))
    _deep_update(merged, cfg)
    return merged


def apply_overrides(cfg: Dict[str, Any], overrides: Sequence[str]) -> Dict[str, Any]:
    """Apply 'a.b=value' CLI overrides (values parsed as python literals when
    possible, else kept as strings)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, val = ov.split("=", 1)
        try:
            val = yaml.safe_load(val)
        except yaml.YAMLError:
            pass
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return cfg


def build_config(path: str, overrides: Sequence[str] = ()) -> Dict[str, Any]:
    return apply_overrides(load_config(path), overrides)
