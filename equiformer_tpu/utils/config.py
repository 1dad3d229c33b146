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


def create_grid(base_cfg: Dict[str, Any], sweep_yml: str) -> List[Dict[str, Any]]:
    """Expand a sweep YAML of dot-keyed value lists into the cartesian grid of
    configs (OCP ``create_grid`` equivalent, reference main_oc20.py:102-105).

    Example sweep YAML::

        optim.lr_initial: [5.0e-4, 2.0e-4]
        model.alpha_drop: [0.1, 0.2]

    -> 4 configs.  Each result carries a ``sweep_point`` dict naming its cell.
    """
    import copy
    import itertools

    with open(sweep_yml) as f:
        sweep = yaml.safe_load(f) or {}
    keys = list(sweep)
    for k, v in sweep.items():
        if not isinstance(v, list):
            raise ValueError(f"sweep key {k!r} must map to a list, got {type(v)}")
    grid = []
    for vals in itertools.product(*(sweep[k] for k in keys)):
        cfg = copy.deepcopy(base_cfg)
        apply_overrides(cfg, [f"{k}={v}" for k, v in zip(keys, vals)])
        cfg["sweep_point"] = {k: v for k, v in zip(keys, vals)}
        grid.append(cfg)
    return grid
