"""timm-style model registry (reference nets/registry.py:20-44)."""

from __future__ import annotations

from typing import Callable, Dict

_MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    name = fn.__name__
    if name in _MODEL_REGISTRY:
        raise ValueError(f"duplicate model entrypoint {name}")
    _MODEL_REGISTRY[name] = fn
    return fn


def model_entrypoint(name: str) -> Callable:
    if name not in _MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name]


def list_models():
    return sorted(_MODEL_REGISTRY)
