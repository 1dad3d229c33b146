"""OCP-style registry for trainers / tasks / loggers / datasets.

The reference uses two registries (nets/registry.py timm-style for models and
ocpmodels.common.registry for everything else, SURVEY.md §5).  Models use
models/registry.py; this one covers the rest of the OC20-style surface.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Callable]] = {
    "trainer": {},
    "task": {},
    "logger": {},
    "dataset": {},
}


def register(kind: str, name: str):
    def deco(obj):
        _REGISTRIES[kind][name] = obj
        return obj

    return deco


def get(kind: str, name: str):
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        raise KeyError(
            f"unknown {kind} {name!r}; available: {sorted(_REGISTRIES[kind])}"
        )


register_trainer = lambda name: register("trainer", name)
register_task = lambda name: register("task", name)
register_logger = lambda name: register("logger", name)
register_dataset = lambda name: register("dataset", name)


def _register_builtins():
    from ..cli import train_oc20 as _oc20

    _REGISTRIES["trainer"].setdefault("energy_v2", _oc20.main)
    _REGISTRIES["task"].setdefault("train", lambda args: _oc20.main(args))

    from ..utils.logger import FileLogger, MetricsWriter

    _REGISTRIES["logger"].setdefault("file", FileLogger)
    _REGISTRIES["logger"].setdefault("jsonl", MetricsWriter)

    from ..data.oc20_lmdb import OC20LmdbDataset

    _REGISTRIES["dataset"].setdefault("lmdb_v2", OC20LmdbDataset)
    _REGISTRIES["dataset"].setdefault("single_point_lmdb_v2", OC20LmdbDataset)


try:  # pragma: no cover - registration best-effort at import
    _register_builtins()
except Exception:
    pass
