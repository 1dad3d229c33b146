"""OCP-style registry for trainers / tasks / loggers / datasets.

The reference uses two registries (nets/registry.py timm-style for models and
ocpmodels.common.registry for everything else, SURVEY.md §5).  Models use
models/registry.py; this one covers the OC20-style surface, and the OC20 CLI
dispatches through it (cli/train_oc20.main — the reference's
main_oc20.py:60-66 pattern: config names the trainer, mode names the task).

Builtins register themselves via decorators where they are defined
(EnergyTrainerV2 + tasks in cli/train_oc20.py, OC20LmdbDataset in
data/oc20_lmdb.py, loggers in utils/logger.py + utils/tensorboard.py);
``get`` imports those modules on first use so lookups always see them.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Callable]] = {
    "trainer": {},
    "task": {},
    "logger": {},
    "dataset": {},
}

_builtins_loaded = False


def register(kind: str, name: str):
    def deco(obj):
        _REGISTRIES[kind][name] = obj
        return obj

    return deco


def _ensure_builtins():
    global _builtins_loaded
    if _builtins_loaded:
        return
    _builtins_loaded = True
    from ..cli import train_oc20  # noqa: F401  (trainer + task decorators)
    from ..data import oc20_lmdb  # noqa: F401  (dataset decorators)
    from ..utils import logger, tensorboard  # noqa: F401  (logger decorators)


def get(kind: str, name: str):
    _ensure_builtins()
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
