"""Rank-0 file/console logger + metric writers.

Equivalents of the reference FileLogger (logger.py:4-57) and the OC20
tensorboard/wandb logger registry (base_trainer_oc20.py:225-236): in JAX the
rank is ``jax.process_index()``; non-zero processes get a no-op sink.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

from ..train.registry import register_logger


@register_logger("file")
class FileLogger:
    def __init__(
        self,
        is_master: bool = True,
        output_dir: Optional[str] = None,
        name: str = "equiformer_tpu",
    ):
        self.is_master = is_master
        self._logger = None
        if is_master:
            logger = logging.getLogger(name)
            logger.setLevel(logging.INFO)
            logger.propagate = False
            logger.handlers.clear()
            fmt = logging.Formatter("%(asctime)s - %(message)s")
            sh = logging.StreamHandler(sys.stdout)
            sh.setFormatter(fmt)
            logger.addHandler(sh)
            if output_dir:
                os.makedirs(output_dir, exist_ok=True)
                fh = logging.FileHandler(os.path.join(output_dir, "debug.log"))
                fh.setFormatter(fmt)
                logger.addHandler(fh)
            self._logger = logger

    def info(self, msg, *args):
        if self._logger:
            self._logger.info(msg, *args)

    def warning(self, msg, *args):
        if self._logger:
            self._logger.warning(msg, *args)


@register_logger("jsonl")
class MetricsWriter:
    """JSONL metrics sink (one line per logged step) — greppable, and easy to
    feed into tensorboard/wandb exporters later."""

    def __init__(self, output_dir: Optional[str], is_master: bool = True):
        self._fh = None
        if is_master and output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._fh = open(os.path.join(output_dir, "metrics.jsonl"), "a")

    def write(self, step: int, metrics: Dict, prefix: str = ""):
        if self._fh is None:
            return
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            rec[(prefix + "/" + k) if prefix else k] = float(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()


@register_logger("wandb")
class WandBLogger:
    """Weights & Biases sink (reference WandBLogger,
    oc20/trainer/base_trainer_oc20.py:225-236 logger registry).

    Gated on the ``wandb`` package: if it is not installed the logger degrades
    to a warning + no-op so configs with ``logger: wandb`` still run.
    Interface matches the tensorboard exporter (``add_scalars``/``close``).
    """

    def __init__(self, output_dir: Optional[str], enabled: bool = True,
                 project: str = "equiformer-tpu", config: Optional[Dict] = None):
        self._run = None
        if not enabled:
            return
        try:
            import wandb  # noqa: F401
        except ImportError:
            logging.getLogger("equiformer_tpu").warning(
                "wandb requested but not installed; metrics logging disabled"
            )
            return
        import wandb

        self._run = wandb.init(project=project, dir=output_dir, config=config)

    def add_scalars(self, step: int, scalars: Dict, prefix: str = ""):
        if self._run is None:
            return
        self._run.log(
            {(prefix + "/" + k) if prefix else k: float(v) for k, v in scalars.items()},
            step=step,
        )

    def close(self):
        if self._run is not None:
            self._run.finish()
