"""Determinism utilities (reference seeds torch/np/cudnn,
base_trainer_v2.py:319-330; XLA is deterministic by default on TPU)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int, deterministic: bool = True):
    """Seed every host-side RNG.  Device-side randomness is already explicit
    (jax.random keys threaded through the step functions)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    if deterministic:
        # guards against nondeterministic scatter orderings on GPU backends;
        # TPU executions are deterministic for this workload by construction
        os.environ.setdefault("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in os.environ["XLA_FLAGS"]:
            os.environ["XLA_FLAGS"] += " --xla_gpu_deterministic_ops=true"
