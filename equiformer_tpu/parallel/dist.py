"""Multi-host distributed initialization (reference utils.py:17-69 /
oc20/trainer/dist_setup.py NCCL paths, replaced by jax.distributed).

On TPU pods JAX discovers the topology automatically; on CPU/GPU clusters the
coordinator address + process counts come from env vars (SLURM or manual),
mirroring the reference's three init paths.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed() -> bool:
    """Initialize multi-process JAX if the environment requests it.

    Returns True when running multi-process.  Single-process (the common
    single-host case) is a no-op, like the reference's non-distributed path.
    """
    if "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("PROCESS_ID", "0")),
        )
        return True
    if "SLURM_PROCID" in os.environ and int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        # jax parses SLURM env itself when initialize() is called with no args
        jax.distributed.initialize()
        return True
    if os.environ.get("JAX_AUTO_DISTRIBUTED", "0") == "1":
        jax.distributed.initialize()
        return True
    return False


def is_master() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()
