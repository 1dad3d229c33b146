"""Checkpoint / resume via orbax: full training state (params, optimizer, EMA,
step) plus config and normalizers.

Covers both reference styles (SURVEY.md §5): MD17/QM9 weights-only best-val
checkpoints (main_md17.py:248-265) and OC20 full-training-state save/load with
preemption-safe resume (base_trainer_oc20.py:502-554, main_oc20.py:81-88).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, metadata: Optional[Dict] = None):
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self._mgr.save(step, args=args)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template)),
        )
        meta_path = os.path.join(self.directory, str(step), "metadata")
        metadata = None
        try:
            restored_meta = self._mgr.restore(
                step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore())
            )
            metadata = restored_meta.get("metadata")
        except Exception:
            pass
        return restored["state"], metadata

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any):
    """Weights-only checkpoint (MD17/QM9 best-model style), single npz file."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for kpath, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kpath)
        arrays[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_params(path: str, params_template: Any):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for kpath, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kpath)
        if key not in data:
            raise KeyError(f"checkpoint missing parameter {key}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        leaves.append(arr)
    paths_treedef = jax.tree_util.tree_structure(params_template)
    return jax.tree_util.tree_unflatten(paths_treedef, leaves)
