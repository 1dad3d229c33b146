"""OC20 IS2RE training steps: normalized energy loss, IS2RS auxiliary position
loss with linearly-decaying weight, Noisy-Nodes augmentation, grad accumulation.

Reference: oc20/trainer/energy_trainer_v2.py:413-469 (_compute_loss,
_compute_auxiliary_task_weight), base_trainer_v2.py:81-126
(interpolate_init_relaxed_pos), :300-302,566-591 (grad accumulation — here via
optax.MultiSteps), and the OCP Evaluator is2re metrics (energy_mae/mse/
within-threshold).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..graph.batching import GraphsTuple
from .engine import masked_mean
from .optim import ema_update
from .state import TrainState


def interpolate_init_relaxed_pos(batch: GraphsTuple, rng) -> GraphsTuple:
    """Noisy-Nodes augmentation: with prob 0.5 per graph, replace initial
    positions of surface/adsorbate atoms (tags>0) with a random interpolation
    initial<->relaxed plus gaussian noise (std 0.3)."""
    threshold = 0.5
    noise_std = 0.3
    num_graphs = batch.graph_mask.shape[0]
    r1, r2, r3 = jax.random.split(rng, 3)
    pick = jax.random.bernoulli(r1, threshold, (num_graphs,))
    pick_nodes = pick[batch.batch]
    factor = jax.random.uniform(r2, (batch.pos.shape[0], 1), batch.pos.dtype)
    noise = jax.random.normal(r3, batch.pos.shape, batch.pos.dtype) * noise_std
    pos_relaxed = batch.extras["pos_relaxed"]
    interp = batch.pos * factor + (1.0 - factor) * pos_relaxed + noise
    movable = (batch.extras["tags"] > 0) & batch.node_mask & pick_nodes
    new_pos = jnp.where(movable[:, None], interp, batch.pos)
    return dataclasses.replace(batch, pos=new_pos)


def aux_weight_schedule(step, total_steps: int, max_weight: float, min_weight: float = 1.0):
    """Linear decay max_weight -> min_weight over training."""
    rng_range = max(0.0, max_weight - min_weight)
    frac = jnp.minimum(1.0, step / max(total_steps, 1))
    return max_weight - rng_range * frac


def make_oc20_steps(
    model,
    optimizer: optax.GradientTransformation,
    target_mean: float = 0.0,
    target_std: float = 1.0,
    positions_std: float = 1.0,
    use_auxiliary_task: bool = False,
    auxiliary_task_weight: float = 15.0,
    total_steps: int = 1,
    use_noisy_nodes: bool = False,
    loss_type: str = "l1",
    ema_decay: Optional[float] = 0.999,
    pmean_axis: Optional[str] = None,
):
    def _per(err):
        return jnp.abs(err) if loss_type == "l1" else err * err

    def full_loss(params, batch: GraphsTuple, rng, step):
        r_aug, r_drop = jax.random.split(rng)
        if use_noisy_nodes:
            batch = interpolate_init_relaxed_pos(batch, r_aug)
        out = model.apply(
            params, batch, deterministic=False, rngs={"dropout": r_drop}
        )
        energy, aux_pos = (out if use_auxiliary_task else (out, None))
        target = (batch.y - target_mean) / target_std
        loss_e = masked_mean(_per(energy - target), batch.graph_mask)
        mae = masked_mean(jnp.abs(energy - target) * target_std, batch.graph_mask)
        loss = loss_e
        metrics = {"loss_e": loss_e, "mae": mae}
        if use_auxiliary_task:
            # note: the delta target uses the *augmented* positions, exactly
            # like the reference which noises batch.pos in place
            delta = (batch.extras["pos_relaxed"] - batch.pos) / positions_std
            tag_mask = (batch.extras["tags"] > 0) & batch.node_mask
            m3 = tag_mask[:, None] * jnp.ones_like(aux_pos)
            loss_aux = masked_mean(_per(aux_pos - delta), m3)
            w = aux_weight_schedule(
                step.astype(jnp.float32), total_steps, auxiliary_task_weight
            )
            metrics["loss_aux"] = loss_aux
            loss = loss + loss_aux * w
        return loss, metrics

    def train_step(state: TrainState, batch: GraphsTuple, rng):
        (loss, aux), grads = jax.value_and_grad(full_loss, has_aux=True)(
            state.params, batch, rng, state.step
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            aux = jax.lax.pmean(aux, pmean_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        new_state = TrainState(
            params=params, opt_state=opt_state, ema_params=ema, step=state.step + 1
        )
        metrics = dict(aux)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def eval_step(params, batch: GraphsTuple) -> Dict:
        out = model.apply(params, batch, deterministic=True)
        energy = out[0] if use_auxiliary_task else out
        pred = energy * target_std + target_mean
        err = pred - batch.y
        gm = batch.graph_mask
        return {
            "mae_sum": jnp.sum(jnp.abs(err) * gm),
            "mse_sum": jnp.sum(err * err * gm),
            "within_threshold": jnp.sum((jnp.abs(err) < 0.02) * gm),
            "count": jnp.sum(gm),
        }

    return train_step, eval_step


def with_grad_accumulation(optimizer: optax.GradientTransformation, every: int):
    """OC20 grad_accumulation_steps equivalent (base_trainer_v2.py:300-302)."""
    if every <= 1:
        return optimizer
    return optax.MultiSteps(optimizer, every_k_schedule=every)


def save_results(
    predictions: Dict[str, "list"],
    results_dir: str,
    results_file: str,
    keys=("energy",),
    name: str = "is2re",
    rank: Optional[int] = None,
    world_size: Optional[int] = None,
    timeout_s: float = 600.0,
) -> Optional[str]:
    """Write this rank's predictions and master-merge across ranks.

    The analog of BaseTrainerV2.save_results
    (reference oc20/trainer/base_trainer_oc20.py:707-757): every rank writes
    ``{name}_{results_file}_{rank}.npz`` with ids + prediction arrays; rank 0
    waits for all rank files, concatenates, dedups by id (the distributed
    sampler may repeat systems to even out shards), and writes the merged
    ``{name}_{results_file}.npz``, removing the rank files.  Synchronization
    uses file existence (no collective needed on the host side).  Returns the
    merged path on rank 0, else None.
    """
    import os
    import time

    import numpy as np

    if rank is None:
        rank = jax.process_index()
    if world_size is None:
        world_size = jax.process_count()
    os.makedirs(results_dir, exist_ok=True)
    rank_path = os.path.join(results_dir, f"{name}_{results_file}_{rank}.npz")
    tmp = rank_path + ".tmp.npz"
    np.savez_compressed(
        tmp, ids=np.asarray(predictions["id"]),
        **{k: np.asarray(predictions[k]) for k in keys},
    )
    os.replace(tmp, rank_path)  # atomic: readers never see partial files

    if rank != 0:
        return None

    paths = [
        os.path.join(results_dir, f"{name}_{results_file}_{r}.npz")
        for r in range(world_size)
    ]
    deadline = time.time() + timeout_s
    while not all(os.path.exists(p) for p in paths):
        if time.time() > deadline:
            missing = [p for p in paths if not os.path.exists(p)]
            raise TimeoutError(f"save_results: missing rank files {missing}")
        time.sleep(0.5)

    gathered = {"ids": []}
    for k in keys:
        gathered[k] = []
    for p in paths:
        with np.load(p, allow_pickle=True) as data:
            gathered["ids"].extend(data["ids"].tolist())
            for k in keys:
                gathered[k].extend(data[k].tolist())
    ids = np.array(gathered["ids"])
    _, idx = np.unique(ids, return_index=True)
    merged = {"ids": ids[idx]}
    for k in keys:
        arr = np.array(gathered[k])
        if k == "forces":
            merged[k] = np.concatenate(arr[idx])
        elif k == "chunk_idx":
            merged[k] = np.cumsum(arr[idx])[:-1]
        else:
            merged[k] = arr[idx]
    full_path = os.path.join(results_dir, f"{name}_{results_file}.npz")
    np.savez_compressed(full_path, **merged)
    for p in paths:
        os.remove(p)
    return full_path
