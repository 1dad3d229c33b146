"""Jitted training/eval steps for scalar-property (QM9-style) training.

Equivalent of the reference engine (engine.py:30-141): normalized-target L1/L2
loss, AdamW update, EMA, MAE metrics — all fused into one compiled step.
Masked means over the padded graph slots replace variable-size batches.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..graph.batching import GraphsTuple
from .optim import ema_update
from .state import TrainState


def masked_mean(x, mask):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_qm9_steps(
    model,
    optimizer: optax.GradientTransformation,
    task_mean: float = 0.0,
    task_std: float = 1.0,
    loss_type: str = "l1",
    ema_decay: Optional[float] = 0.999,
    pmean_axis: Optional[str] = None,
):
    """Returns (train_step, eval_step), both jittable pure functions.

    ``pmean_axis``: when running under shard_map/pmap data parallelism, the
    mesh axis to pmean gradients over before the optimizer update — the DDP
    all-reduce contract (every replica applies identical updates).
    """

    def loss_fn(params, batch: GraphsTuple, rng):
        pred = model.apply(
            params, batch, deterministic=False, rngs={"dropout": rng}
        )  # [G]
        target = (batch.y - task_mean) / task_std
        err = pred - target
        if loss_type == "l1":
            per = jnp.abs(err)
        elif loss_type == "l2":
            per = err * err
        else:
            raise ValueError(loss_type)
        loss = masked_mean(per, batch.graph_mask)
        mae_denorm = masked_mean(jnp.abs(err) * task_std, batch.graph_mask)
        return loss, mae_denorm

    def train_step(state: TrainState, batch: GraphsTuple, rng) -> Tuple[TrainState, Dict]:
        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            mae = jax.lax.pmean(mae, pmean_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        new_state = TrainState(
            params=params, opt_state=opt_state, ema_params=ema, step=state.step + 1
        )
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "mae": mae, "grad_norm": gnorm}

    def eval_step(params, batch: GraphsTuple) -> Dict:
        pred = model.apply(params, batch, deterministic=True)
        err = pred * task_std + task_mean - batch.y
        mae_sum = jnp.sum(jnp.abs(err) * batch.graph_mask)
        count = jnp.sum(batch.graph_mask)
        return {"mae_sum": mae_sum, "count": count}

    return train_step, eval_step


def _l2mae(err, mask, eps=1e-12):
    """Mean over masked rows of the L2 norm of the last axis (main_md17.py
    L2MAELoss).  eps keeps the sqrt gradient finite at zero error."""
    if err.ndim == 1:
        per = jnp.abs(err)
    else:
        per = jnp.sqrt(jnp.sum(err * err, axis=-1) + eps)
    return masked_mean(per, mask)


def make_md17_steps(
    model,
    optimizer: optax.GradientTransformation,
    task_mean: float = 0.0,
    task_std: float = 1.0,
    energy_weight: float = 0.2,
    force_weight: float = 0.8,
    ema_decay: Optional[float] = 0.999,
    pmean_axis: Optional[str] = None,
):
    """Energy+force training steps (main_md17.py:349-405 semantics):
    loss = w_e * L2MAE(E_norm) + w_f * L2MAE(F / std); forces from -dE/dpos
    (double backward through the network under jax.grad)."""
    from ..models.md17_models import energy_and_forces

    def loss_fn(params, batch: GraphsTuple, rng):
        energy, forces = energy_and_forces(
            model, params, batch, rngs={"dropout": rng}, deterministic=False
        )
        e_target = (batch.y - task_mean) / task_std
        f_target = batch.forces / task_std
        loss_e = _l2mae(energy - e_target, batch.graph_mask)
        loss_f = _l2mae(forces - f_target, batch.node_mask)
        loss = energy_weight * loss_e + force_weight * loss_f
        mae_e = masked_mean(jnp.abs(energy - e_target) * task_std, batch.graph_mask)
        fmask = batch.node_mask[:, None] * jnp.ones_like(forces)
        mae_f = masked_mean(jnp.abs(forces - f_target) * task_std, fmask)
        return loss, {"loss_e": loss_e, "loss_f": loss_f, "mae_e": mae_e, "mae_f": mae_f}

    def train_step(state: TrainState, batch: GraphsTuple, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
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

    def eval_step(params, batch: GraphsTuple):
        energy, forces = energy_and_forces(model, params, batch, deterministic=True)
        e_err = energy * task_std + task_mean - batch.y
        f_err = forces * task_std - batch.forces
        fmask = batch.node_mask[:, None] * jnp.ones_like(forces)
        return {
            "mae_e_sum": jnp.sum(jnp.abs(e_err) * batch.graph_mask),
            "count_e": jnp.sum(batch.graph_mask),
            "mae_f_sum": jnp.sum(jnp.abs(f_err) * fmask),
            "count_f": jnp.sum(fmask),
        }

    return train_step, eval_step


def make_dens_steps(
    model,
    optimizer: optax.GradientTransformation,
    task_mean: float = 0.0,
    task_std: float = 1.0,
    energy_weight: float = 1.0,
    force_weight: float = 80.0,
    denoising_pos_std: float = 0.05,
    denoising_pos_prob: float = 0.5,
    corrupt_ratio: Optional[float] = None,
    ema_decay: Optional[float] = 0.999,
    pmean_axis: Optional[str] = None,
):
    """DeNS training: on-device noise augmentation + 3-term loss
    (main_md17_dens.py:380-403).  ``train_step`` takes the (possibly decayed)
    denoising weight as a scalar argument so the schedule stays host-side.
    Empty-mask loss terms contribute exactly 0 (the reference's NaN guards)."""
    from ..models.dens import add_masked_gaussian_noise, dens_outputs

    def loss_fn(params, batch: GraphsTuple, rng, dp_weight):
        r_noise, r_drop = jax.random.split(rng)
        batch = add_masked_gaussian_noise(
            batch, r_noise, std=denoising_pos_std, prob=denoising_pos_prob,
            corrupt_ratio=corrupt_ratio,
        )
        energy, outputs_dy = dens_outputs(
            model, params, batch, rngs={"dropout": r_drop}, deterministic=False
        )
        noise_mask = batch.extras["noise_mask"]
        clean_mask = batch.node_mask & (~noise_mask)
        loss_e = _l2mae(energy - (batch.y - task_mean) / task_std, batch.graph_mask)
        loss_f = _l2mae(outputs_dy - batch.forces / task_std, clean_mask)
        loss_dp = _l2mae(
            outputs_dy - batch.extras["noise_vec"] / denoising_pos_std, noise_mask
        )
        loss = energy_weight * loss_e + force_weight * loss_f + dp_weight * loss_dp
        return loss, {"loss_e": loss_e, "loss_f": loss_f, "loss_dp": loss_dp}

    def train_step(state: TrainState, batch: GraphsTuple, rng, dp_weight):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, dp_weight
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

    def eval_step(params, batch: GraphsTuple):
        energy, forces = dens_outputs(model, params, batch, deterministic=True)
        e_err = energy * task_std + task_mean - batch.y
        f_err = forces * task_std - batch.forces
        fmask = batch.node_mask[:, None] * jnp.ones_like(forces)
        return {
            "mae_e_sum": jnp.sum(jnp.abs(e_err) * batch.graph_mask),
            "count_e": jnp.sum(batch.graph_mask),
            "mae_f_sum": jnp.sum(jnp.abs(f_err) * fmask),
            "count_f": jnp.sum(fmask),
        }

    return train_step, eval_step


class AverageMeter:
    """Streaming average (engine.py:12-27 equivalent, host-side)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n=1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)
