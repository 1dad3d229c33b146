"""Optimizer factory: AdamW with reference-equivalent weight-decay masking,
cosine/multistep schedules with warmup, and model EMA.

Reference semantics (optim_factory.py:27-42,63-175 + oc20/trainer/lr_scheduler.py):
weight decay is applied only to true weights — biases, norm affine params,
mean shifts, RBF shape params are excluded; schedules step per iteration with
linear warmup.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

_NO_DECAY_LEAF = re.compile(
    r"^(bias|b\d+|affine_weight|affine_bias|mean_shift|scale)$"
)
_NO_DECAY_MODULE = re.compile(
    r"(GaussianRadialBasis|BesselRadialBasis|ExpNormalBasis)"
)


def no_weight_decay_mask(params) -> Any:
    """True where weight decay applies (optax mask convention)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decay(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        if _NO_DECAY_LEAF.match(str(keys[-1])):
            return False
        if any(_NO_DECAY_MODULE.search(str(k)) for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decay(p), params)


def cosine_warmup_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr: float = 1e-6,
    warmup_init_factor: float = 0.2,
) -> optax.Schedule:
    """Linear warmup then cosine decay to ``min_lr`` (per-iteration stepping,
    the LRScheduler/CosineLRLambda behavior)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (
            warmup_init_factor + (1 - warmup_init_factor) * step / max(warmup_steps, 1)
        )
        progress = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def multistep_warmup_schedule(
    base_lr: float, warmup_steps: int, milestones, gamma: float = 0.1,
    warmup_init_factor: float = 0.2,
) -> optax.Schedule:
    milestones = tuple(int(m) for m in milestones)

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        warm = base_lr * (
            warmup_init_factor + (1 - warmup_init_factor) * step_f / max(warmup_steps, 1)
        )
        n_passed = sum(jnp.where(step_f >= m, 1.0, 0.0) for m in milestones)
        dec = base_lr * gamma**n_passed
        return jnp.where(step_f < warmup_steps, warm, dec)

    return schedule


def create_optimizer(
    schedule: optax.Schedule,
    weight_decay: float = 5e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = None,
    opt_name: str = "adamw",
) -> optax.GradientTransformation:
    # optimizer zoo mirroring the reference timm factory
    # (optim_factory.py:63-175; ~15 optimizers, adamw default)
    if opt_name == "adamw":
        opt = optax.adamw(
            schedule, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=no_weight_decay_mask,
        )
    elif opt_name == "adam":
        opt = optax.adam(schedule, b1=beta1, b2=beta2, eps=eps)
    elif opt_name == "sgd" or opt_name == "nesterov":
        opt = optax.sgd(schedule, momentum=0.9, nesterov=True)
    elif opt_name == "momentum":
        opt = optax.sgd(schedule, momentum=0.9, nesterov=False)
    elif opt_name == "rmsprop":
        opt = optax.rmsprop(schedule, decay=0.9, eps=eps, momentum=0.9)
    elif opt_name == "adabelief":
        opt = optax.adabelief(schedule, b1=beta1, b2=beta2, eps=eps)
    elif opt_name == "radam":
        opt = optax.radam(schedule, b1=beta1, b2=beta2, eps=eps)
    elif opt_name == "lamb":
        opt = optax.lamb(
            schedule, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=no_weight_decay_mask,
        )
    elif opt_name == "lars":
        opt = optax.lars(schedule, weight_decay=weight_decay)
    elif opt_name == "fromage":
        opt = optax.fromage(schedule)
    elif opt_name == "adagrad":
        opt = optax.adagrad(schedule, eps=eps)
    elif opt_name == "adafactor":
        opt = optax.adafactor(schedule)
    elif opt_name == "novograd":
        opt = optax.novograd(schedule, b1=beta1, b2=beta2, eps=eps,
                             weight_decay=weight_decay)
    elif opt_name == "lion":
        opt = optax.lion(schedule, weight_decay=weight_decay,
                         mask=no_weight_decay_mask)
    else:
        raise ValueError(f"unknown optimizer {opt_name}")
    if grad_clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    return opt


def ema_update(ema_params, params, decay: float):
    """Model EMA (timm ModelEmaV2 equivalent)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )
