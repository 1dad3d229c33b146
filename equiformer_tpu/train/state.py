"""Train state pytree: params, optimizer state, EMA, step counter."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation, use_ema=True):
        import jax.numpy as jnp

        # EMA starts as a *copy* so params and ema never alias the same
        # device buffers (donation in jitted steps requires distinct buffers).
        ema = (
            jax.tree_util.tree_map(lambda x: jnp.array(x), params) if use_ema else None
        )
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            ema_params=ema,
            step=jnp.zeros((), jnp.int32),
        )
