"""Irreps-wise linear layer (the reference ``LinearRS``) as per-irrep matmuls.

Reference LinearRS (tensor_product_rescale.py:165-174) realizes an equivariant
linear map as FCTP(x, ones '1x0e') — for the component-normalized CG of
l (x) 0e -> l that collapses to an independent dense matmul per degree, with
weight init N(0, 1/fan_in) (the fan-in rescale) and bias on even scalars.
On TPU this implementation maps straight onto the MXU: one [N, mul_in] x
[mul_in, mul_out] matmul per l (components folded into the batch dim).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.irreps import Irrep, Irreps


class IrrepsLinear(nn.Module):
    """Equivariant linear: mixes multiplicities within each irrep (l, p)."""

    irreps_in: Irreps
    irreps_out: Irreps
    use_bias: bool = True
    weight_init_scale: float = 1.0  # e.g. sqrt(max_atom_type) for NodeEmbedding
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        in_slices = irreps_in.slices()

        pieces = []
        for oi, (mul_out, ir_out) in enumerate(irreps_out):
            # gather all input blocks of the same irrep (component-major
            # [..., d, mul] views; the concat is on the lane/mul axis)
            blocks = []
            for ii, (mul_in, ir_in) in enumerate(irreps_in):
                if ir_in == ir_out:
                    blk = x[..., in_slices[ii]]
                    blocks.append(
                        blk.reshape(blk.shape[:-1] + (ir_in.dim, mul_in))
                    )
            if blocks:
                inp = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=-1)
                fan_in = inp.shape[-1]
                std = self.weight_init_scale / np.sqrt(fan_in)
                w = self.param(
                    f"w{oi}",
                    nn.initializers.normal(stddev=std),
                    (fan_in, mul_out),
                    self.param_dtype,
                )
                out = jnp.einsum("...iu,uw->...iw", inp, w.astype(x.dtype))
            else:
                out = jnp.zeros(x.shape[:-1] + (ir_out.dim, mul_out), x.dtype)
            if self.use_bias and ir_out.is_scalar():
                b = self.param(
                    f"b{oi}", nn.initializers.zeros, (mul_out,), self.param_dtype
                )
                out = out + b.astype(x.dtype)
            pieces.append(out.reshape(out.shape[:-2] + (mul_out * ir_out.dim,)))
        return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]


class ScalarMLP(nn.Module):
    """Plain scalar MLP: Linear -> (LayerNorm) -> SiLU stacks, used for radial
    profiles and scalar heads.  See radial.py for the RadialProfile wrapper."""

    features: Tuple[int, ...]
    use_layer_norm: bool = True
    final_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.features)
        compute_dtype = x.dtype  # keep the input precision (bf16-friendly)
        for i, f in enumerate(self.features):
            last = i == n - 1
            x = nn.Dense(
                f,
                use_bias=(not last) or self.final_bias,
                kernel_init=_torch_linear_init,
                bias_init=_torch_bias_init,
                param_dtype=self.param_dtype,
                dtype=compute_dtype,
                name=f"dense{i}",
            )(x)
            if not last:
                if self.use_layer_norm:
                    x = nn.LayerNorm(
                        param_dtype=self.param_dtype, dtype=compute_dtype,
                        name=f"ln{i}",
                    )(x)
                x = x * jnp.reciprocal(1.0 + jnp.exp(-x))  # SiLU
        return x


def _torch_linear_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import jax

    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(key, shape, dtype=jnp.float32):
    # flax passes bias shape (features,); torch uses U(-1/sqrt(fan_in), ..)
    # with fan_in of the weight; zeros is the reference's _init_weights choice
    # for model Linears (graph_attention_transformer.py:833-836).
    return jnp.zeros(shape, dtype)
