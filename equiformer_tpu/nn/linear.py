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
    """Equivariant linear: mixes multiplicities within each irrep (l, p).

    setup-style so fused kernels (kernels/dtp_lin_pallas.py) can read the raw
    weights via :meth:`weight_list` and apply the bias via :meth:`add_bias`
    without materializing this layer's input.
    """

    irreps_in: Irreps
    irreps_out: Irreps
    use_bias: bool = True
    weight_init_scale: float = 1.0  # e.g. sqrt(max_atom_type) for NodeEmbedding
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        in_slices = irreps_in.slices()
        blocks_per_out = []
        ws = {}
        bs = {}
        for oi, (mul_out, ir_out) in enumerate(irreps_out):
            blocks = [
                (in_slices[ii], ir_in.dim, mul_in)
                for ii, (mul_in, ir_in) in enumerate(irreps_in)
                if ir_in == ir_out
            ]
            blocks_per_out.append(blocks)
            if blocks:
                fan_in = sum(m for _, _, m in blocks)
                std = self.weight_init_scale / np.sqrt(fan_in)
                ws[oi] = self.param(
                    f"w{oi}",
                    nn.initializers.normal(stddev=std),
                    (fan_in, mul_out),
                    self.param_dtype,
                )
            if self.use_bias and ir_out.is_scalar():
                bs[oi] = self.param(
                    f"b{oi}", nn.initializers.zeros, (mul_out,), self.param_dtype
                )
        self._blocks_per_out = blocks_per_out
        self._ws = ws
        self._bs = bs

    def weight_list(self):
        """Per-output-block weights ([fan_in, mul_out] or None), in
        irreps_out order — the layout fused kernels pack from."""
        n = len(Irreps(self.irreps_out))
        return [self._ws.get(oi) for oi in range(n)]

    def add_bias(self, y: jnp.ndarray) -> jnp.ndarray:
        """Add this layer's scalar biases to an output laid out like
        ``__call__``'s result (used after a fused kernel produced it)."""
        if not self._bs:
            return y
        irreps_out = Irreps(self.irreps_out)
        out_slices = irreps_out.slices()
        for oi, b in self._bs.items():
            sl = out_slices[oi]
            y = y.at[..., sl].add(
                jnp.tile(b.astype(y.dtype), irreps_out[oi].ir.dim)
            )
        return y

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps_out = Irreps(self.irreps_out)
        pieces = []
        for oi, (mul_out, ir_out) in enumerate(irreps_out):
            # gather all input blocks of the same irrep (component-major
            # [..., d, mul] views; the concat is on the lane/mul axis)
            blocks = [
                x[..., sl].reshape(x.shape[:-1] + (d, mul_in))
                for sl, d, mul_in in self._blocks_per_out[oi]
            ]
            if blocks:
                inp = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=-1)
                w = self._ws[oi]
                out = jnp.einsum("...iu,uw->...iw", inp, w.astype(x.dtype))
            else:
                out = jnp.zeros(x.shape[:-1] + (ir_out.dim, mul_out), x.dtype)
            if oi in self._bs:
                out = out + self._bs[oi].astype(x.dtype)
            pieces.append(out.reshape(out.shape[:-2] + (mul_out * ir_out.dim,)))
        return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]


class ScalarMLP(nn.Module):
    """Plain scalar MLP: Linear -> (LayerNorm) -> SiLU stacks, used for radial
    profiles and scalar heads.  See radial.py for the RadialProfile wrapper."""

    features: Tuple[int, ...]
    use_layer_norm: bool = True
    final_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32
    fold_final: bool = False  # return (hidden, final kernel) instead of out

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        n = len(self.features)
        compute_dtype = x.dtype  # keep the input precision (bf16-friendly)
        for i, f in enumerate(self.features):
            last = i == n - 1
            dense = nn.Dense(
                f,
                use_bias=(not last) or self.final_bias,
                kernel_init=_torch_linear_init,
                bias_init=_torch_bias_init,
                param_dtype=self.param_dtype,
                dtype=compute_dtype,
                name=f"dense{i}",
            )
            if last and self.fold_final:
                # extract the final kernel without applying it per row: the
                # bias-free Dense maps the identity to its kernel (params and
                # gradients identical to the unfolded path); callers fold the
                # [fan, features[-1]] matrix into a fused kernel instead of
                # materializing the per-edge output
                assert not self.final_bias, "fold_final requires bias-free final"
                fan = self.features[-2] if n > 1 else x.shape[-1]
                kernel = dense(jnp.eye(fan, dtype=compute_dtype))
                return x, kernel
            x = dense(x)
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
