"""Head reshaping helpers for equivariant multi-head attention.

Equivalent of Vec2AttnHeads / AttnHeads2Vec
(graph_attention_transformer.py:251-316): flat irreps features with per-block
multiplicity mul*num_heads are reshaped to [N, heads, irreps_head.dim] and
back.  Pure reshapes — XLA fuses them away.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.irreps import Irreps


def vec2heads(irreps_head: Irreps, num_heads: int, x: jnp.ndarray) -> jnp.ndarray:
    """[N, sum(mul*H*dim)] -> [N, H, irreps_head.dim] (component-major blocks).

    Flat block layout is [d, H*mul] with heads major in the lane axis; each
    head keeps its copies contiguous: [d, H, mul] -> [H, d, mul].
    """
    pieces = []
    i = 0
    for mul, ir in irreps_head:
        size = mul * ir.dim * num_heads
        blk = x[..., i : i + size]
        blk = blk.reshape(blk.shape[:-1] + (ir.dim, num_heads, mul))
        blk = jnp.swapaxes(blk, -3, -2)  # [..., H, d, mul]
        pieces.append(blk.reshape(blk.shape[:-2] + (ir.dim * mul,)))
        i += size
    return jnp.concatenate(pieces, axis=-1)


def heads2vec(irreps_head: Irreps, x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, irreps_head.dim] -> [N, H*irreps_head.dim] (inverse of vec2heads)."""
    pieces = []
    i = 0
    H = x.shape[-2]
    for mul, ir in irreps_head:
        size = mul * ir.dim
        blk = x[..., i : i + size]
        blk = blk.reshape(blk.shape[:-1] + (ir.dim, mul))  # [..., H, d, mul]
        blk = jnp.swapaxes(blk, -3, -2)  # [..., d, H, mul]
        pieces.append(blk.reshape(blk.shape[:-3] + (ir.dim * H * mul,)))
        i += size
    return jnp.concatenate(pieces, axis=-1)


def heads_irreps(irreps_head: Irreps, num_heads: int) -> Irreps:
    """Flat irreps corresponding to num_heads stacked heads, sorted+simplified
    the way the reference builds irreps_attn_heads
    (graph_attention_transformer.py:434-436)."""
    irr = Irreps(irreps_head) * num_heads
    irr, _, _ = irr.sort_even_first()
    return irr.simplify()
