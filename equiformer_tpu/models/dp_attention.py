"""Dot-product attention ablation variant (reference dp_attention_transformer.py).

q from a linear on destination nodes, k/v from one SeparableFCTP on edges;
attention logits are the full invariant inner product <q[dst], k> scaled by
1/sqrt(num_irreps * ir.dim) per component (ScaleFactor, :48-66).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.irreps import Irreps
from ..graph.radius_graph import EdgeList
from ..graph.segment import (
    active_edge_bound,
    degree,
    gather_add,
)
from ..nn.attention_utils import heads2vec, softmax_dropout_combine, vec2heads
from ..nn.dropout import EquivariantDropout
from ..nn.linear import IrrepsLinear
from ..nn.tp_modules import SeparableFCTP


def scale_factor(irreps_head: Irreps, x: jnp.ndarray) -> jnp.ndarray:
    """Per-block scaling 1/sqrt(num_irreps * ir.dim) on [., H, head_dim]."""
    irreps_head = Irreps(irreps_head)
    cn = 1.0 / (irreps_head.num_irreps ** 0.5)
    pieces = []
    i = 0
    for mul, ir in irreps_head:
        blk = x[..., i : i + mul * ir.dim]
        pieces.append(blk * (cn / (ir.dim ** 0.5)))
        i += mul * ir.dim
    return jnp.concatenate(pieces, axis=-1)


class DotProductAttention(nn.Module):
    irreps_node_input: Irreps
    irreps_node_attr: Irreps
    irreps_edge_attr: Irreps
    irreps_node_output: Irreps
    fc_neurons: Optional[Tuple[int, ...]]
    irreps_head: Irreps
    num_heads: int
    irreps_pre_attn: Optional[Irreps] = None
    rescale_degree: bool = False
    avg_degree: float = 1.0
    alpha_drop: float = 0.1
    proj_drop: float = 0.1
    higher_order_grads: bool = True

    def setup(self):
        irreps_in = Irreps(self.irreps_node_input)
        pre = Irreps(self.irreps_pre_attn) if self.irreps_pre_attn else irreps_in
        head = Irreps(self.irreps_head)
        H = self.num_heads
        attn_heads = (head * H).sort()[0].simplify()
        kv_heads = (head * (H * 2)).sort()[0].simplify()
        self.query = IrrepsLinear(irreps_in, attn_heads, name="query")
        self.merge_src = IrrepsLinear(irreps_in, pre, use_bias=True, name="merge_src")
        self.merge_dst = IrrepsLinear(irreps_in, pre, use_bias=False, name="merge_dst")
        self.key_value = SeparableFCTP(
            pre, Irreps(self.irreps_edge_attr), kv_heads,
            fc_neurons=self.fc_neurons, use_activation=False,
            norm_layer=None, internal_weights=False, name="key_value",
        )
        self.proj = IrrepsLinear(attn_heads, Irreps(self.irreps_node_output), name="proj")
        if self.proj_drop != 0.0:
            self.proj_dropout = EquivariantDropout(
                Irreps(self.irreps_node_output), self.proj_drop
            )

    def __call__(
        self, node_input, node_attr, edges: EdgeList, edge_attr, edge_scalars,
        deterministic: bool = True,
    ):
        num_nodes = node_input.shape[0]
        head = Irreps(self.irreps_head)
        H = self.num_heads

        q = self.query(node_input)
        q = vec2heads(head, H, q)
        q = scale_factor(head, q)

        kv = gather_add(
            self.merge_src(node_input), self.merge_dst(node_input),
            edges.src, edges.dst, num_nodes, rev=edges.rev,
            higher_order=self.higher_order_grads,
        )
        kv = self.key_value(kv, edge_attr=edge_attr, edge_scalars=edge_scalars,
                            n_edges=active_edge_bound(edges.mask))
        kv = vec2heads(head, 2 * H, kv)  # [E, 2H, head_dim]
        k = kv[:, :H, :]
        v = kv[:, H:, :]

        from ..graph.linear_prims import take_rows

        q_e = take_rows(q, edges.dst, t_ids=edges.dst, t_sorted=True)
        alpha = jnp.einsum("ehk,ehk->eh", q_e, k)
        attn = softmax_dropout_combine(
            self, alpha, v, edges, num_nodes, self.alpha_drop,
            deterministic, self.higher_order_grads,
        )
        attn = heads2vec(head, attn)

        if self.rescale_degree:
            deg = degree(edges.dst, num_nodes, mask=edges.mask, dtype=attn.dtype, sorted=True)
            attn = attn * deg[:, None] / self.avg_degree

        out = self.proj(attn)
        if self.proj_drop != 0.0:
            out = self.proj_dropout(out, deterministic=deterministic)
        return out
