"""OC20 IS2RE models with periodic boundary conditions.

Reference /root/reference/nets/graph_attention_transformer_oc20.py:74-386 and
dp_attention_transformer_oc20.py:75-347.  Differences from the QM9 trunk:
on-the-fly PBC radius graph with per-atom nearest-``max_neighbors`` capping,
tag embedding (sub-surface / surface / adsorbate), optional per-edge atom-type
scalar attributes concatenated to the RBF, scalars-only output dropout and
energy head, optional IS2RS auxiliary position head (1x1e GraphAttention) and
the single-attention-head variant predicting energy+Δpos jointly.

Expected GraphsTuple extras: 'tags' [N] int, 'cell' [G, 3, 3] float.
Batch must be collated with ``collate_dense`` (fixed per-graph slots).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.irreps import Irrep, Irreps
from ..core.spherical import spherical_harmonics_for_irreps
from ..graph.batching import GraphsTuple
from ..graph.pbc import pbc_edge_vectors, radius_graph_pbc, radius_graph_topk
from ..graph.radius_graph import edge_vectors
from ..graph.segment import scaled_scatter_sum
from ..nn.activation import Activation
from ..nn.dropout import EquivariantScalarsDropout
from ..nn.linear import IrrepsLinear
from ..nn.norms import get_norm_layer
from ..nn.radial import GaussianRadialBasis, RadialProfile
from ..nn.tp_modules import EdgeDegreeEmbedding, NodeEmbedding, _radial_fold_enabled
from .equiformer import (
    GraphAttention,
    TransBlock,
    _attn_radial_width,
    _batch_radial_enabled,
)
from .registry import register_model

_MAX_ATOM_TYPE = 84
_NUM_TAGS = 3
# IS2RE statistics (reference :61-66)
_AVG_NUM_NODES = 77.81317
_AVG_DEGREE = 23.395238876342773


class GraphAttentionTransformerOC20(nn.Module):
    irreps_node_embedding: Irreps = Irreps("256x0e+128x1e")
    num_layers: int = 6
    irreps_node_attr: Irreps = Irreps("1x0e")
    use_node_attr: bool = False
    irreps_sh: Irreps = Irreps("1x0e+1x1e")
    max_radius: float = 6.0
    number_of_basis: int = 128
    fc_neurons: Tuple[int, ...] = (64, 64)
    use_atom_edge_attr: bool = False
    irreps_atom_edge_attr: Irreps = Irreps("8x0e")
    irreps_feature: Irreps = Irreps("512x0e")
    irreps_head: Irreps = Irreps("32x0e+16x1e")
    num_heads: int = 8
    irreps_pre_attn: Optional[Irreps] = None
    rescale_degree: bool = False
    nonlinear_message: bool = False
    irreps_mlp_mid: Irreps = Irreps("768x0e+384x1e")
    norm_layer: str = "layer"
    alpha_drop: float = 0.2
    proj_drop: float = 0.0
    out_drop: float = 0.0
    drop_path_rate: float = 0.0
    use_auxiliary_task: bool = False
    auxiliary_head_dropout: bool = True
    use_attention_head: bool = False
    use_pbc: bool = True
    max_neighbors: int = 50
    pbc_n_rep: int = 1
    max_atom_type: int = _MAX_ATOM_TYPE
    num_tags: int = _NUM_TAGS
    avg_num_nodes: float = _AVG_NUM_NODES
    avg_degree: float = _AVG_DEGREE
    attn_type: str = "mlp"
    higher_order_grads: bool = False  # IS2RE never differentiates through pos
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'; graph/SH/RBF stay fp32
    remat: bool = False

    @nn.compact
    def __call__(self, graphs: GraphsTuple, deterministic: bool = True):
        pos = graphs.pos
        batch = graphs.batch
        node_mask = graphs.node_mask
        num_graphs = graphs.graph_mask.shape[0]
        num_nodes = pos.shape[0]

        if self.use_pbc:
            pbc = radius_graph_pbc(
                pos, graphs.extras["cell"], node_mask, num_graphs,
                self.max_radius, self.max_neighbors, self.pbc_n_rep,
            )
            edges = pbc.edges
            edge_vec, edge_len = pbc_edge_vectors(pos, pbc)
        else:
            edges = radius_graph_topk(
                pos, node_mask, num_graphs, self.max_radius, self.max_neighbors
            )
            edge_vec, edge_len = edge_vectors(pos, edges)
        edge_sh = spherical_harmonics_for_irreps(Irreps(self.irreps_sh), edge_vec)

        # geometry (PBC graph, SH, RBF) in the position dtype (fp32); network
        # features optionally run in a lower compute dtype (bf16), matching
        # the reference's AMP training (engine.py:58-81)
        feat_dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else pos.dtype
        edge_sh = edge_sh.astype(feat_dtype)

        emb_irreps = Irreps(self.irreps_node_embedding)
        atom_emb, _ = NodeEmbedding(emb_irreps, self.max_atom_type, name="atom_embed")(
            graphs.species, dtype=feat_dtype
        )
        tag_emb, _ = NodeEmbedding(emb_irreps, self.num_tags, name="tag_embed")(
            graphs.extras["tags"], dtype=feat_dtype
        )
        edge_scalars = GaussianRadialBasis(
            num_basis=self.number_of_basis, cutoff=self.max_radius, name="rbf"
        )(edge_len).astype(feat_dtype)
        if self.use_atom_edge_attr:
            ae = Irreps(self.irreps_atom_edge_attr)
            src_attr, _ = NodeEmbedding(ae, self.max_atom_type, name="edge_src_embed")(
                graphs.species, dtype=feat_dtype
            )
            dst_attr, _ = NodeEmbedding(ae, self.max_atom_type, name="edge_dst_embed")(
                graphs.species, dtype=feat_dtype
            )
            edge_scalars = jnp.concatenate(
                [src_attr[edges.src], dst_attr[edges.dst], edge_scalars], axis=-1
            )
            fc = (2 * ae.dim + self.number_of_basis,) + tuple(self.fc_neurons)
        else:
            fc = (self.number_of_basis,) + tuple(self.fc_neurons)

        edge_deg = EdgeDegreeEmbedding(
            emb_irreps, Irreps(self.irreps_sh), fc, self.avg_degree,
            higher_order_grads=self.higher_order_grads,
            name="edge_deg_embed",
        )(edge_sh, edge_scalars, edges.src, edges.dst, edges.mask, num_nodes)
        node_features = atom_emb + tag_emb + edge_deg

        if self.use_node_attr:
            node_attr, _ = NodeEmbedding(
                Irreps(self.irreps_node_attr), self.max_atom_type, name="attr_embed"
            )(graphs.species, dtype=feat_dtype)
        else:
            node_attr = jnp.ones((num_nodes, 1), feat_dtype)

        # batched-radial A/B (models/equiformer._batch_radial_enabled): one
        # stacked pass computes every block's attention radial-MLP weights
        ws_radial = None
        if (
            _batch_radial_enabled()
            and self.attn_type == "mlp"
            and self.num_layers > 1
            and not _radial_fold_enabled()
        ):
            pre = (
                Irreps(self.irreps_pre_attn)
                if self.irreps_pre_attn
                else emb_irreps
            )
            width = _attn_radial_width(
                pre, Irreps(self.irreps_sh), Irreps(self.irreps_head),
                self.num_heads, self.nonlinear_message,
            )
            RadialStack = nn.vmap(
                RadialProfile,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=None,
                out_axes=0,
                axis_size=self.num_layers,
            )
            ws_radial = RadialStack(
                features=tuple(fc[1:]) + (width,), name="radial_stack"
            )(edge_scalars)  # [L, E, width]

        block_cls = TransBlock
        if self.remat:
            block_cls = nn.remat(TransBlock, static_argnums=(8, 9))
        for i in range(self.num_layers):
            out_irreps = (
                Irreps(self.irreps_feature)
                if i == self.num_layers - 1
                else emb_irreps
            )
            node_features = block_cls(
                irreps_node_input=emb_irreps,
                irreps_node_attr=Irreps(self.irreps_node_attr),
                irreps_edge_attr=Irreps(self.irreps_sh),
                irreps_node_output=out_irreps,
                fc_neurons=fc,
                irreps_head=Irreps(self.irreps_head),
                num_heads=self.num_heads,
                irreps_pre_attn=self.irreps_pre_attn,
                rescale_degree=self.rescale_degree,
                nonlinear_message=self.nonlinear_message,
                alpha_drop=self.alpha_drop,
                proj_drop=self.proj_drop,
                drop_path_rate=self.drop_path_rate,
                irreps_mlp_mid=Irreps(self.irreps_mlp_mid),
                norm_layer=self.norm_layer,
                attn_type=self.attn_type,
                avg_degree=self.avg_degree,
                higher_order_grads=self.higher_order_grads,
                name=f"block_{i}",
            )(
                node_features, node_attr, edges, edge_sh, edge_scalars,
                batch, node_mask, num_graphs, deterministic,
                None if ws_radial is None else ws_radial[i],
            )

        feat_irreps = Irreps(self.irreps_feature)
        node_features = get_norm_layer(self.norm_layer)(feat_irreps, name="norm")(
            node_features, batch=batch, node_mask=node_mask, num_graphs=num_graphs
        )
        outputs = node_features
        if self.out_drop != 0.0:
            outputs = EquivariantScalarsDropout(feat_irreps, self.out_drop)(
                outputs, deterministic=deterministic
            )

        aux_ir = Irreps("1x1o") if Irrep.parse("1o") in feat_irreps else Irreps("1x1e")

        if self.use_attention_head:
            head_out = Irreps("1x0e") + aux_ir if self.use_auxiliary_task else Irreps("1x0e")
            skip = IrrepsLinear(feat_irreps, head_out, name="head_skip_connect")(outputs)
            out = GraphAttention(
                irreps_node_input=feat_irreps,
                irreps_node_attr=Irreps(self.irreps_node_attr),
                irreps_edge_attr=Irreps(self.irreps_sh),
                irreps_node_output=head_out,
                fc_neurons=fc,
                irreps_head=Irreps(self.irreps_head),
                num_heads=self.num_heads,
                irreps_pre_attn=self.irreps_pre_attn,
                rescale_degree=self.rescale_degree,
                nonlinear_message=self.nonlinear_message,
                alpha_drop=self.alpha_drop if self.auxiliary_head_dropout else 0.0,
                proj_drop=0.0,
                higher_order_grads=self.higher_order_grads,
                name="attn_head",
            )(outputs, node_attr, edges, edge_sh, edge_scalars,
              deterministic=deterministic)
            out = (out + skip).astype(pos.dtype)  # accumulate readout in fp32
            if self.use_auxiliary_task:
                energy_nodes = out[:, 0:1]
                aux = out[:, 1:4]
                energy = scaled_scatter_sum(
                    energy_nodes, batch, num_graphs, self.avg_num_nodes, mask=node_mask
                , sorted=True)[:, 0]
                return energy, aux
            energy = scaled_scatter_sum(
                out, batch, num_graphs, self.avg_num_nodes, mask=node_mask
            , sorted=True)[:, 0]
            return energy

        # scalars-only FFN energy head (:175-178)
        feat_scalars = feat_irreps.filter_scalars_even()
        x = IrrepsLinear(feat_irreps, feat_scalars, name="head_lin1")(outputs)
        x = Activation(feat_scalars, ["silu"])(x)
        x = IrrepsLinear(feat_scalars, Irreps("1x0e"), name="head_lin2")(x)
        x = x.astype(pos.dtype)  # accumulate the readout in fp32
        energy = scaled_scatter_sum(
            x, batch, num_graphs, self.avg_num_nodes, mask=node_mask
        , sorted=True)[:, 0]

        if self.use_auxiliary_task:
            aux = GraphAttention(
                irreps_node_input=feat_irreps,
                irreps_node_attr=Irreps(self.irreps_node_attr),
                irreps_edge_attr=Irreps(self.irreps_sh),
                irreps_node_output=aux_ir,
                fc_neurons=fc,
                irreps_head=Irreps(self.irreps_head),
                num_heads=self.num_heads,
                irreps_pre_attn=self.irreps_pre_attn,
                rescale_degree=self.rescale_degree,
                nonlinear_message=self.nonlinear_message,
                alpha_drop=self.alpha_drop if self.auxiliary_head_dropout else 0.0,
                proj_drop=0.0,
                higher_order_grads=self.higher_order_grads,
                name="auxiliary_head",
            )(node_features, node_attr, edges, edge_sh, edge_scalars,
              deterministic=deterministic)
            return energy, aux.astype(pos.dtype)
        return energy


@register_model
def graph_attention_transformer_oc20(**kwargs):
    """OCP-registry name 'graph_attention_transformer' (reference :73)."""
    return GraphAttentionTransformerOC20(**kwargs)


@register_model
def dp_attention_transformer_oc20(**kwargs):
    """OCP-registry name 'dp_attention_transformer' (dp_attention_transformer_oc20.py:74)."""
    return GraphAttentionTransformerOC20(attn_type="dot", **kwargs)
