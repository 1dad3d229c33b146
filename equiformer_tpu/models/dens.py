"""Equiformer + DeNS (Denoising Non-Equilibrium Structures) for MD17.

Reference /root/reference/nets/equiformer_md17_dens.py:55-355 and the noise
augmentation/loss in main_md17_dens.py:389-403,514-548.  Differences from the
plain MD17 model: a force-encoding embedding (SH of the force direction scaled
by |F|/sqrt(3), only on corrupted atoms), an equivariant wide ``irreps_feature``,
a scalars-only energy head, and a GraphAttention denoising head predicting the
noise vector (1x1e) on corrupted atoms.

TPU-native formulation: the module returns (energy, denoising_vectors); forces
come from a ``jax.vjp`` against positions with a zero cotangent on the
denoising output, so the trunk runs once.  Noise augmentation is a pure
on-device function, so the radius graph is rebuilt from noised positions
inside the same jitted step (matching the reference order of operations).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.irreps import Irreps
from ..core.spherical import spherical_harmonics_for_irreps
from ..graph.batching import GraphsTuple
from ..graph.radius_graph import (
    edge_vectors,
    radius_graph,
    radius_graph_dense,
    reverse_edge_perm_dense,
)
from ..graph.segment import scaled_scatter_sum
from ..nn.activation import Activation
from ..nn.dropout import EquivariantDropout
from ..nn.linear import IrrepsLinear
from ..nn.norms import get_norm_layer
from ..nn.radial import make_rbf
from ..nn.tp_modules import EdgeDegreeEmbedding, NodeEmbedding
from .equiformer import GraphAttention, TransBlock, _AVG_DEGREE, _AVG_NUM_NODES
from .registry import register_model


class EquiformerDeNS(nn.Module):
    irreps_equivariant_inputs: Irreps = Irreps("1x0e+1x1e+1x2e")
    irreps_node_embedding: Irreps = Irreps("128x0e+64x1e+32x2e")
    num_layers: int = 6
    irreps_node_attr: Irreps = Irreps("1x0e")
    irreps_sh: Irreps = Irreps("1x0e+1x1e+1x2e")
    max_radius: float = 5.0
    number_of_basis: int = 32
    basis_type: str = "exp"
    fc_neurons: Tuple[int, ...] = (64, 64)
    irreps_feature: Irreps = Irreps("512x0e+256x1e+128x2e")
    irreps_head: Irreps = Irreps("32x0e+16x1e+8x2e")
    num_heads: int = 4
    irreps_pre_attn: Optional[Irreps] = Irreps("128x0e+64x1e+32x2e")
    rescale_degree: bool = False
    nonlinear_message: bool = True
    irreps_mlp_mid: Irreps = Irreps("128x0e+64x1e+32x2e")
    norm_layer: str = "layer"
    alpha_drop: float = 0.0
    proj_drop: float = 0.0
    out_drop: float = 0.0
    drop_path_rate: float = 0.0
    max_atom_type: int = 64
    avg_num_nodes: float = _AVG_NUM_NODES
    avg_degree: float = _AVG_DEGREE
    max_edges: int = 8192
    use_force_encoding: bool = True
    nodes_per_graph: int = 0  # >0: collate_dense layout, fast per-graph build
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'; geometry stays fp32

    @nn.compact
    def __call__(self, graphs: GraphsTuple, deterministic: bool = True):
        """Returns (energy [G], denoising_pos [N, 3])."""
        pos = graphs.pos
        batch = graphs.batch
        node_mask = graphs.node_mask
        num_graphs = graphs.graph_mask.shape[0]
        num_nodes = pos.shape[0]

        if self.nodes_per_graph > 0:
            n_g = pos.shape[0] // self.nodes_per_graph
            edges = radius_graph_dense(
                pos, node_mask, n_g, self.max_radius, self.max_edges
            )
            edges = edges._replace(
                rev=reverse_edge_perm_dense(edges, n_g, self.nodes_per_graph)
            )
        else:
            edges = radius_graph(pos, batch, node_mask, self.max_radius, self.max_edges)
        edge_vec, edge_len = edge_vectors(pos, edges)
        edge_sh = spherical_harmonics_for_irreps(Irreps(self.irreps_sh), edge_vec)
        feat_dtype = (
            jnp.dtype(self.compute_dtype) if self.compute_dtype else pos.dtype
        )
        edge_sh = edge_sh.astype(feat_dtype)

        atom_emb, _ = NodeEmbedding(
            Irreps(self.irreps_node_embedding), self.max_atom_type, name="atom_embed"
        )(graphs.species, dtype=feat_dtype)
        rbf = make_rbf(self.basis_type, self.number_of_basis, self.max_radius)
        edge_scalars = rbf(edge_len).astype(feat_dtype)
        fc = (self.number_of_basis,) + tuple(self.fc_neurons)
        edge_deg = EdgeDegreeEmbedding(
            Irreps(self.irreps_node_embedding), Irreps(self.irreps_sh),
            fc, self.avg_degree, name="edge_deg_embed",
        )(edge_sh, edge_scalars, edges.src, edges.dst, edges.mask, num_nodes)
        node_features = atom_emb + edge_deg
        node_attr = jnp.ones((num_nodes, 1), feat_dtype)

        # force encoding on corrupted atoms (equiformer_md17_dens.py:274-294)
        eq_in = Irreps(self.irreps_equivariant_inputs)
        force = graphs.extras.get("force")
        if force is not None and self.use_force_encoding:
            noise_mask = graphs.extras["noise_mask"]
            force_sh = spherical_harmonics_for_irreps(eq_in, force)
            force_sh = jnp.where(noise_mask[:, None], force_sh, 0.0)
            force_norm = jnp.linalg.norm(
                jnp.where(noise_mask[:, None], force, 0.0), axis=-1, keepdims=True
            ) / math.sqrt(3.0)
            force_sh = force_sh * force_norm
        else:
            force_sh = jnp.zeros((num_nodes, eq_in.dim), pos.dtype)
        node_features = node_features + IrrepsLinear(
            eq_in, Irreps(self.irreps_node_embedding), name="force_embed"
        )(force_sh.astype(feat_dtype))

        for i in range(self.num_layers):
            out_irreps = (
                Irreps(self.irreps_feature)
                if i == self.num_layers - 1
                else Irreps(self.irreps_node_embedding)
            )
            node_features = TransBlock(
                irreps_node_input=Irreps(self.irreps_node_embedding),
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
                name=f"block_{i}",
            )(
                node_features, node_attr, edges, edge_sh, edge_scalars,
                batch, node_mask, num_graphs, deterministic,
            )

        feat_irreps = Irreps(self.irreps_feature)
        node_features = get_norm_layer(self.norm_layer)(feat_irreps, name="norm")(
            node_features, batch=batch, node_mask=node_mask, num_graphs=num_graphs
        )
        if self.out_drop != 0.0:
            node_features = EquivariantDropout(feat_irreps, self.out_drop)(
                node_features, deterministic=deterministic
            )

        # scalars-only energy head (:144-154)
        feat_scalars = feat_irreps.filter_scalars_even()
        x = IrrepsLinear(feat_irreps, feat_scalars, name="energy_lin1")(node_features)
        x = Activation(feat_scalars, ["silu"])(x)
        x = IrrepsLinear(feat_scalars, Irreps("1x0e"), name="energy_lin2")(x)
        x = x.astype(pos.dtype)  # accumulate the readout in fp32
        if not self.use_force_encoding and "denoising_pos_mask" in graphs.extras:
            # ablation: no denoising-energy prediction (:313-315)
            x = jnp.where(graphs.extras["denoising_pos_mask"][:, None], 0.0, x)
        energy = scaled_scatter_sum(
            x, batch, num_graphs, self.avg_num_nodes, mask=node_mask
        , sorted=True)[:, 0]

        # denoising position head (:157-173): parity follows the inputs irreps
        out_ir = "1x1e" if ("1e" in [str(mi.ir) for mi in eq_in]) else "1x1o"
        denoising_pos = GraphAttention(
            irreps_node_input=feat_irreps,
            irreps_node_attr=Irreps(self.irreps_node_attr),
            irreps_edge_attr=Irreps(self.irreps_sh),
            irreps_node_output=Irreps(out_ir),
            fc_neurons=fc,
            irreps_head=Irreps(self.irreps_head),
            num_heads=self.num_heads,
            irreps_pre_attn=self.irreps_pre_attn,
            rescale_degree=self.rescale_degree,
            nonlinear_message=self.nonlinear_message,
            alpha_drop=self.alpha_drop,
            proj_drop=self.proj_drop,
            name="denoising_pos_head",
        )(node_features, node_attr, edges, edge_sh, edge_scalars,
          deterministic=deterministic)
        return energy, denoising_pos.astype(pos.dtype)


def dens_outputs(
    model, variables, graphs: GraphsTuple, rngs=None, deterministic: bool = True
):
    """(energy [G], outputs_dy [N,3]) where outputs_dy mixes -dE/dpos on clean
    atoms and the denoising prediction on corrupted atoms (:331-352)."""

    def f(pos):
        b = dataclasses.replace(graphs, pos=pos)
        kwargs = {"rngs": rngs} if rngs else {}
        return model.apply(variables, b, deterministic=deterministic, **kwargs)

    (energy, denoise), vjp_fn = jax.vjp(f, graphs.pos)
    (neg_f,) = vjp_fn((jnp.ones_like(energy), jnp.zeros_like(denoise)))
    forces = jnp.where(graphs.node_mask[:, None], -neg_f, 0.0)

    noise_mask = graphs.extras.get("noise_mask")
    if noise_mask is None:
        return energy, forces
    outputs_dy = jnp.where(noise_mask[:, None], denoise, forces)
    if not model.use_force_encoding:
        dpm = graphs.extras["denoising_pos_mask"]
        outputs_dy = jnp.where(dpm[:, None], 0.0, outputs_dy)
    return energy, outputs_dy


def add_masked_gaussian_noise(
    graphs: GraphsTuple,
    rng,
    std: float,
    prob: float,
    corrupt_ratio: Optional[float] = None,
):
    """Pure on-device DeNS noise augmentation (main_md17_dens.py:514-548).

    Adds to extras: 'force' (true forces, zeroed on uncorrupted atoms),
    'noise_mask', 'denoising_pos_mask', 'noise_vec'; perturbs positions on
    corrupted atoms.  Edges are rebuilt from the noised positions inside the
    model forward.
    """
    num_graphs = graphs.graph_mask.shape[0]
    r1, r2, r3 = jax.random.split(rng, 3)
    graph_pick = jax.random.uniform(r1, (num_graphs,)) < prob
    denoising_pos_mask = graph_pick[graphs.batch] & graphs.node_mask
    noise_mask = denoising_pos_mask
    if corrupt_ratio is not None:
        corrupt = jax.random.uniform(r2, graphs.batch.shape) < corrupt_ratio
        noise_mask = noise_mask & corrupt
    force = jnp.where(noise_mask[:, None], graphs.forces, 0.0)
    noise_vec = jax.random.normal(r3, graphs.pos.shape, graphs.pos.dtype) * std
    pos = graphs.pos + jnp.where(noise_mask[:, None], noise_vec, 0.0)
    extras = dict(graphs.extras)
    extras.update(
        force=force,
        noise_mask=noise_mask,
        denoising_pos_mask=denoising_pos_mask,
        noise_vec=noise_vec,
    )
    return dataclasses.replace(graphs, pos=pos, extras=extras)


@register_model
def equiformer_md17_dens(**kwargs):
    return EquiformerDeNS(**kwargs)
