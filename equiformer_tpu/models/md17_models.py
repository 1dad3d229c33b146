"""MD17 energy+force models: trunk shared with the QM9 Equiformer, forces as
the negative gradient of energy w.r.t. positions via ``jax.vjp`` — XLA handles
the double backward during training (reference computes forces inside forward
with autograd, graph_attention_transformer_md17.py:274-327; the TPU-native
formulation keeps the model a pure energy function, SURVEY.md §7.1.4).

MD17 uses raw atomic numbers as types (_MAX_ATOM_TYPE=64) and adds the
'exp' radial basis and the attention-head variant.  Registered entrypoints
mirror nets/graph_attention_transformer_md17.py:330-519 and
nets/dp_attention_transformer_md17.py:238-273.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.irreps import Irreps
from ..graph.batching import GraphsTuple
from .equiformer import GraphAttentionTransformer
from .registry import register_model

# MD17 statistics used by the reference — it reuses the QM9 r=5 statistics
# verbatim (graph_attention_transformer_md17.py:43-48, "For simplicity, use
# the same statistics for MD17").  Must match to the last digit or converted
# reference checkpoints lose bit-parity (the value scales every output).
_AVG_NUM_NODES_MD17 = 18.03065905448718
_AVG_DEGREE_MD17 = 15.57930850982666


def energy_and_forces(
    model, variables, graphs: GraphsTuple, rngs=None, deterministic: bool = True
):
    """(energy [G], forces [N, 3]) with forces = -dE/dpos.

    Uses vjp with a ones cotangent, exactly the reference
    ``autograd.grad(energy, pos, grad_outputs=ones, create_graph=True)``;
    under ``jax.grad`` of a training loss XLA differentiates through this
    (double backward).
    """

    def e_fn(pos):
        b = dataclasses.replace(graphs, pos=pos)
        kwargs = {"rngs": rngs} if rngs else {}
        return model.apply(variables, b, deterministic=deterministic, **kwargs)

    energy, vjp_fn = jax.vjp(e_fn, graphs.pos)
    (neg_forces,) = vjp_fn(jnp.ones_like(energy))
    forces = -neg_forces
    forces = jnp.where(graphs.node_mask[:, None], forces, 0.0)
    return energy, forces


def _md17(radius, num_basis, *, nonlinear, basis="gaussian", alpha_drop=0.2,
          irreps_node_embedding="128x0e+64x1e+32x2e",
          irreps_sh="1x0e+1x1e+1x2e",
          irreps_head="32x0e+16x1e+8x2e",
          irreps_mlp_mid="384x0e+192x1e+96x2e",
          use_attn_head=False,
          irreps_in=None, task_mean=None, task_std=None, atomref=None,  # ref-compat
          **kwargs):
    if task_mean is not None:
        kwargs.setdefault("task_mean", float(task_mean))
    if task_std is not None:
        kwargs.setdefault("task_std", float(task_std))
    return GraphAttentionTransformer(
        irreps_node_embedding=Irreps(irreps_node_embedding),
        num_layers=6,
        irreps_node_attr=Irreps("1x0e"),
        irreps_sh=Irreps(irreps_sh),
        max_radius=radius,
        number_of_basis=num_basis,
        basis_type=basis,
        fc_neurons=(64, 64),
        irreps_feature=Irreps("512x0e"),
        irreps_head=Irreps(irreps_head),
        num_heads=4,
        rescale_degree=False,
        nonlinear_message=nonlinear,
        irreps_mlp_mid=Irreps(irreps_mlp_mid),
        norm_layer="layer",
        alpha_drop=alpha_drop,
        proj_drop=0.0,
        out_drop=0.0,
        drop_path_rate=0.0,
        max_atom_type=64,
        avg_num_nodes=_AVG_NUM_NODES_MD17,
        avg_degree=_AVG_DEGREE_MD17,
        use_attn_head=use_attn_head,
        **kwargs,
    )


_L3 = dict(
    irreps_node_embedding="128x0e+64x1e+64x2e+32x3e",
    irreps_sh="1x0e+1x1e+1x2e+1x3e",
    irreps_head="32x0e+16x1e+16x2e+8x3e",
    irreps_mlp_mid="384x0e+192x1e+192x2e+96x3e",
)
_L3_E3 = dict(
    irreps_node_embedding="128x0e+64x0o+32x1e+32x1o+32x2e+32x2o+16x3e+16x3o",
    irreps_sh="1x0e+1x1o+1x2e+1x3o",
    irreps_head="32x0e+16x0o+8x1e+8x1o+8x2e+8x2o+4x3e+4x3o",
    irreps_mlp_mid="384x0e+192x0o+96x1e+96x1o+96x2e+96x2o+48x3e+48x3o",
)
_L2_E3 = dict(
    irreps_node_embedding="128x0e+32x0o+32x1e+32x1o+16x2e+16x2o",
    irreps_sh="1x0e+1x1o+1x2e",
    irreps_head="32x0e+8x0o+8x1e+8x1o+4x2e+4x2o",
    irreps_mlp_mid="384x0e+96x0o+96x1e+96x1o+48x2e+48x2o",
)


@register_model
def graph_attention_transformer_l2_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=False, **kw)


@register_model
def graph_attention_transformer_nonlinear_l2_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, **kw)


@register_model
def graph_attention_transformer_nonlinear_l2_e3_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, **_L2_E3, **kw)


@register_model
def graph_attention_transformer_nonlinear_bessel_l2_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, basis="bessel", alpha_drop=0.0, **kw)


@register_model
def graph_attention_transformer_nonlinear_exp_l2_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, basis="exp", alpha_drop=0.0, **kw)


@register_model
def graph_attention_transformer_nonlinear_exp_l3_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, basis="exp", alpha_drop=0.0, **_L3, **kw)


@register_model
def graph_attention_transformer_nonlinear_attn_exp_l3_md17(radius=5.0, num_basis=128, **kw):
    return _md17(
        radius, num_basis, nonlinear=True, basis="exp", alpha_drop=0.0,
        use_attn_head=True, **_L3, **kw,
    )


@register_model
def graph_attention_transformer_nonlinear_exp_l3_e3_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, basis="exp", alpha_drop=0.0, **_L3_E3, **kw)


@register_model
def graph_attention_transformer_nonlinear_bessel_l3_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, basis="bessel", alpha_drop=0.0, **_L3, **kw)


@register_model
def graph_attention_transformer_nonlinear_bessel_l3_e3_md17(radius=5.0, num_basis=128, **kw):
    return _md17(radius, num_basis, nonlinear=True, basis="bessel", alpha_drop=0.0, **_L3_E3, **kw)


@register_model
def dot_product_attention_transformer_exp_l2_md17(radius=5.0, num_basis=128, **kw):
    """dp_attention_transformer_md17.py:238-255."""
    return _md17(
        radius, num_basis, nonlinear=False, basis="exp", alpha_drop=0.0,
        attn_type="dot", **kw,
    )


@register_model
def dot_product_attention_transformer_exp_l3_md17(radius=5.0, num_basis=128, **kw):
    """dp_attention_transformer_md17.py:257-273."""
    return _md17(
        radius, num_basis, nonlinear=False, basis="exp", alpha_drop=0.0,
        attn_type="dot", **_L3, **kw,
    )
