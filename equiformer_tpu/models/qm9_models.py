"""Registered QM9 model entrypoints (reference graph_attention_transformer.py:902-1016
and dp_attention_transformer.py:416-432 registry surface)."""

from __future__ import annotations

import numpy as np

from ..core.irreps import Irreps
from .equiformer import GraphAttentionTransformer
from .registry import register_model


def _gat(radius, num_basis, *, nonlinear, basis="gaussian", alpha_drop=0.2,
         irreps_node_embedding="128x0e+64x1e+32x2e",
         irreps_sh="1x0e+1x1e+1x2e",
         irreps_head="32x0e+16x1e+8x2e",
         irreps_mlp_mid="384x0e+192x1e+96x2e",
         irreps_in=None,  # reference signature compat ('5x0e' one-hot input)
         task_mean=None, task_std=None, atomref=None,
         **kwargs):
    if task_mean is not None:
        kwargs.setdefault("task_mean", float(task_mean))
    if task_std is not None:
        kwargs.setdefault("task_std", float(task_std))
    if atomref is not None:
        kwargs.setdefault("atomref", tuple(float(a) for a in np.asarray(atomref).ravel()))
    kwargs.setdefault("proj_drop", 0.0)
    kwargs.setdefault("out_drop", 0.0)
    kwargs.setdefault("drop_path_rate", 0.0)
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
        max_atom_type=5,
        higher_order_grads=False,  # QM9 training never differentiates through pos
        **kwargs,
    )


@register_model
def graph_attention_transformer_l2(radius=5.0, num_basis=128, **kwargs):
    return _gat(radius, num_basis, nonlinear=False, **kwargs)


@register_model
def graph_attention_transformer_nonlinear_l2(radius=5.0, num_basis=128, **kwargs):
    return _gat(radius, num_basis, nonlinear=True, **kwargs)


@register_model
def graph_attention_transformer_nonlinear_l2_e3(radius=5.0, num_basis=128, **kwargs):
    return _gat(
        radius, num_basis, nonlinear=True,
        irreps_node_embedding="128x0e+32x0o+32x1e+32x1o+16x2e+16x2o",
        irreps_sh="1x0e+1x1o+1x2e",
        irreps_head="32x0e+8x0o+8x1e+8x1o+4x2e+4x2o",
        irreps_mlp_mid="384x0e+96x0o+96x1e+96x1o+48x2e+48x2o",
        **kwargs,
    )


@register_model
def graph_attention_transformer_nonlinear_bessel_l2(radius=5.0, num_basis=128, **kwargs):
    return _gat(radius, num_basis, nonlinear=True, basis="bessel", **kwargs)


@register_model
def graph_attention_transformer_nonlinear_bessel_l2_drop01(radius=5.0, num_basis=128, **kwargs):
    return _gat(radius, num_basis, nonlinear=True, basis="bessel", alpha_drop=0.1, **kwargs)


@register_model
def graph_attention_transformer_nonlinear_bessel_l2_drop00(radius=5.0, num_basis=128, **kwargs):
    return _gat(radius, num_basis, nonlinear=True, basis="bessel", alpha_drop=0.0, **kwargs)


@register_model
def dot_product_attention_transformer_l2(radius=5.0, num_basis=128, **kwargs):
    """Dot-product attention + linear messages ablation
    (dp_attention_transformer.py:416-432)."""
    return _gat(radius, num_basis, nonlinear=False, attn_type="dot", **kwargs)
