"""Equivariant normalization layers.

Four variants mirroring the reference selector ``get_norm_layer``
(graph_attention_transformer.py:39-51):

* ``layer``      — EquivariantLayerNorm (reference layer_norm.py:62-152, V2):
                   per-node; scalars mean-centered over mul; RMS over
                   (components, mul); affine weight per irrep copy, bias on
                   even scalars.
* ``fast_layer`` — scalar block uses standard LayerNorm, l>0 blocks RMS
                   (fast_layer_norm.py:9-85).
* ``instance``   — per-graph statistics via masked segment means
                   (instance_norm.py:9-134).
* ``graph``      — instance + learnable scalar mean_shift (graph_norm.py:9-140).

Statistics are computed in float32 regardless of input dtype (the reference
disables AMP for layer norm, layer_norm.py:89).  All are flax modules with a
uniform call signature ``(x, batch=None, node_mask=None, num_graphs=None)``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.irreps import Irreps
from ..graph.segment import segment_max, segment_mean


def _blocks(x, irreps):
    # component-major views [..., d, mul] (see core.tensor_product layout note)
    i = 0
    for mul, ir in irreps:
        yield x[..., i : i + mul * ir.dim].reshape(x.shape[:-1] + (ir.dim, mul)), mul, ir
        i += mul * ir.dim


class EquivariantLayerNorm(nn.Module):
    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True
    normalization: str = "component"

    @nn.compact
    def __call__(self, x, batch=None, node_mask=None, num_graphs=None):
        irreps = Irreps(self.irreps)
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
        num_features = irreps.num_irreps
        num_scalar = sum(mi.mul for mi in irreps if mi.ir.is_scalar())
        if self.affine:
            weight = self.param("affine_weight", nn.initializers.ones, (num_features,))
            bias = self.param("affine_bias", nn.initializers.zeros, (num_scalar,))
        iw = ib = 0
        pieces = []
        for field, mul, ir in _blocks(x, irreps):
            if ir.is_scalar():
                field = field - jnp.mean(field, axis=-1, keepdims=True)
            if self.normalization == "norm":
                fn = jnp.sum(field**2, axis=-2)  # [..., mul]
            else:
                fn = jnp.mean(field**2, axis=-2)
            fn = jnp.mean(fn, axis=-1, keepdims=True)  # [..., 1]
            fn = (fn + self.eps) ** -0.5
            if self.affine:
                fn = fn * weight[iw : iw + mul]  # [..., mul]
                iw += mul
            field = field * fn[..., None, :]
            if self.affine and ir.is_scalar():
                field = field + bias[ib : ib + mul]
                ib += mul
            pieces.append(field.reshape(field.shape[:-2] + (mul * ir.dim,)))
        return jnp.concatenate(pieces, axis=-1).astype(in_dtype)


class EquivariantLayerNormFast(nn.Module):
    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True
    normalization: str = "component"

    @nn.compact
    def __call__(self, x, batch=None, node_mask=None, num_graphs=None):
        irreps = Irreps(self.irreps)
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
        num_features = irreps.num_irreps
        num_scalar = sum(mi.mul for mi in irreps if mi.ir.is_scalar())
        weight = self.param("affine_weight", nn.initializers.ones, (num_features,))
        bias = self.param("affine_bias", nn.initializers.zeros, (num_scalar,))
        iw = ib = 0
        pieces = []
        for field, mul, ir in _blocks(x, irreps):
            if ir.is_scalar():
                f = field[..., 0, :]
                mean = jnp.mean(f, axis=-1, keepdims=True)
                var = jnp.mean((f - mean) ** 2, axis=-1, keepdims=True)
                f = (f - mean) * (var + self.eps) ** -0.5
                f = f * weight[iw : iw + mul] + bias[ib : ib + mul]
                iw += mul
                ib += mul
                pieces.append(f)
            else:
                if self.normalization == "norm":
                    fn = jnp.sum(field**2, axis=-2)
                else:
                    fn = jnp.mean(field**2, axis=-2)
                fn = jnp.mean(fn, axis=-1, keepdims=True)
                fn = (fn + self.eps) ** -0.5
                fn = fn * weight[iw : iw + mul]
                iw += mul
                field = field * fn[..., None, :]
                pieces.append(field.reshape(field.shape[:-2] + (mul * ir.dim,)))
        return jnp.concatenate(pieces, axis=-1).astype(in_dtype)


class _GraphStatNorm(nn.Module):
    """Shared core of instance/graph norm: per-graph masked statistics."""

    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True
    reduce: str = "mean"
    normalization: str = "component"
    learnable_mean_shift: bool = False

    @nn.compact
    def __call__(self, x, batch=None, node_mask=None, num_graphs=None):
        if batch is None or num_graphs is None:
            raise ValueError("instance/graph norm needs batch indices and num_graphs")
        irreps = Irreps(self.irreps)
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
        num_features = irreps.num_irreps
        num_scalar = sum(mi.mul for mi in irreps if mi.ir.is_scalar())
        if self.affine:
            weight = self.param("affine_weight", nn.initializers.ones, (num_features,))
            bias = self.param("affine_bias", nn.initializers.zeros, (num_scalar,))
        if self.learnable_mean_shift:
            mean_shift = self.param("mean_shift", nn.initializers.ones, (num_scalar,))
        iw = ib = ims = 0
        pieces = []
        for field, mul, ir in _blocks(x, irreps):
            if ir.is_scalar():
                gm = segment_mean(field, batch, num_graphs, mask=node_mask)
                shift = gm[batch]  # [N, 1, mul]
                if self.learnable_mean_shift:
                    shift = shift * mean_shift[ims : ims + mul]
                    ims += mul
                field = field - shift
            if self.normalization == "norm":
                fn = jnp.sum(field**2, axis=-2)  # [N, mul]
            else:
                fn = jnp.mean(field**2, axis=-2)
            if self.reduce == "mean":
                fn = segment_mean(fn, batch, num_graphs, mask=node_mask)
            else:
                fn = segment_max(fn, batch, num_graphs, mask=node_mask)
            fn = (fn + self.eps) ** -0.5  # [G, mul]
            if self.affine:
                fn = fn * weight[iw : iw + mul]
                iw += mul
            field = field * fn[batch][..., None, :]
            if self.affine and ir.is_scalar():
                field = field + bias[ib : ib + mul]
                ib += mul
            pieces.append(field.reshape(field.shape[:-2] + (mul * ir.dim,)))
        return jnp.concatenate(pieces, axis=-1).astype(in_dtype)


class EquivariantInstanceNorm(_GraphStatNorm):
    learnable_mean_shift: bool = False


class EquivariantGraphNorm(_GraphStatNorm):
    learnable_mean_shift: bool = True


class EquivariantGraphNormV2(nn.Module):
    """Graph norm with learnable mean-shift on EVERY irrep, not just scalars
    (reference graph_norm.py:141-238).  The per-mul ``mean_shift`` is
    initialized to 1 for even scalars and 0 elsewhere, so at init it equals
    plain instance norm; training can learn to center l>0 fields too (still
    equivariant: the per-graph mean of an l>0 field co-rotates with it)."""

    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True
    reduce: str = "mean"
    normalization: str = "component"

    @nn.compact
    def __call__(self, x, batch=None, node_mask=None, num_graphs=None):
        if batch is None or num_graphs is None:
            raise ValueError("graph norm needs batch indices and num_graphs")
        irreps = Irreps(self.irreps)
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
        num_features = irreps.num_irreps
        num_scalar = sum(mi.mul for mi in irreps if mi.ir.is_scalar())
        if self.affine:
            weight = self.param("affine_weight", nn.initializers.ones, (num_features,))
            bias = self.param("affine_bias", nn.initializers.zeros, (num_scalar,))
        ms_init = jnp.concatenate(
            [(jnp.ones if mi.ir.is_scalar() else jnp.zeros)((mi.mul,)) for mi in irreps]
        )
        mean_shift = self.param("mean_shift", lambda k, s: ms_init, (num_features,))
        iw = ib = ims = 0
        pieces = []
        for field, mul, ir in _blocks(x, irreps):
            gm = segment_mean(field, batch, num_graphs, mask=node_mask)  # [G, d, mul]
            shift = mean_shift[ims : ims + mul]
            ims += mul
            field = field - gm[batch] * shift
            if self.normalization == "norm":
                fn = jnp.sum(field**2, axis=-2)  # [N, mul]
            else:
                fn = jnp.mean(field**2, axis=-2)
            if self.reduce == "mean":
                fn = segment_mean(fn, batch, num_graphs, mask=node_mask)
            else:
                fn = segment_max(fn, batch, num_graphs, mask=node_mask)
            fn = (fn + self.eps) ** -0.5  # [G, mul]
            if self.affine:
                fn = fn * weight[iw : iw + mul]
                iw += mul
            field = field * fn[batch][..., None, :]
            if self.affine and ir.is_scalar():
                field = field + bias[ib : ib + mul]
                ib += mul
            pieces.append(field.reshape(field.shape[:-2] + (mul * ir.dim,)))
        return jnp.concatenate(pieces, axis=-1).astype(in_dtype)


class EquivariantLayerNormV3(nn.Module):
    """Layer norm variant with mean-centering for vectors of ALL degrees
    (reference layer_norm.py:155-232); kept for API completeness — the models
    use V2 (our EquivariantLayerNorm)."""

    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True
    normalization: str = "component"
    learnable_mean_shift: bool = False  # True -> V4 (layer_norm.py:235-325)

    @nn.compact
    def __call__(self, x, batch=None, node_mask=None, num_graphs=None):
        irreps = Irreps(self.irreps)
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
        num_features = irreps.num_irreps
        num_scalar = sum(mi.mul for mi in irreps if mi.ir.is_scalar())
        if self.affine:
            weight = self.param("affine_weight", nn.initializers.ones, (num_features,))
            bias = self.param("affine_bias", nn.initializers.zeros, (num_scalar,))
        if self.learnable_mean_shift:
            # V4 init: ones on scalars, zeros elsewhere
            init = jnp.concatenate(
                [
                    (jnp.ones if mi.ir.is_scalar() else jnp.zeros)((mi.mul,))
                    for mi in irreps
                ]
            )
            mean_shift = self.param("mean_shift", lambda k, s: init, (num_features,))
        iw = ib = ims = 0
        pieces = []
        for field, mul, ir in _blocks(x, irreps):
            fmean = jnp.mean(field, axis=-1, keepdims=True)  # mean over copies
            if self.learnable_mean_shift:
                shift = mean_shift[ims : ims + mul]
                ims += mul
                field = field - fmean * shift
            else:
                field = field - fmean
            if self.normalization == "norm":
                fn = jnp.sum(field**2, axis=-2)
            else:
                fn = jnp.mean(field**2, axis=-2)
            fn = jnp.mean(fn, axis=-1, keepdims=True)
            fn = (fn + self.eps) ** -0.5
            if self.affine:
                fn = fn * weight[iw : iw + mul]
                iw += mul
            field = field * fn[..., None, :]
            if self.affine and ir.is_scalar():
                field = field + bias[ib : ib + mul]
                ib += mul
            pieces.append(field.reshape(field.shape[:-2] + (mul * ir.dim,)))
        return jnp.concatenate(pieces, axis=-1).astype(in_dtype)


class EquivariantLayerNormV4(EquivariantLayerNormV3):
    learnable_mean_shift: bool = True


def get_norm_layer(norm_type: Optional[str]):
    """Selector matching graph_attention_transformer.py:39-51."""
    if norm_type == "layer":
        return EquivariantLayerNorm
    if norm_type == "fast_layer":
        return EquivariantLayerNormFast
    if norm_type == "instance":
        return EquivariantInstanceNorm
    if norm_type == "graph":
        return EquivariantGraphNorm
    if norm_type == "graph_v2":
        # superset of the reference selector (which never exposes V2)
        return EquivariantGraphNormV2
    if norm_type is None:
        return None
    raise ValueError(f"Norm type {norm_type} not supported.")
