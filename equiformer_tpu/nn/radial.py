"""Radial basis functions and the radial weight MLP.

* ``RadialProfile`` — Linear->LayerNorm->SiLU stack with bias-free final layer
  plus a separate learnable offset (reference radial_func.py:9-50).
* ``GaussianRadialBasis`` — Graphormer-style learnable gaussians
  (gaussian_rbf.py:4-45).
* ``ExpNormalBasis`` + cosine cutoff — PhysNet/TorchMD-Net smearing
  (expnorm_rbf.py:5-78).
* ``BesselRadialBasis`` — spherical-Bessel sine basis with polynomial envelope,
  the ocpmodels GemNet ``RadialBasis({'name':'spherical_bessel'})`` the
  reference imports (graph_attention_transformer.py:26,786-787).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .linear import ScalarMLP, _torch_linear_init


class RadialProfile(nn.Module):
    """MLP mapping edge scalars (RBF values [+ atom-edge scalars]) to TP weights."""

    features: Tuple[int, ...]  # hidden dims + final weight_numel
    use_layer_norm: bool = True
    use_offset: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, fold_final: bool = False):
        """``fold_final=True`` skips the per-edge final matmul and returns
        ``(hidden, final kernel, offset)`` for radial-folded fused kernels
        (kernels/dtp_lin_pallas.DTPLinPlan radial_fold) — identical params
        and gradients, the matmul just happens inside the TP kernel."""
        out = ScalarMLP(
            features=tuple(self.features),
            use_layer_norm=self.use_layer_norm,
            final_bias=not self.use_offset,
            fold_final=fold_final,
            name="net",
        )(x)
        offset = None
        if self.use_offset:
            # reference inits the offset to zero (radial_func.py:39-41)
            offset = self.param(
                "offset", nn.initializers.zeros, (self.features[-1],)
            )
        if fold_final:
            assert self.use_offset, "fold_final requires the offset variant"
            h, kernel = out
            return h, kernel, offset
        if offset is not None:
            out = out + offset.astype(out.dtype)
        return out


class GaussianRadialBasis(nn.Module):
    num_basis: int
    cutoff: float

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        mean = self.param(
            "mean",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, 0.0, 1.0),
            (self.num_basis,),
        )
        std = self.param(
            "std",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, 1.0 / self.num_basis, 1.0
            ),
            (self.num_basis,),
        )
        weight = self.param("weight", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        x = dist[..., None] / self.cutoff
        x = weight * x + bias
        s = jnp.abs(std) + 1e-5
        return jnp.exp(-0.5 * ((x - mean) / s) ** 2) / (math.sqrt(2 * math.pi) * s)


def cosine_cutoff(dist: jnp.ndarray, cutoff_upper: float, cutoff_lower: float = 0.0):
    if cutoff_lower > 0:
        c = 0.5 * (
            jnp.cos(
                math.pi
                * (2.0 * (dist - cutoff_lower) / (cutoff_upper - cutoff_lower) + 1.0)
            )
            + 1.0
        )
        return c * (dist < cutoff_upper) * (dist > cutoff_lower)
    c = 0.5 * (jnp.cos(dist * math.pi / cutoff_upper) + 1.0)
    return c * (dist < cutoff_upper)


class ExpNormalBasis(nn.Module):
    """PhysNet exp-normal smearing with cosine cutoff."""

    num_basis: int
    cutoff: float
    cutoff_lower: float = 0.0
    trainable: bool = False

    def _initial(self):
        start = math.exp(-self.cutoff + self.cutoff_lower)
        means = np.linspace(start, 1.0, self.num_basis, dtype=np.float32)
        betas = np.full(
            (self.num_basis,),
            (2.0 / self.num_basis * (1.0 - start)) ** -2,
            dtype=np.float32,
        )
        return means, betas

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        means_np, betas_np = self._initial()
        if self.trainable:
            means = self.param("means", lambda k, s: jnp.asarray(means_np), (self.num_basis,))
            betas = self.param("betas", lambda k, s: jnp.asarray(betas_np), (self.num_basis,))
        else:
            means, betas = jnp.asarray(means_np), jnp.asarray(betas_np)
        alpha = 5.0 / (self.cutoff - self.cutoff_lower)
        d = dist[..., None]
        env = cosine_cutoff(d, self.cutoff)
        return env * jnp.exp(
            -betas * (jnp.exp(alpha * (-d + self.cutoff_lower)) - means) ** 2
        )


class BesselRadialBasis(nn.Module):
    """sqrt(2/c) * sin(n pi d/c) / d basis with degree-5 polynomial envelope.

    GemNet/DimeNet spherical-Bessel-l0 radial basis, the semantics of
    ocpmodels ``RadialBasis(..., rbf={'name': 'spherical_bessel'})`` used by
    the reference bessel model variants.
    """

    num_basis: int
    cutoff: float
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        freqs = self.param(
            "frequencies",
            lambda k, s: jnp.arange(1, self.num_basis + 1, dtype=jnp.float32) * math.pi,
            (self.num_basis,),
        )
        d = jnp.maximum(dist[..., None], 1e-9) / self.cutoff
        p = self.envelope_exponent + 1
        a = -(p + 1) * (p + 2) / 2.0
        b = p * (p + 2.0)
        c = -p * (p + 1) / 2.0
        env = (1.0 / d + a * d ** (p - 1) + b * d**p + c * d ** (p + 1)) * (d < 1.0)
        norm = math.sqrt(2.0 / self.cutoff)
        return env * norm * jnp.sin(freqs * d)


def make_rbf(basis_type: str, num_basis: int, cutoff: float) -> nn.Module:
    if basis_type == "gaussian":
        return GaussianRadialBasis(num_basis=num_basis, cutoff=cutoff)
    if basis_type == "bessel":
        return BesselRadialBasis(num_basis=num_basis, cutoff=cutoff)
    if basis_type == "exp":
        return ExpNormalBasis(num_basis=num_basis, cutoff=cutoff, trainable=False)
    raise ValueError(f"unknown basis type {basis_type}")
