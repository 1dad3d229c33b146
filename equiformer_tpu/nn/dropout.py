"""Equivariant dropout variants (reference drop.py).

* ``EquivariantDropout`` — drops whole irrep copies: one Bernoulli mask per
  (node, irrep copy), broadcast across components (drop.py:68-86).
* ``EquivariantScalarsDropout`` — plain dropout on scalar blocks only
  (drop.py:89-108).
* ``GraphDropPath`` — stochastic depth with one mask per *graph*, indexed by
  the node->graph map (drop.py:46-63).

All use flax's 'dropout' rng collection and a ``deterministic`` flag.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.irreps import Irreps
from ..core.tensor_product import elementwise_multiply


class EquivariantDropout(nn.Module):
    irreps: Irreps
    drop_prob: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.drop_prob == 0.0:
            return x
        irreps = Irreps(self.irreps)
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape[:-1] + (irreps.num_irreps,))
        scal = mask.astype(x.dtype) / keep
        return elementwise_multiply(irreps, x, scal)


class EquivariantScalarsDropout(nn.Module):
    irreps: Irreps
    drop_prob: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.drop_prob == 0.0:
            return x
        irreps = Irreps(self.irreps)
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        pieces = []
        i = 0
        for mul, ir in irreps:
            blk = x[..., i : i + mul * ir.dim]
            if ir.is_scalar():
                m = jax.random.bernoulli(
                    jax.random.fold_in(rng, i), keep, blk.shape
                )
                blk = blk * m.astype(x.dtype) / keep
            pieces.append(blk)
            i += mul * ir.dim
        return jnp.concatenate(pieces, axis=-1)


class GraphDropPath(nn.Module):
    """Per-graph stochastic depth on the residual branch."""

    drop_prob: float

    @nn.compact
    def __call__(self, x, batch, num_graphs: int, deterministic: bool = True):
        if deterministic or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        gmask = jax.random.bernoulli(rng, keep, (num_graphs,)).astype(x.dtype) / keep
        return x * gmask[batch][(...,) + (None,) * (x.ndim - 1)]
