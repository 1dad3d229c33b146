"""Real spherical harmonics with 'component' normalization, defined via CG recursion.

``Y_0 = 1`` and ``Y_1(x) = sqrt(3) * (y, z, x)`` (real-SH ordering mu=-1,0,1);
higher degrees are built by contracting ``Y_l (x) Y_1`` with the real Wigner-3j
intertwiner and rescaling so that ``|Y_l(x)|^2 = 2l+1`` on the unit sphere
("component" normalization).  Defining SH *by* the CG tables guarantees exact
mutual consistency between spherical harmonics and tensor products — the
equivariance property the reference gets from e3nn
(/root/reference/nets/graph_attention_transformer.py:869-870,
``o3.spherical_harmonics(..., normalize=True, normalization='component')``).

Everything is closed-form jnp — vectorizes trivially over edges on the VPU.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .cg import wigner_3j
from .irreps import Irreps


@functools.lru_cache(maxsize=None)
def _recursion_constants(lmax: int):
    """Per-step rescale constants c_l with Y_{l+1} = c_l * C(Y_l, Y_1).

    Computed once in numpy float64 at an arbitrary generic unit vector (the
    norm of an equivariant map is constant on the sphere).
    """
    v = np.array([0.2972, -0.5863, 0.7535])
    v = v / np.linalg.norm(v)
    y1 = math.sqrt(3.0) * np.array([v[1], v[2], v[0]])
    ys = [np.array([1.0]), y1]
    consts: List[float] = []
    for l in range(1, lmax):
        C = wigner_3j(l, 1, l + 1)
        raw = np.einsum("i,j,ijk->k", ys[l], y1, C)
        c = math.sqrt(2 * (l + 1) + 1) / np.linalg.norm(raw)
        consts.append(c)
        ys.append(c * raw)
    return tuple(consts)


def spherical_harmonics(
    ls: Sequence[int],
    x: jnp.ndarray,
    normalize: bool = True,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Concatenated real SH of the given degrees, shape [..., sum(2l+1)].

    ``x`` has shape [..., 3] in (x, y, z) order; components are returned in
    real-SH order (for l=1: (y, z, x)).  ``normalize=True`` projects x to the
    unit sphere first (zero vectors map to zero-padded safe output).
    """
    ls = list(ls)
    lmax = max(ls)
    if normalize:
        # Double-where so zero vectors (padded edges) are safe to ALL
        # derivative orders — forces require grad-of-grad through here and a
        # plain x/max(|x|, eps) produces NaN second derivatives at x=0.
        n2 = jnp.sum(x * x, axis=-1, keepdims=True)
        safe = n2 > eps
        n2_safe = jnp.where(safe, n2, 1.0)
        x = jnp.where(safe, x, 0.0) / jnp.sqrt(n2_safe)
    xs, ys_, zs = x[..., 0], x[..., 1], x[..., 2]
    y1 = math.sqrt(3.0) * jnp.stack([ys_, zs, xs], axis=-1)
    ys = [jnp.ones_like(x[..., :1]), y1]
    consts = _recursion_constants(max(lmax, 1))
    for l in range(1, lmax):
        C = jnp.asarray(wigner_3j(l, 1, l + 1), dtype=x.dtype)
        ys.append(consts[l - 1] * jnp.einsum("...i,...j,ijk->...k", ys[l], y1, C))
    return jnp.concatenate([ys[l] for l in ls], axis=-1)


def spherical_harmonics_for_irreps(
    irreps: Irreps, x: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """SH matching an irreps signature like '1x0e+1x1e+1x2e' (mul must be 1)."""
    for mul, ir in irreps:
        if mul != 1:
            raise ValueError(f"SH irreps must have multiplicity 1, got {irreps}")
    return spherical_harmonics([ir.l for _, ir in irreps], x, normalize=normalize)
