"""Rotation utilities and numeric Wigner-D matrices (primarily for testing).

``wigner_D`` is recovered numerically from our own spherical harmonics by
least squares — by construction it is exactly consistent with the SH/CG
conventions of this framework, which is the property equivariance tests need
(the reference tests equivariance the same way with e3nn's
``irreps.D_from_matrix``, /root/reference/nets/layer_norm.py:336-344).
"""

from __future__ import annotations

import functools

import numpy as np

from .irreps import Irreps
from .spherical import spherical_harmonics


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation matrix in SO(3) (numpy, float64)."""
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


@functools.lru_cache(maxsize=None)
def _sample_points(n: int = 64) -> np.ndarray:
    rng = np.random.default_rng(12345)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def wigner_D(l: int, R: np.ndarray) -> np.ndarray:
    """D^l(R) with Y_l(R x) = D^l(R) @ Y_l(x), in this framework's real basis."""
    if l == 0:
        return np.ones((1, 1))
    pts = _sample_points()
    A = np.asarray(spherical_harmonics([l], pts.astype(np.float64), normalize=False))
    B = np.asarray(
        spherical_harmonics([l], (pts @ R.T).astype(np.float64), normalize=False)
    )
    # B = A @ D^T  (rows are samples)
    D_T, *_ = np.linalg.lstsq(A, B, rcond=None)
    return D_T.T


def irreps_D(irreps: Irreps, R: np.ndarray, parity: int = 1) -> np.ndarray:
    """Block-diagonal D for a feature vector with the given irreps layout.

    Blocks follow the framework's component-major layout ([d, mul] per
    block flattened), so each (mul, ir) block contributes kron(D_l, I_mul).
    ``parity=-1`` composes with spatial inversion (each block multiplied by
    ir.p), for testing full O(3) equivariance of the _e3 model variants.
    """
    blocks = []
    for mul, ir in irreps:
        D = wigner_D(ir.l, R)
        if parity == -1:
            D = D * ir.p
        blocks.append(np.kron(D, np.eye(mul)))
    n = sum(b.shape[0] for b in blocks)
    out = np.zeros((n, n))
    i = 0
    for b in blocks:
        d = b.shape[0]
        out[i : i + d, i : i + d] = b
        i += d
    return out


def transform(irreps: Irreps, features: np.ndarray, R: np.ndarray, parity: int = 1):
    """Apply the irreps rotation to flat features [..., irreps.dim]."""
    D = irreps_D(irreps, R, parity)
    return features @ D.T
