"""Cross-validate the CG/SH constant tables against INDEPENDENT derivations.

The equivariance tests elsewhere validate the tables self-consistently (the
Wigner-D matrices they rotate with come from the same CG recursion).  A
shared conventions error could survive that closure.  These tests break the
loop with derivations that share no code with core/cg.py / core/spherical.py:

  - sympy.physics.quantum.cg.CG: exact complex-basis Clebsch-Gordan
    (vs our Racah-formula su2_cg),
  - scipy's complex Y_l^m combined by the textbook real-SH formulas
    (vs our CG-recursion spherical_harmonics),
  - real Wigner-D matrices SOLVED from the scipy-derived SH values at
    rotated points (no Wigner-D phase conventions involved), then used to
    check the intertwining property of every wigner_3j table.

Reference counterpart: e3nn's o3.wigner_3j / o3.spherical_harmonics, consumed
by /root/reference/nets/tensor_product_rescale.py:33-37 and
graph_attention_transformer.py:869-870.  (The per-path *sign* relation to
e3nn specifically is derived + anchored in core/e3nn_compat.py; intertwining
cannot distinguish +-C, so signs are out of scope here.)
"""

import math

import numpy as np
import pytest

from equiformer_tpu.core.cg import su2_cg, wigner_3j
from equiformer_tpu.core.spherical import spherical_harmonics

sympy = pytest.importorskip("sympy")
scipy_special = pytest.importorskip("scipy.special")


# ------------------------------------------------------------------ helpers
def _sph_harm(m, l, phi, theta):
    """Complex Y_l^m (Condon-Shortley), scipy old/new API compatible."""
    if hasattr(scipy_special, "sph_harm_y"):
        return scipy_special.sph_harm_y(l, m, theta, phi)
    return scipy_special.sph_harm(m, l, phi, theta)


def _real_sh_scipy(l, v):
    """Textbook real SH S_l^mu(v), mu=-l..l, 'component' normalized so that
    sum_mu S^2 = 2l+1 (Unsold: orthonormal real SH sum to (2l+1)/(4pi))."""
    x, y, z = v
    theta = math.acos(max(-1.0, min(1.0, z)))
    phi = math.atan2(y, x)
    out = np.zeros(2 * l + 1)
    out[l] = np.real(_sph_harm(0, l, phi, theta))
    for m in range(1, l + 1):
        ylm = _sph_harm(m, l, phi, theta)
        out[l + m] = math.sqrt(2.0) * (-1.0) ** m * np.real(ylm)
        out[l - m] = math.sqrt(2.0) * (-1.0) ** m * np.imag(ylm)
    return math.sqrt(4.0 * math.pi) * out


def _rand_units(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _rand_rotation(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _solve_D_scipy(l, R, seed=0):
    """Real Wigner-D in the scipy-derived basis, solved from S_l(R v) =
    D_l(R) S_l(v) at generic points — no phase conventions involved."""
    vs = _rand_units(4 * (2 * l + 1), seed)
    A = np.stack([_real_sh_scipy(l, v) for v in vs])          # [n, 2l+1]
    B = np.stack([_real_sh_scipy(l, R @ v) for v in vs])      # [n, 2l+1]
    D, *_ = np.linalg.lstsq(A, B, rcond=None)
    return D.T  # B^T = D A^T


# -------------------------------------------------------------------- tests
@pytest.mark.parametrize(
    "j1,j2,j3",
    [(l1, l2, l3) for l1 in range(4) for l2 in range(4)
     for l3 in range(abs(l1 - l2), min(3, l1 + l2) + 1)],
)
def test_su2_cg_matches_sympy(j1, j2, j3):
    from sympy.physics.quantum.cg import CG

    ours = su2_cg(j1, j2, j3)
    for m1 in range(-j1, j1 + 1):
        for m2 in range(-j2, j2 + 1):
            m3 = m1 + m2
            if abs(m3) > j3:
                continue
            exact = float(CG(j1, m1, j2, m2, j3, m3).doit().evalf(20))
            assert abs(ours[m1 + j1, m2 + j2, m3 + j3] - exact) < 1e-12, (
                (j1, m1, j2, m2, j3, m3)
            )


@pytest.mark.parametrize("l", range(7))
def test_spherical_harmonics_match_scipy(l):
    """Our CG-recursion SH == sigma_l x sqrt(4pi) x textbook real SH built
    from scipy's complex Y_l^m, entry for entry (ordering mu=-l..l,
    component normalization).  sigma_l is the documented per-degree
    recursion sign (core/e3nn_compat.std_sign, previously verified only
    against hand-written polynomials for l<=3) — this extends that
    verification to l<=6 from an independent source."""
    from equiformer_tpu.core.e3nn_compat import std_sign

    vs = _rand_units(16, seed=l + 10)
    ours = np.asarray(spherical_harmonics([l], vs))
    theirs = np.stack([_real_sh_scipy(l, v) for v in vs])
    np.testing.assert_allclose(ours, std_sign(l) * theirs, atol=1e-6)


@pytest.mark.parametrize(
    "l1,l2,l3",
    [(l1, l2, l3) for l1 in range(4) for l2 in range(4)
     for l3 in range(abs(l1 - l2), min(3, l1 + l2) + 1)],
)
def test_wigner_3j_intertwines_independent_rotations(l1, l2, l3):
    """C . (D1 (x) D2) == D3 . C with D's solved from scipy-derived SH —
    validates every table entry (up to the global path sign, which
    intertwining cannot see) against a derivation sharing no repo code."""
    C = wigner_3j(l1, l2, l3)
    for seed in (3, 4):
        R = _rand_rotation(seed)
        D1 = _solve_D_scipy(l1, R, seed)
        D2 = _solve_D_scipy(l2, R, seed + 50)
        D3 = _solve_D_scipy(l3, R, seed + 100)
        lhs = np.einsum("ijk,ia,jb->abk", C, D1, D2)
        rhs = np.einsum("abc,kc->abk", C, D3)
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)
