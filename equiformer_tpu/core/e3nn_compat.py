"""e3nn convention bridge: basis maps + Wigner-3j signs for checkpoint import.

The reference consumes e3nn (``o3.wigner_3j``, ``o3.spherical_harmonics``,
/root/reference/nets/tensor_product_rescale.py:33-37,
graph_attention_transformer.py:869-870).  To import reference PyTorch
checkpoints we must relate e3nn's conventions to this framework's
(core/cg.py, core/spherical.py).  Two published e3nn facts pin the relation:

1. **Component order / SH basis.**  e3nn's real spherical harmonics satisfy
   ``sh(1, (x,y,z)) ∝ (x,y,z)`` (identity on vectors) with polar axis *y*
   (their Euler angles rotate about y, x, y).  The standard real-SH ordering
   mu=-1,0,1 evaluates to (y, z, x) — which is this framework's convention
   (core/spherical.py).  Therefore e3nn's basis is the standard one with the
   input coordinates cyclically relabeled:

      e3nn_Y_l(v) = std_Y_l(M v),   M = [[0,0,1],[1,0,0],[0,1,0]]  (det = +1)

   Since M is a rotation, equivariance gives  e3nn_Y_l(v) = D_l(M) ours_Y_l(v)
   — i.e. *per-l feature blocks differ by the fixed rotation D_l(M)*.

2. **Wigner 3j.**  Intertwiners are invariant under conjugation by group
   elements, so the basis rotation in (1) does NOT change the 3j tensor:
   ``e3nn_w3j(l1,l2,l3) = s · ours_w3j(l1,l2,l3)`` with a per-triple sign
   ``s ∈ {+1,-1}`` coming only from phase conventions.  e3nn makes its real
   CG by conjugating the complex (Condon-Shortley) CG with the real-basis
   change *premultiplied by* ``(-i)^l`` ("to make the Clebsch-Gordan
   coefficients real", e3nn o3/_wigner.py); our core/cg.py instead takes the
   surviving real-or-imaginary part and fixes first-nonzero-positive.  The
   phase product works out to ``Re[(-i)^(l1+l2-l3) · C_raw]`` (the sign anchored by the two
   documented e3nn values checked below), giving the sign table computed here.

Because neither e3nn nor the network is available in this build environment,
the derivation is validated against e3nn values that are published in its
documentation (w3j(1,1,0) = +δ/√3, w3j(1,1,1) = +ε/√6) and kept in ONE place;
``tools/gen_e3nn_constants.py`` regenerates and cross-checks the full table in
any environment that has e3nn installed, and ``convert_checkpoint`` accepts
that JSON as an override.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from .cg import real_basis_change, su2_cg, wigner_3j

# cyclic coordinate relabeling: e3nn_Y_l(v) = std_Y_l(M v)
E3NN_COORD_PERM = np.array(
    [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
)


@functools.lru_cache(maxsize=None)
def wigner_D_exact(l: int, R_key=None, R=None) -> np.ndarray:
    """Float64 D^l(R) in this framework's basis via the CG recursion.

    D_1 is R conjugated into the (y,z,x) ordering; D_{l+1} comes from
    D_l ⊗ D_1 contracted with the wigner_3j intertwiner (Schur orthogonality
    supplies the (2l+3) normalization).  Pure numpy — unlike
    rotations.wigner_D this does not round-trip through jnp, so it is exact
    enough for conversion matrices.  Pass R via R_key=tuple(R.ravel()).
    """
    if R is None:
        R = np.array(R_key, np.float64).reshape(3, 3)
    if l == 0:
        return np.ones((1, 1))
    perm = [1, 2, 0]  # our l=1 basis is (y, z, x)
    D = R[np.ix_(perm, perm)]
    if l == 1:
        return D
    Dl = wigner_D_exact(l - 1, R_key)
    C = wigner_3j(l - 1, 1, l)
    out = (2 * l + 1) * np.einsum("ijk,ia,jb,abc->kc", C, Dl, D, C)
    return out


@functools.lru_cache(maxsize=None)
def std_sign(l: int) -> int:
    """σ_l with ours_Y_l = σ_l · std_Y_l (Wikipedia real form).

    Our recursion (core/spherical.py) uses core/cg.py's
    first-nonzero-positive w3j and a positive rescale, while the standard
    real SH recursion carries e3nn's w3j sign — so
    σ_{l+1} = σ_l · s(l,1,l+1), σ_0 = σ_1 = +1.  (Numerically verified
    against the explicit l≤3 standard polynomials in
    tests/test_e3nn_compat.py: σ = +,+,−,+ for l = 0..3.)
    """
    if l <= 1:
        return 1
    sign = 1
    for k in range(1, l):
        sign *= int(e3nn_w3j_sign(k, 1, k + 1))
    return sign


@functools.lru_cache(maxsize=None)
def e3nn_basis_rotation(l: int) -> np.ndarray:
    """R_l with e3nn_Y_l(v) = R_l @ ours_Y_l(v) for every v (orthogonal).

    e3nn_Y_l = std_Y_l ∘ M = σ_l · ours_Y_l ∘ M = σ_l · D_l(M) ours_Y_l.
    Feature conversion: a reference irrep-l feature block f_e3nn corresponds
    to f_ours = R_l.T @ f_e3nn in this framework.
    """
    return std_sign(l) * wigner_D_exact(l, tuple(E3NN_COORD_PERM.ravel()))


@functools.lru_cache(maxsize=None)
def e3nn_wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Wigner-3j in e3nn's sign convention (unit Frobenius norm).

    Derivation: e3nn conjugates the complex CG with Q_l' = (-i)^l Q_l (its
    ``change_basis_real_to_complex``); relative to our contraction
    ``einsum(conj(Q1), conj(Q2), Q3, cg)`` the phases multiply to
    (-i)^(l1+l2-l3) (e3nn conjugates only the output-side basis change),
    which rotates the
    purely-real-or-imaginary raw intertwiner onto the real axis with a
    definite sign — no post-hoc sign fix, unlike core/cg.py.
    """
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    cg = su2_cg(l1, l2, l3)
    Q1 = real_basis_change(l1)
    Q2 = real_basis_change(l2)
    Q3 = real_basis_change(l3)
    C = np.einsum("ia,jb,kc,abc->ijk", np.conj(Q1), np.conj(Q2), Q3, cg)
    C = (-1j) ** ((l1 + l2 - l3) % 4) * C
    re, im = np.real(C), np.imag(C)
    assert np.linalg.norm(im) < 1e-9 * max(np.linalg.norm(re), 1.0), (
        f"e3nn intertwiner not real for {(l1, l2, l3)}"
    )
    out = re / np.linalg.norm(re)
    return np.ascontiguousarray(out)


@functools.lru_cache(maxsize=None)
def e3nn_w3j_sign(l1: int, l2: int, l3: int) -> float:
    """s with e3nn_w3j = s * ours_w3j (±1 for allowed triples).

    TP path weights convert as w_ours = s * w_e3nn (the CG sign is absorbed
    into the path weight).
    """
    ours = wigner_3j(l1, l2, l3)
    theirs = e3nn_wigner_3j(l1, l2, l3)
    denom = float(np.sum(ours * ours))
    if denom == 0.0:
        return 1.0
    s = float(np.sum(theirs * ours) / denom)
    assert abs(abs(s) - 1.0) < 1e-9, (
        f"e3nn w3j is not ±ours for {(l1, l2, l3)}: s={s}"
    )
    assert np.allclose(theirs, s * ours, atol=1e-10)
    return round(s)


@functools.lru_cache(maxsize=None)
def path_weight_sign(l1: int, l2: int, l3: int) -> int:
    """Sign to apply to a reference TP path weight when importing.

    Converted features are f_ours = T_l f_e3nn with T_l = R_l^T = σ_l D_l(M)^T.
    Conjugating the e3nn contraction by (T_{l1},T_{l2},T_{l3}) leaves the
    D(M) parts invariant (intertwiner property) and multiplies by the σ's;
    relating the result to our w3j representative brings in s = e3nn/ours:

        w_ours = s(l1,l2,l3) · σ_{l1} σ_{l2} σ_{l3} · w_e3nn

    Consistency: SH-recursion triples (l, 1, l+1) come out +1 — both
    frameworks generate SH with positive recursion constants, so those paths
    must not flip.
    """
    return int(
        e3nn_w3j_sign(l1, l2, l3) * std_sign(l1) * std_sign(l2) * std_sign(l3)
    )


def _self_check():
    """Anchors published in e3nn's own documentation."""
    w110 = e3nn_wigner_3j(1, 1, 0)
    assert np.allclose(w110[:, :, 0], np.eye(3) / math.sqrt(3.0), atol=1e-12), w110
    w111 = e3nn_wigner_3j(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for i, j, k in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        eps[i, j, k] = 1.0
        eps[j, i, k] = -1.0
    assert np.allclose(w111, eps / math.sqrt(6.0), atol=1e-12), w111
    # basis rotations are orthogonal and l=1 is the coordinate permutation
    for l in range(4):
        R = e3nn_basis_rotation(l)
        assert np.allclose(R @ R.T, np.eye(2 * l + 1), atol=1e-10)
    # ours_Y1 = (y,z,x); e3nn_Y1(v) = std_Y1(Mv) = (v_z, v_x, v_y)... = R1 @ ours
    R1 = e3nn_basis_rotation(1)
    v = np.array([0.3, -0.7, 0.55])
    std = np.array([v[1], v[2], v[0]])
    perm = E3NN_COORD_PERM @ v
    assert np.allclose(R1 @ std, np.array([perm[1], perm[2], perm[0]]), atol=1e-12)


_self_check()
