"""Unit tests for irreps metadata, CG tables, spherical harmonics and tensor products."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import (
    Irrep,
    Irreps,
    TensorProduct,
    depthwise_tp,
    fully_connected_tp,
    spherical_harmonics,
    wigner_3j,
    wigner_3j_component,
)
from equiformer_tpu.core.rotations import random_rotation, transform, wigner_D


RNG = np.random.default_rng(0)


# ----------------------------------------------------------------- irreps
def test_irreps_parse_dim():
    irr = Irreps("128x0e+64x1e+32x2e")
    assert irr.dim == 128 + 64 * 3 + 32 * 5
    assert irr.num_irreps == 224
    assert irr.lmax == 2
    assert str(irr) == "128x0e+64x1e+32x2e"


def test_irreps_sort_even_first():
    irr = Irreps("1x1o+2x0e+3x1e+1x0o")
    s, p, inv = irr.sort_even_first()
    assert str(s) == "2x0e+1x0o+3x1e+1x1o"
    # p maps old block index to new position
    assert [p[i] for i in range(4)] == [3, 0, 2, 1]


def test_irreps_simplify():
    irr = Irreps("2x0e+3x0e+1x1e")
    assert str(irr.simplify()) == "5x0e+1x1e"


def test_irrep_product():
    out = list(Irrep.parse("1e") * Irrep.parse("1e"))
    assert out == [Irrep(0, 1), Irrep(1, 1), Irrep(2, 1)]
    out = list(Irrep.parse("1o") * Irrep.parse("1o"))
    assert out == [Irrep(0, 1), Irrep(1, 1), Irrep(2, 1)]
    out = list(Irrep.parse("1o") * Irrep.parse("2e"))
    assert out == [Irrep(1, -1), Irrep(2, -1), Irrep(3, -1)]


# --------------------------------------------------------------------- CG
@pytest.mark.parametrize("lll", [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 1, 1), (2, 2, 3), (3, 2, 1)])
def test_wigner3j_equivariance(lll):
    l1, l2, l3 = lll
    C = wigner_3j(l1, l2, l3)
    assert abs(np.linalg.norm(C) - 1.0) < 1e-10
    R = random_rotation(RNG)
    D1, D2, D3 = wigner_D(l1, R), wigner_D(l2, R), wigner_D(l3, R)
    lhs = np.einsum("ijk,ia,jb->abk", C, D1, D2)
    rhs = np.einsum("ijk,ka->ija", C, np.linalg.inv(D3).T)
    # C (D1 x D2) == D3 C  <=>  einsum forms match
    lhs2 = np.einsum("ijk,kc->ijc", np.einsum("ijk,ia,jb->abk", C, D1, D2), np.eye(2 * l3 + 1))
    rhs2 = np.einsum("ijk,ck->ijc", C, D3)
    assert np.max(np.abs(lhs2 - rhs2)) < 1e-8


def test_wigner3j_orthogonality():
    # component-normalized CG has unit per-output-component row norm
    for lll in [(1, 1, 2), (2, 1, 1), (2, 2, 2)]:
        C = wigner_3j_component(*lll)
        per_k = np.einsum("ijk,ijk->k", C, C)
        assert np.allclose(per_k, 1.0, atol=1e-10)


def test_wigner_D_is_rotation():
    R = random_rotation(RNG)
    for l in range(4):
        D = wigner_D(l, R)
        assert np.max(np.abs(D @ D.T - np.eye(2 * l + 1))) < 1e-8


# ------------------------------------------------------------------- SH
def test_sh_equivariance():
    R = random_rotation(RNG)
    x = RNG.normal(size=(16, 3))
    for l in range(5):
        y1 = np.asarray(spherical_harmonics([l], jnp.asarray(x @ R.T)))
        D = wigner_D(l, R)
        y2 = np.asarray(spherical_harmonics([l], jnp.asarray(x))) @ D.T
        assert np.max(np.abs(y1 - y2)) < 1e-8, f"l={l}"


def test_sh_component_normalization():
    x = RNG.normal(size=(2000, 3))
    for l in range(4):
        y = np.asarray(spherical_harmonics([l], jnp.asarray(x)))
        norms = np.sum(y**2, axis=-1)
        assert np.allclose(norms, 2 * l + 1, atol=1e-8)


def test_sh_parity():
    x = RNG.normal(size=(8, 3))
    for l in range(4):
        y1 = np.asarray(spherical_harmonics([l], jnp.asarray(-x)))
        y2 = np.asarray(spherical_harmonics([l], jnp.asarray(x))) * (-1) ** l
        assert np.max(np.abs(y1 - y2)) < 1e-10


def test_sh_l1_convention():
    # Y_1(x) = sqrt(3) * (y, z, x) for unit x
    x = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    y = np.asarray(spherical_harmonics([1], jnp.asarray(x)))
    expected = np.sqrt(3.0) * np.array(
        [[0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float64
    )
    assert np.max(np.abs(y - expected)) < 1e-10


def test_sh_zero_vector_safe():
    y = np.asarray(spherical_harmonics([0, 1, 2], jnp.zeros((3, 3))))
    assert np.all(np.isfinite(y))


# --------------------------------------------------------------------- TP
def _tp_equivariance(tp: TensorProduct, per_sample_weights: bool):
    n = 7
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x1 = jax.random.normal(k1, (n, tp.irreps_in1.dim))
    x2 = jax.random.normal(k2, (n, tp.irreps_in2.dim))
    wshape = (n, tp.weight_numel) if per_sample_weights else (tp.weight_numel,)
    w = jax.random.normal(k3, wshape)

    out = tp.apply(x1, x2, w)
    assert out.shape == (n, tp.irreps_out.dim)

    R = random_rotation(RNG)
    x1r = jnp.asarray(transform(tp.irreps_in1, np.asarray(x1), R))
    x2r = jnp.asarray(transform(tp.irreps_in2, np.asarray(x2), R))
    out_r = tp.apply(x1r, x2r, w)
    out_then_r = transform(tp.irreps_out, np.asarray(out), R)
    assert np.max(np.abs(np.asarray(out_r) - out_then_r)) < 1e-8


def test_fctp_equivariance():
    tp = fully_connected_tp(
        Irreps("8x0e+4x1e+2x2e"), Irreps("1x0e+1x1e+1x2e"), Irreps("8x0e+4x1e+2x2e")
    )
    _tp_equivariance(tp, per_sample_weights=False)


def test_fctp_parity_filtering():
    tp = fully_connected_tp(
        Irreps("8x0e+4x1o"), Irreps("1x0e+1x1o"), Irreps("8x0e+4x1o+2x1e")
    )
    # 1e output reachable only via 1o x 1o
    _tp_equivariance(tp, per_sample_weights=False)


def test_dtp_equivariance_per_edge_weights():
    tp = depthwise_tp(
        Irreps("8x0e+4x1e+2x2e"), Irreps("1x0e+1x1e+1x2e"), Irreps("8x0e+4x1e+2x2e")
    )
    assert tp.weight_numel > 0
    _tp_equivariance(tp, per_sample_weights=True)


def test_dtp_output_irreps_sorted_even_first():
    tp = depthwise_tp(
        Irreps("8x0e+4x1o"), Irreps("1x0e+1x1o"), Irreps("8x0e+4x1o")
    )
    ls_ps = [(mi.ir.l, mi.ir.p) for mi in tp.irreps_out]
    assert ls_ps == sorted(ls_ps, key=lambda t: (t[0], -t[1]))


def test_linear_like_scalar_second_input():
    # FCTP against 1x0e ones acts as a per-irrep linear (LinearRS semantics)
    irr = Irreps("8x0e+4x1e")
    tp = fully_connected_tp(irr, Irreps("1x0e"), irr)
    n = 5
    x = jax.random.normal(jax.random.PRNGKey(1), (n, irr.dim))
    ones = jnp.ones((n, 1))
    w = jax.random.normal(jax.random.PRNGKey(2), (tp.weight_numel,))
    out = tp.apply(x, ones, w)
    # scaling second input scales output linearly
    out2 = tp.apply(x, 2.0 * ones, w)
    assert np.allclose(np.asarray(out2), 2 * np.asarray(out), atol=1e-10)
    _tp_equivariance(tp, per_sample_weights=False)


def test_tp_fan_in_rescale():
    # uvw fan-in for single path = mul1 * mul2
    tp = fully_connected_tp(Irreps("16x0e"), Irreps("1x0e"), Irreps("8x0e"))
    assert tp.slice_sqrt_k[0] == pytest.approx(1.0 / np.sqrt(16))
    std = tp.weight_std_flat()
    assert std.shape == (16 * 8,)
    assert np.allclose(std, 1.0 / np.sqrt(16))
