"""Equivariance and semantics tests for nn primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps
from equiformer_tpu.core.rotations import random_rotation, transform
from equiformer_tpu.nn import (
    Activation,
    EquivariantDropout,
    EquivariantLayerNorm,
    EquivariantLayerNormFast,
    EquivariantGraphNorm,
    Gate,
    IrrepsLinear,
    RadialProfile,
    SeparableFCTP,
    gate_for,
    irreps2gate,
    make_rbf,
    normalized_activation,
)

RNG = np.random.default_rng(1)
IRR = Irreps("8x0e+4x1e+2x2e")


def _check_equivariant(fn, irreps_in, irreps_out, x, atol=1e-7):
    out = np.asarray(fn(x))
    R = random_rotation(RNG)
    xr = jnp.asarray(transform(irreps_in, np.asarray(x), R))
    out_r = np.asarray(fn(xr))
    assert np.max(np.abs(out_r - transform(irreps_out, out, R))) < atol


def test_irreps_linear_equivariance_and_bias():
    lin = IrrepsLinear(IRR, IRR)
    x = jnp.asarray(RNG.normal(size=(5, IRR.dim)))
    params = lin.init(jax.random.PRNGKey(0), x)
    _check_equivariant(lambda z: lin.apply(params, z), IRR, IRR, x)
    # bias on scalars only: zero input -> nonzero only via bias (zeros init)
    out0 = lin.apply(params, jnp.zeros_like(x))
    assert np.allclose(np.asarray(out0), 0.0)


def test_irreps_linear_drops_unmatched():
    lin = IrrepsLinear(Irreps("4x1e"), Irreps("4x0e+4x1e"))
    x = jnp.asarray(RNG.normal(size=(3, 12)))
    params = lin.init(jax.random.PRNGKey(0), x)
    out = lin.apply(params, x)
    assert out.shape == (3, 16)
    assert np.allclose(np.asarray(out[:, :4]), 0.0)  # 0e from nothing + zero bias


def test_normalize2mom_unit_second_moment():
    f = normalized_activation("silu")
    z = jnp.asarray(RNG.normal(size=(200000,)))
    second = float(jnp.mean(f(z) ** 2))
    assert abs(second - 1.0) < 2e-2


def test_irreps2gate_split():
    irr = Irreps("16x0e+4x0o+8x1e")
    scalars, gates, gated = irreps2gate(irr)
    assert str(scalars) == "16x0e"
    assert str(gated) == "4x0o+8x1e"
    assert str(gates) == "12x0e"


def test_gate_equivariance():
    gate, irreps_in = gate_for(IRR)
    x = jnp.asarray(RNG.normal(size=(6, irreps_in.dim)))
    _check_equivariant(gate, irreps_in, gate.irreps_out, x)


def test_layer_norm_equivariance():
    for cls in (EquivariantLayerNorm, EquivariantLayerNormFast):
        ln = cls(IRR)
        x = jnp.asarray(RNG.normal(size=(5, IRR.dim)))
        params = ln.init(jax.random.PRNGKey(0), x)
        _check_equivariant(lambda z: ln.apply(params, z), IRR, IRR, x, atol=1e-6)


def test_graph_norm_equivariance_and_masking():
    gn = EquivariantGraphNorm(IRR)
    n, g = 10, 3
    x = jnp.asarray(RNG.normal(size=(n, IRR.dim)))
    batch = jnp.asarray(np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 2]))
    mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 1, 0, 0], bool))
    params = gn.init(jax.random.PRNGKey(0), x, batch=batch, node_mask=mask, num_graphs=g)
    fn = lambda z: gn.apply(params, z, batch=batch, node_mask=mask, num_graphs=g)
    out = np.asarray(fn(x))
    R = random_rotation(RNG)
    out_r = np.asarray(fn(jnp.asarray(transform(IRR, np.asarray(x), R))))
    # only compare real nodes (padded rows see arbitrary stats)
    real = np.asarray(mask)
    assert np.max(np.abs(out_r[real] - transform(IRR, out, R)[real])) < 1e-6
    # masked nodes must not affect real-node outputs
    x2 = np.asarray(x).copy()
    x2[8:] += 100.0
    out2 = np.asarray(fn(jnp.asarray(x2)))
    assert np.max(np.abs(out2[real] - out[real])) < 1e-8


def test_equivariant_dropout_structure():
    drop = EquivariantDropout(IRR, 0.5)
    x = jnp.asarray(RNG.normal(size=(4, IRR.dim)))
    params = drop.init({"params": jax.random.PRNGKey(0)}, x)
    out = drop.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out = np.asarray(out)
    # whole irrep copies are dropped together: within each l>0 copy, either all
    # components zero or scaled by 1/keep (component-major block [d, mul])
    blk = out[:, 8 : 8 + 12].reshape(4, 3, 4)  # the 4x1e block
    x_blk = np.asarray(x)[:, 8 : 8 + 12].reshape(4, 3, 4)
    ratio = blk / x_blk
    for i in range(4):
        for u in range(4):
            r = ratio[i, :, u]
            assert np.allclose(r, r[0], atol=1e-6)
            assert abs(r[0]) < 1e-9 or abs(r[0] - 2.0) < 1e-6
    # deterministic passthrough
    out_det = drop.apply(params, x, deterministic=True)
    assert np.allclose(np.asarray(out_det), np.asarray(x))


def test_rbf_shapes_and_cutoff():
    d = jnp.asarray(np.linspace(0.1, 6.0, 50))
    for kind in ("gaussian", "bessel", "exp"):
        rbf = make_rbf(kind, 16, 5.0)
        params = rbf.init(jax.random.PRNGKey(0), d)
        out = np.asarray(rbf.apply(params, d))
        assert out.shape == (50, 16)
        assert np.all(np.isfinite(out))
    # exp/bessel vanish beyond cutoff
    for kind in ("bessel", "exp"):
        rbf = make_rbf(kind, 16, 5.0)
        params = rbf.init(jax.random.PRNGKey(0), d)
        out = np.asarray(rbf.apply(params, d))
        assert np.allclose(out[np.asarray(d) > 5.0], 0.0)


def test_separable_fctp_equivariance():
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    sep = SeparableFCTP(
        IRR, sh_irr, IRR, fc_neurons=(16, 16), use_activation=True,
        norm_layer=None, internal_weights=False,
    )
    e = 11
    x = jnp.asarray(RNG.normal(size=(e, IRR.dim)))
    vec = RNG.normal(size=(e, 3))
    scal = jnp.asarray(RNG.normal(size=(e, 16)))
    from equiformer_tpu.core.spherical import spherical_harmonics

    sh = spherical_harmonics([0, 1, 2], jnp.asarray(vec))
    params = sep.init(jax.random.PRNGKey(0), x, sh, scal)
    out = np.asarray(sep.apply(params, x, sh, scal))
    R = random_rotation(RNG)
    sh_r = spherical_harmonics([0, 1, 2], jnp.asarray(vec @ R.T))
    out_r = np.asarray(
        sep.apply(params, jnp.asarray(transform(IRR, np.asarray(x), R)), sh_r, scal)
    )
    assert np.max(np.abs(out_r - transform(IRR, out, R))) < 1e-6


def test_layer_norm_v3_v4_equivariance():
    from equiformer_tpu.nn import EquivariantLayerNormV3, EquivariantLayerNormV4

    for cls in (EquivariantLayerNormV3, EquivariantLayerNormV4):
        ln = cls(IRR)
        x = jnp.asarray(RNG.normal(size=(5, IRR.dim)))
        params = ln.init(jax.random.PRNGKey(0), x)
        _check_equivariant(lambda z: ln.apply(params, z), IRR, IRR, x, atol=1e-6)


def test_concat_irreps_alignment():
    from equiformer_tpu.nn import concat_irreps
    from equiformer_tpu.core.rotations import random_rotation, transform

    irr1 = Irreps("4x0e+2x1e")
    irr2 = Irreps("3x0e+1x1e+1x2e")
    x1 = jnp.asarray(RNG.normal(size=(3, irr1.dim)))
    x2 = jnp.asarray(RNG.normal(size=(3, irr2.dim)))
    out, irr_out = concat_irreps(irr1, irr2, x1, x2)
    assert out.shape == (3, irr1.dim + irr2.dim)
    assert str(irr_out) == "7x0e+3x1e+1x2e"
    # equivariance of the concatenated layout
    R = random_rotation(RNG)
    o2, _ = concat_irreps(
        irr1, irr2,
        jnp.asarray(transform(irr1, np.asarray(x1), R)),
        jnp.asarray(transform(irr2, np.asarray(x2), R)),
    )
    assert np.max(np.abs(np.asarray(o2) - transform(irr_out, np.asarray(out), R))) < 1e-8


def test_graph_norm_v2_equivariance_and_init():
    """GraphNormV2 (reference graph_norm.py:141-238): learnable mean-shift on
    every irrep; at init (ones on even scalars, zeros elsewhere) it must match
    instance-norm-with-scalar-centering, and stay equivariant with a nonzero
    shift on l>0 blocks."""
    from equiformer_tpu.nn import EquivariantGraphNormV2, EquivariantInstanceNorm

    gn = EquivariantGraphNormV2(IRR)
    n, g = 10, 3
    x = jnp.asarray(RNG.normal(size=(n, IRR.dim)))
    batch = jnp.asarray(np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 2]))
    mask = jnp.asarray(np.ones(n, bool))
    params = gn.init(jax.random.PRNGKey(0), x, batch=batch, node_mask=mask, num_graphs=g)

    # at init == instance norm (mean_shift is 1 on even scalars, 0 on l>0)
    inorm = EquivariantInstanceNorm(IRR)
    iparams = inorm.init(jax.random.PRNGKey(0), x, batch=batch, node_mask=mask, num_graphs=g)
    out_v2 = np.asarray(gn.apply(params, x, batch=batch, node_mask=mask, num_graphs=g))
    out_in = np.asarray(inorm.apply(iparams, x, batch=batch, node_mask=mask, num_graphs=g))
    assert np.max(np.abs(out_v2 - out_in)) < 1e-6

    # perturb mean_shift so l>0 centering is active, then check equivariance
    import flax

    p = flax.core.unfreeze(params)
    p["params"]["mean_shift"] = p["params"]["mean_shift"] + 0.37
    fn = lambda z: gn.apply(p, z, batch=batch, node_mask=mask, num_graphs=g)
    out = np.asarray(fn(x))
    R = random_rotation(RNG)
    out_r = np.asarray(fn(jnp.asarray(transform(IRR, np.asarray(x), R))))
    assert np.max(np.abs(out_r - transform(IRR, out, R))) < 1e-6
