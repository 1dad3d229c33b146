"""End-to-end model tests: forward shape, rotation invariance, masking, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps
from equiformer_tpu.core.rotations import random_rotation
from equiformer_tpu.graph import collate
from equiformer_tpu.models import GraphAttentionTransformer, list_models, model_entrypoint

RNG = np.random.default_rng(3)


def _tiny_model(**kw):
    base = dict(
        irreps_node_embedding=Irreps("16x0e+8x1e+4x2e"),
        num_layers=2,
        irreps_sh=Irreps("1x0e+1x1e+1x2e"),
        max_radius=2.5,
        number_of_basis=8,
        fc_neurons=(8, 8),
        irreps_feature=Irreps("32x0e"),
        irreps_head=Irreps("4x0e+2x1e+1x2e"),
        num_heads=2,
        irreps_mlp_mid=Irreps("24x0e+12x1e+6x2e"),
        alpha_drop=0.1,
        proj_drop=0.1,
        drop_path_rate=0.1,
        max_atom_type=5,
        max_edges=256,
    )
    base.update(kw)
    return GraphAttentionTransformer(**base)


def _batch(n_graphs=3, n_atoms=(5, 4, 6), cap=20, seed=7):
    rng = np.random.default_rng(seed)
    graphs = [
        {
            "pos": rng.normal(size=(n, 3)).astype(np.float64),
            "species": rng.integers(0, 5, size=n),
            "y": rng.normal(),
        }
        for n in n_atoms
    ]
    b = collate(graphs, node_capacity=cap, graph_capacity=n_graphs + 1)
    b.pos = jnp.asarray(b.pos, jnp.float64)
    b.species = jnp.asarray(b.species)
    b.batch = jnp.asarray(b.batch)
    b.node_mask = jnp.asarray(b.node_mask)
    b.graph_mask = jnp.asarray(b.graph_mask)
    return b


@pytest.mark.parametrize("nonlinear", [False, True])
def test_forward_and_rotation_invariance(nonlinear):
    model = _tiny_model(nonlinear_message=nonlinear)
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(params, b, deterministic=True)
    assert out.shape == (4,)
    assert np.all(np.isfinite(np.asarray(out)))

    R = random_rotation(RNG)
    import dataclasses

    b_rot = dataclasses.replace(b, pos=jnp.asarray(np.asarray(b.pos) @ R.T))
    out_r = model.apply(params, b_rot, deterministic=True)
    # scalar prediction is rotation invariant
    assert np.max(np.abs(np.asarray(out) - np.asarray(out_r))) < 1e-7


def test_translation_invariance():
    model = _tiny_model()
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(params, b, deterministic=True)
    import dataclasses

    b2 = dataclasses.replace(b, pos=b.pos + jnp.asarray(np.array([10.0, -3.0, 7.0])))
    out_t = model.apply(params, b2, deterministic=True)
    assert np.max(np.abs(np.asarray(out) - np.asarray(out_t))) < 1e-7


def test_padding_independence():
    """Extra padding slots must not change predictions."""
    model = _tiny_model()
    b_small = _batch(cap=16)
    b_large = _batch(cap=24)
    params = model.init(jax.random.PRNGKey(0), b_small, deterministic=True)
    out_s = np.asarray(model.apply(params, b_small, deterministic=True))
    out_l = np.asarray(model.apply(params, b_large, deterministic=True))
    assert np.max(np.abs(out_s - out_l)) < 1e-8


@pytest.mark.slow
def test_gradients_finite():
    model = _tiny_model(nonlinear_message=True)
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)

    def loss(p):
        out = model.apply(p, b, deterministic=True)
        return jnp.sum(jnp.where(b.graph_mask, out, 0.0) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # and at least something is nonzero
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_dropout_training_mode_runs():
    model = _tiny_model(nonlinear_message=True)
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(
        params, b, deterministic=False, rngs={"dropout": jax.random.PRNGKey(5)}
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_registry_entrypoints():
    names = list_models()
    assert "graph_attention_transformer_nonlinear_l2" in names
    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=16, max_edges=256
    )
    assert model.nonlinear_message is True


@pytest.mark.slow
def test_e3_variant_forward():
    model = model_entrypoint("graph_attention_transformer_nonlinear_l2_e3")(
        radius=2.5, num_basis=8, max_edges=256
    )
    # shrink for test speed
    object.__setattr__(model, "num_layers", 1)
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(params, b, deterministic=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dot_product_attention_model():
    model = _tiny_model(attn_type="dot")
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(params, b, deterministic=True)
    assert np.all(np.isfinite(np.asarray(out)))
    # rotation invariance of the dp variant
    import dataclasses
    from equiformer_tpu.core.rotations import random_rotation

    R = random_rotation(RNG)
    br = dataclasses.replace(b, pos=jnp.asarray(np.asarray(b.pos) @ R.T))
    outr = model.apply(params, br, deterministic=True)
    assert np.max(np.abs(np.asarray(out) - np.asarray(outr))) < 1e-6
    from equiformer_tpu.models import model_entrypoint

    m = model_entrypoint("dot_product_attention_transformer_l2")(
        radius=5.0, num_basis=8, max_edges=128
    )
    assert m.attn_type == "dot"


@pytest.mark.slow
def test_bf16_compute_dtype():
    model = _tiny_model(compute_dtype="bfloat16", alpha_drop=0.0, proj_drop=0.0,
                        drop_path_rate=0.0)
    b = _batch()
    import dataclasses
    b = dataclasses.replace(b, pos=jnp.asarray(np.asarray(b.pos), jnp.float32))
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(params, b, deterministic=True)
    assert out.dtype == jnp.float32  # readout promoted back
    assert np.all(np.isfinite(np.asarray(out)))


def test_e3_variant_inversion_invariance():
    """The E(3) variant must be invariant under spatial inversion (parity)."""
    import dataclasses

    model = model_entrypoint("graph_attention_transformer_nonlinear_l2_e3")(
        radius=2.5, num_basis=8, max_edges=256
    )
    object.__setattr__(model, "num_layers", 1)
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = np.asarray(model.apply(params, b, deterministic=True))
    b_inv = dataclasses.replace(b, pos=-b.pos)
    out_inv = np.asarray(model.apply(params, b_inv, deterministic=True))
    assert np.max(np.abs(out - out_inv)) < 1e-7
