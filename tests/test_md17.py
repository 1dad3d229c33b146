"""MD17 energy+force model tests: force equivariance, conservativeness, training."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps
from equiformer_tpu.core.rotations import random_rotation, wigner_D
from equiformer_tpu.data import GraphLoader, md17_like_dataset
from equiformer_tpu.models import (
    GraphAttentionTransformer,
    energy_and_forces,
    list_models,
    model_entrypoint,
)
from equiformer_tpu.train import (
    TrainState,
    cosine_warmup_schedule,
    create_optimizer,
    make_md17_steps,
)

RNG = np.random.default_rng(4)


def _tiny_md17_model(**kw):
    base = dict(
        irreps_node_embedding=Irreps("16x0e+8x1e+4x2e"),
        num_layers=2,
        irreps_sh=Irreps("1x0e+1x1e+1x2e"),
        max_radius=3.0,
        number_of_basis=8,
        basis_type="exp",
        fc_neurons=(8, 8),
        irreps_feature=Irreps("32x0e"),
        irreps_head=Irreps("4x0e+2x1e+1x2e"),
        num_heads=2,
        irreps_mlp_mid=Irreps("16x0e+8x1e+4x2e"),
        alpha_drop=0.0,
        proj_drop=0.0,
        max_atom_type=10,
        max_edges=1024,
    )
    base.update(kw)
    return GraphAttentionTransformer(**base)


def _batch(cap=40, seed=11):
    data = md17_like_dataset(2, num_atoms=9, seed=seed)
    loader = GraphLoader(
        data, batch_size=2, node_capacity=cap, shuffle=False, with_forces=True
    )
    b = next(iter(loader))
    return dataclasses.replace(
        b,
        pos=jnp.asarray(b.pos, jnp.float64),
        forces=jnp.asarray(b.forces, jnp.float64),
        y=jnp.asarray(b.y, jnp.float64),
    )


def test_forces_shape_and_finite():
    model = _tiny_md17_model()
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e, f = energy_and_forces(model, params, b)
    assert e.shape == (2,)
    assert f.shape == b.pos.shape
    assert np.all(np.isfinite(np.asarray(f)))
    # padded nodes get zero force
    assert np.allclose(np.asarray(f)[~np.asarray(b.node_mask)], 0.0)


def test_forces_equivariant():
    """F(Rx) = R F(x): forces rotate as vectors."""
    model = _tiny_md17_model()
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e, f = energy_and_forces(model, params, b)
    R = random_rotation(RNG)
    br = dataclasses.replace(b, pos=jnp.asarray(np.asarray(b.pos) @ R.T))
    er, fr = energy_and_forces(model, params, br)
    assert np.max(np.abs(np.asarray(er) - np.asarray(e))) < 1e-6
    assert np.max(np.abs(np.asarray(fr) - np.asarray(f) @ R.T)) < 1e-6


def test_forces_are_conservative_gradient():
    """Forces match -dE/dpos by finite differences."""
    model = _tiny_md17_model()
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    _, f = energy_and_forces(model, params, b)
    eps = 1e-5
    i, k = 3, 1  # a real atom, y-coordinate
    pos_p = np.asarray(b.pos).copy()
    pos_p[i, k] += eps
    pos_m = np.asarray(b.pos).copy()
    pos_m[i, k] -= eps
    ep = model.apply(params, dataclasses.replace(b, pos=jnp.asarray(pos_p)), deterministic=True)
    em = model.apply(params, dataclasses.replace(b, pos=jnp.asarray(pos_m)), deterministic=True)
    fd = -(float(jnp.sum(ep)) - float(jnp.sum(em))) / (2 * eps)
    assert abs(fd - float(f[i, k])) < 1e-5


@pytest.mark.slow
def test_md17_training_double_backward():
    """A few steps of energy+force training decrease the joint loss (this
    exercises grad-of-grad through the whole network)."""
    model = _tiny_md17_model()
    data = md17_like_dataset(8, num_atoms=9, seed=5)
    # learnable targets: constant energy, zero forces (its exact gradient)
    for g in data:
        g["y"] = np.float32(2.0)
        g["forces"] = np.zeros_like(g["forces"])
    loader = GraphLoader(
        data, batch_size=4, node_capacity=40, shuffle=False, with_forces=True
    )
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0, deterministic=True)
    opt = create_optimizer(
        cosine_warmup_schedule(2e-3, 2, 200), weight_decay=1e-6, grad_clip_norm=100.0
    )
    train_step, eval_step = make_md17_steps(
        model, opt, 0.0, 1.0, energy_weight=1.0, force_weight=80.0
    )
    state = TrainState.create(params, opt)
    step = jax.jit(train_step)
    losses = []
    rng = jax.random.PRNGKey(1)
    for epoch in range(15):
        for batch in loader:
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.7 * losses[0], losses[::10]


def test_md17_registry():
    names = list_models()
    for n in [
        "graph_attention_transformer_l2_md17",
        "graph_attention_transformer_nonlinear_exp_l3_md17",
        "graph_attention_transformer_nonlinear_attn_exp_l3_md17",
        "graph_attention_transformer_nonlinear_bessel_l3_e3_md17",
    ]:
        assert n in names
    m = model_entrypoint("graph_attention_transformer_nonlinear_attn_exp_l3_md17")(
        radius=5.0, num_basis=8, max_edges=128
    )
    assert m.use_attn_head and m.basis_type == "exp"
    assert m.irreps_node_embedding.lmax == 3


def test_attn_head_forward():
    model = _tiny_md17_model(use_attn_head=True)
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e, f = energy_and_forces(model, params, b)
    assert np.all(np.isfinite(np.asarray(e))) and np.all(np.isfinite(np.asarray(f)))
