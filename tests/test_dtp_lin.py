"""Fused DTP+linear kernel (kernels/dtp_lin_pallas.py) vs the unfused
composition ``IrrepsLinear(plan.irreps_out, target)(plan.apply(x, sh, w))`` —
value and all first-order gradients, in interpret mode on CPU.

Reference semantics: DepthwiseTensorProduct -> LinearRS inside SeparableFCTP
(/root/reference/nets/graph_attention_transformer.py:186-248)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps, depthwise_tp
from equiformer_tpu.kernels.dtp_lin_pallas import DTPLinPlan, make_fused_dtp_lin

IRR = Irreps("8x0e+4x1e+2x2e")
SH = Irreps("1x0e+1x1e+1x2e")
TP = depthwise_tp(IRR, SH, IRR)
LIN_OUT = Irreps("14x0e+4x1e+2x2e")
ALPHA_OUT = Irreps("6x0e")
E = 256  # two grid cells at tile 128: exercises the dW grid accumulation


def _head_ws(hirr, seed, tp=TP):
    out = []
    keys = jax.random.split(jax.random.PRNGKey(seed), max(len(hirr), 1))
    for i, (mul_out, ir_out) in enumerate(hirr):
        fan = sum(m for m, ir in tp.irreps_out if ir == ir_out)
        out.append(
            jax.random.normal(keys[i], (fan, mul_out), jnp.float32) if fan else None
        )
    return out


def _ref_lin(z, hirr, head_ws, tp=TP):
    slices = tp.irreps_out.slices()
    pieces = []
    for oi, (mul_out, ir_out) in enumerate(hirr):
        blocks = [
            z[..., slices[ii]].reshape(z.shape[:-1] + (ir.dim, m))
            for ii, (m, ir) in enumerate(tp.irreps_out)
            if ir == ir_out
        ]
        if blocks:
            inp = jnp.concatenate(blocks, axis=-1) if len(blocks) > 1 else blocks[0]
            o = jnp.einsum("...iu,uw->...iw", inp, head_ws[oi])
        else:
            o = jnp.zeros(z.shape[:-1] + (ir_out.dim, mul_out))
        pieces.append(o.reshape(o.shape[:-2] + (mul_out * ir_out.dim,)))
    return jnp.concatenate(pieces, axis=-1)


def _data():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (E, IRR.dim), jnp.float32)
    sh = jax.random.normal(ks[1], (E, SH.dim), jnp.float32)
    w = jax.random.normal(ks[2], (E, TP.weight_numel), jnp.float32)
    return x, sh, w


@pytest.mark.slow
@pytest.mark.parametrize("save_z", [False, True], ids=["remat-z", "save-z"])
@pytest.mark.parametrize(
    "shared,heads",
    [
        (False, [LIN_OUT]),
        (False, [LIN_OUT, ALPHA_OUT]),
        (True, [LIN_OUT]),
    ],
    ids=["single", "two-head", "shared-w"],
)
def test_fused_dtp_lin_matches_composition(shared, heads, save_z):
    x, sh, w = _data()
    plan = DTPLinPlan(TP, heads, fold_rescale=True, shared_weights=shared)
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True, save_z=save_z)
    hws = [_head_ws(h, 10 + i) for i, h in enumerate(heads)]
    ww = w[0] if shared else w

    def f_fused(x, sh, ww, hws):
        return plan.split_output(fused(x, sh, ww, plan.pack_weights(hws)))

    def f_ref(x, sh, ww, hws):
        z = TP.apply(x, sh, ww if not shared else ww[None, :], scale_weights=True)
        return [_ref_lin(z, h, hw) for h, hw in zip(heads, hws)]

    for a, b in zip(f_fused(x, sh, ww, hws), f_ref(x, sh, ww, hws)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss(f):
        return lambda *args: sum(jnp.sum(o**2) for o in f(*args))

    gf = jax.grad(loss(f_fused), argnums=(0, 1, 2, 3))(x, sh, ww, hws)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2, 3))(x, sh, ww, hws)
    for name, a, b in zip(("dx", "dsh", "dw", "dW"), gf, gr):
        for u, v in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), atol=2e-4 * scale, err_msg=name
            )


@pytest.mark.slow  # 38s on one core; padding semantics also covered by
# test_padding_to_tile and the HO padding/tile-skip test
def test_fused_dtp_lin_edge_padding():
    """Non-multiple-of-tile edge counts go through the pad/unpad wrapper."""
    x, sh, w = _data()
    x, sh, w = x[:200], sh[:200], w[:200]
    plan = DTPLinPlan(TP, [LIN_OUT])
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True)
    hws = [_head_ws(LIN_OUT, 3)]
    out = plan.split_output(fused(x, sh, w, plan.pack_weights(hws)))[0]
    z = TP.apply(x, sh, w, scale_weights=True)
    ref = _ref_lin(z, LIN_OUT, hws[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_model_fused_vs_unfused(monkeypatch):
    """Mini nonlinear-message model: identical params, outputs and grads
    between the einsum path and the fused Pallas path."""
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.models import GraphAttentionTransformer

    def build():
        return GraphAttentionTransformer(
            irreps_node_embedding=Irreps("16x0e+8x1e+4x2e"),
            num_layers=1,
            irreps_sh=Irreps("1x0e+1x1e+1x2e"),
            max_radius=5.0,
            number_of_basis=16,
            fc_neurons=(16, 16),
            irreps_feature=Irreps("32x0e"),
            irreps_head=Irreps("4x0e+2x1e+1x2e"),
            num_heads=2,
            irreps_mlp_mid=Irreps("16x0e+8x1e+4x2e"),
            alpha_drop=0.0,
            proj_drop=0.0,
            max_atom_type=5,
            max_edges=512,
            nonlinear_message=True,
            higher_order_grads=False,
        )

    batch = next(iter(GraphLoader(qm9_like_dataset(4, seed=0), 4,
                                  node_capacity=96, shuffle=False)))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    monkeypatch.setenv("EQUIFORMER_TPU_PALLAS", "0")
    model = build()
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

    def loss_of(m):
        return lambda p: jnp.sum(
            jnp.where(batch.graph_mask, m.apply(p, batch, deterministic=True), 0.0)
        )

    out_ref = model.apply(params, batch, deterministic=True)
    g_ref = jax.grad(loss_of(model))(params)

    monkeypatch.setenv("EQUIFORMER_TPU_PALLAS", "1")
    monkeypatch.setenv("EQUIFORMER_TPU_FUSED_DTPLIN", "1")
    model_f = build()
    params_f = model_f.init(jax.random.PRNGKey(0), batch, deterministic=True)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    out_fused = model_f.apply(params, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=1e-4
    )
    g_fused = jax.grad(loss_of(model_f))(params)
    for u, v in zip(
        jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)
    ):
        scale = max(1.0, float(jnp.max(jnp.abs(v))))
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-4 * scale)


@pytest.mark.slow
@pytest.mark.parametrize("save_z", [False, True], ids=["remat-z", "save-z"])
def test_fused_dtp_lin_no_x_backward(save_z):
    """The model path's folded-shared plan (needs_dsh=False): with save_z the
    backward reads no x at all; dx/dw/dW must still match the composition."""
    x, sh, w = _data()
    plan = DTPLinPlan(
        TP, [LIN_OUT], fold_rescale=True, shared_weights=True, needs_dsh=False
    )
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True, save_z=save_z)
    hws = [_head_ws(LIN_OUT, 11)]
    ww = w[0]

    def f_fused(x, ww, hws):
        return plan.split_output(fused(x, sh, ww, plan.pack_weights(hws)))[0]

    def f_ref(x, ww, hws):
        z = TP.apply(x, sh, ww[None, :], scale_weights=True)
        return _ref_lin(z, LIN_OUT, hws[0])

    np.testing.assert_allclose(
        np.asarray(f_fused(x, ww, hws)), np.asarray(f_ref(x, ww, hws)), atol=2e-5
    )

    def loss(f):
        return lambda *a: jnp.sum(f(*a) ** 2)

    gf = jax.grad(loss(f_fused), argnums=(0, 1, 2))(x, ww, hws)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2))(x, ww, hws)
    for name, a, b in zip(("dx", "dw", "dW"), gf, gr):
        for u, v in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), atol=2e-4 * scale, err_msg=name
            )


@pytest.mark.slow
@pytest.mark.parametrize("save_z", [False, True], ids=["remat-z", "save-z"])
def test_fused_dtp_lin_tile_skipping(save_z):
    """n_edges < E: fully-padded tail tiles emit zeros and zero cotangents,
    active-tile results are unchanged."""
    x, sh, w = _data()  # E = 256 = two tiles at T=128
    plan = DTPLinPlan(TP, [LIN_OUT])
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True, save_z=save_z)
    hws = [_head_ws(LIN_OUT, 3)]
    Ws = plan.pack_weights(hws)
    n = 100  # tile 0 active, tile 1 fully padded

    out_n = fused(x, sh, w, Ws, n_edges=jnp.asarray(n))
    out_full = fused(x, sh, w, Ws)
    np.testing.assert_allclose(np.asarray(out_n[:128]), np.asarray(out_full[:128]))
    assert np.all(np.asarray(out_n[128:]) == 0.0)

    def loss(f):
        return lambda *a: jnp.sum(f(*a)[:n] ** 2)

    gn = jax.grad(loss(lambda x, s, w: fused(x, s, w, Ws, n_edges=jnp.asarray(n))),
                  argnums=(0, 1, 2))(x, sh, w)
    gf = jax.grad(loss(lambda x, s, w: fused(x, s, w, Ws)), argnums=(0, 1, 2))(x, sh, w)
    for a, b in zip(gn, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize(
    "shared,heads",
    [
        (False, ["256x0e+128x1e"]),
        (False, ["256x0e+128x1e", "12x0e"]),
        (True, ["256x0e+128x1e"]),
    ],
    ids=["single", "two-head", "shared-w"],
)
@pytest.mark.slow
@pytest.mark.parametrize("save_z", [False, True], ids=["remat-z", "save-z"])
def test_fused_dtp_lin_mul256(shared, heads, save_z):
    """mul > 128 blocks (OC20's 256x0e flagship,
    /root/reference/nets/graph_attention_transformer_oc20.py:84) split across
    multiple 128-lane sub-slots: value + all first-order grads must match the
    unfused composition."""
    big = Irreps("256x0e+128x1e")
    tp_big = depthwise_tp(big, Irreps("1x0e+1x1e"), big)
    heads = [Irreps(h) for h in heads]
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(ks[0], (E, big.dim), jnp.float32)
    sh = jax.random.normal(ks[1], (E, 4), jnp.float32)
    w = jax.random.normal(ks[2], (E, tp_big.weight_numel), jnp.float32)
    plan = DTPLinPlan(tp_big, heads, fold_rescale=True, shared_weights=shared)
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True, save_z=save_z)
    hws = [_head_ws(h, 20 + i, tp_big) for i, h in enumerate(heads)]
    ww = w[0] if shared else w

    def f_fused(x, sh, ww, hws):
        return plan.split_output(fused(x, sh, ww, plan.pack_weights(hws)))

    def f_ref(x, sh, ww, hws):
        z = tp_big.apply(
            x, sh, ww if not shared else ww[None, :], scale_weights=True
        )
        return [_ref_lin(z, h, hw, tp_big) for h, hw in zip(heads, hws)]

    for a, b in zip(f_fused(x, sh, ww, hws), f_ref(x, sh, ww, hws)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6 * scale
        )

    def loss(f):
        return lambda *args: sum(jnp.sum(o**2) for o in f(*args))

    gf = jax.grad(loss(f_fused), argnums=(0, 1, 2, 3))(x, sh, ww, hws)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2, 3))(x, sh, ww, hws)
    for name, a, b in zip(("dx", "dsh", "dw", "dW"), gf, gr):
        for u, v in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), atol=3e-4 * scale, err_msg=name
            )


def test_fused_plan_accepts_large_mul():
    """_make_fused_plan no longer rejects OC20's mul=256: the fused path is
    available (round-2 fallback pin removed)."""
    big = Irreps("256x0e+128x1e")
    tp_big = depthwise_tp(big, Irreps("1x0e+1x1e"), big)

    from equiformer_tpu.nn.tp_modules import _make_fused_plan

    os.environ["EQUIFORMER_TPU_PALLAS"] = "1"
    try:
        fplan, fused = _make_fused_plan(tp_big, [big], False, False)
    finally:
        del os.environ["EQUIFORMER_TPU_PALLAS"]
    assert fplan is not None and fused is not None
