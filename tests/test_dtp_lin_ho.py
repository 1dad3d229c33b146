"""Arbitrary-order fused DTP+linear (kernels/dtp_lin_ho.py) vs the unfused
composition — values, first gradients, and grad-of-grad (the MD17/DeNS force
pattern, reference graph_attention_transformer_md17.py:318-325), interpret
mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps, depthwise_tp
from equiformer_tpu.kernels.dtp_lin_pallas import DTPLinPlan
from equiformer_tpu.kernels.dtp_lin_ho import make_fused_dtp_lin_ho
from tests.test_dtp_lin import ALPHA_OUT, LIN_OUT, IRR, SH, TP, _data, _head_ws, _ref_lin

E = 256


def _pair(shared, heads):
    plan = DTPLinPlan(TP, heads, fold_rescale=True, shared_weights=shared,
                      needs_dsh=True)
    fused = make_fused_dtp_lin_ho(plan, tile=128, interpret=True)
    hws = [_head_ws(h, 10 + i) for i, h in enumerate(heads)]

    def f_fused(x, sh, ww):
        return plan.split_output(fused(x, sh, ww, plan.pack_weights(hws)))

    def f_ref(x, sh, ww):
        z = TP.apply(x, sh, ww if not shared else ww[None, :], scale_weights=True)
        return [_ref_lin(z, h, hw) for h, hw in zip(heads, hws)]

    return f_fused, f_ref


@pytest.mark.parametrize(
    "shared,heads",
    [
        # 'single' is subsumed by 'two-head' coverage-wise; keep it in the
        # slow tier (the fast suite runs on ONE cpu core)
        pytest.param(False, [LIN_OUT], marks=pytest.mark.slow),
        (False, [LIN_OUT, ALPHA_OUT]),
        # shared-w folding is exercised by the (faster) transpose/JVP tests;
        # the full value+grad sweep rides the slow tier (87s on one core)
        pytest.param(True, [LIN_OUT], marks=pytest.mark.slow),
    ],
    ids=["single", "two-head", "shared-w"],
)
def test_ho_fused_values_and_first_grads(shared, heads):
    x, sh, w = _data()
    ww = w[0] if shared else w
    f_fused, f_ref = _pair(shared, heads)

    for a, b in zip(f_fused(x, sh, ww), f_ref(x, sh, ww)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss(f):
        return lambda *args: sum(jnp.sum(o**2) for o in f(*args))

    gf = jax.grad(loss(f_fused), argnums=(0, 1, 2))(x, sh, ww)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2))(x, sh, ww)
    for name, a, b in zip(("dx", "dsh", "dw"), gf, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4 * scale, err_msg=name
        )


@pytest.mark.slow
@pytest.mark.parametrize("shared", [False, True], ids=["edge-w", "shared-w"])
def test_ho_fused_grad_of_grad(shared):
    """The force-training pattern: an 'energy' reduces the fused output, the
    'force' is its sh-and-x gradient (sh stands in for geometry), and the
    training loss differentiates |force|^2 wrt x, w — grad-of-grad through
    every leg kernel."""
    x, sh, w = _data()
    ww = w[0] if shared else w
    f_fused, f_ref = _pair(shared, [LIN_OUT])

    def make_loss(f):
        def energy(x, sh, ww):
            outs = f(x, sh, ww)
            return jnp.sum(jnp.tanh(outs[0]))

        def train_loss(x, sh, ww):
            fx, fsh = jax.grad(energy, argnums=(0, 1))(x, sh, ww)
            return jnp.sum(fx**2) + jnp.sum(fsh**2)

        return train_loss

    lf, lr = make_loss(f_fused), make_loss(f_ref)
    np.testing.assert_allclose(float(lf(x, sh, ww)), float(lr(x, sh, ww)),
                               rtol=1e-4)
    gf = jax.grad(lf, argnums=(0, 2))(x, sh, ww)
    gr = jax.grad(lr, argnums=(0, 2))(x, sh, ww)
    for name, a, b in zip(("ddx", "ddw"), gf, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4 * scale, err_msg=name
        )


def test_ho_fused_padding_and_tile_skip():
    """Non-multiple-of-tile edge counts + n_edges tile skipping: the padded
    tail produces zero output and zero cotangents."""
    x, sh, w = _data()
    x, sh, w = x[:200], sh[:200], w[:200]
    n_real = 150
    mask = jnp.arange(200) < n_real
    x = jnp.where(mask[:, None], x, 0)
    sh = jnp.where(mask[:, None], sh, 0)
    w = jnp.where(mask[:, None], w, 0)
    plan = DTPLinPlan(TP, [LIN_OUT], fold_rescale=True, needs_dsh=True)
    fused = make_fused_dtp_lin_ho(plan, tile=128, interpret=True)
    hws = [_head_ws(LIN_OUT, 3)]
    Ws = plan.pack_weights(hws)

    out = fused(x, sh, w, Ws, n_edges=n_real)
    z = TP.apply(x, sh, w, scale_weights=True)
    ref = _ref_lin(z, LIN_OUT, hws[0])
    ref = jnp.where(mask[:, None], ref, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss(x):
        o = fused(x, sh, w, Ws, n_edges=n_real)
        return jnp.sum(jnp.where(mask[:, None], o, 0) ** 2)

    g = jax.grad(loss)(x)
    def loss_ref(x):
        z = TP.apply(x, sh, w, scale_weights=True)
        o = _ref_lin(z, LIN_OUT, hws[0])
        return jnp.sum(jnp.where(mask[:, None], o, 0) ** 2)

    gr = jax.grad(loss_ref)(x)
    scale = max(1.0, float(jnp.max(jnp.abs(gr))))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4 * scale)


@pytest.mark.slow
def test_ho_fused_w_grad_through_folded_shared():
    """Shared weights fold into W outside the kernel; dw must chain through
    scale_shared_weights at second order too."""
    x, sh, w = _data()
    ww = w[0]
    f_fused, f_ref = _pair(True, [LIN_OUT])

    def make(f):
        def energy(x, ww):
            return jnp.sum(jnp.sin(f(x, sh, ww)[0]))

        def tl(x, ww):
            gx = jax.grad(energy, argnums=0)(x, ww)
            return jnp.sum(gx**2)

        return tl

    gw_f = jax.grad(make(f_fused), argnums=1)(x, ww)
    gw_r = jax.grad(make(f_ref), argnums=1)(x, ww)
    scale = max(1.0, float(jnp.max(jnp.abs(gw_r))))
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               atol=5e-4 * scale)


def test_ho_fused_forward_mode_jvp():
    """jax.jvp through the fused op with simultaneous x/sh/w tangents — this
    executes the grouped F_edge3 primitive's own lowering (reverse passes
    only ever transpose it)."""
    x, sh, w = _data()
    f_fused, f_ref = _pair(False, [LIN_OUT])
    tx = x * 0.3 + 0.1
    tsh = sh * 0.2 - 0.05
    tw = w * 0.1 + 0.02
    of, tf = jax.jvp(lambda *a: f_fused(*a)[0], (x, sh, w), (tx, tsh, tw))
    orf, trf = jax.jvp(lambda *a: f_ref(*a)[0], (x, sh, w), (tx, tsh, tw))
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf), atol=2e-5)
    scale = max(1.0, float(jnp.max(jnp.abs(trf))))
    np.testing.assert_allclose(np.asarray(tf), np.asarray(trf),
                               atol=3e-4 * scale)


@pytest.mark.slow
def test_edge3_consolidation_shrinks_backward(monkeypatch):
    """Structural check (no hardware needed): with the grouped F_edge3 JVP,
    the force-pass jaxpr carries ONE combined bwd3 eqn per fused op instead
    of 2-3 separate leg eqns, and values/grads are unchanged."""
    x, sh, w = _data()

    def counts(flag):
        monkeypatch.setenv("EQUIFORMER_TPU_EDGE3", flag)
        f_fused, _ = _pair(False, [LIN_OUT])

        def energy(x, sh, w):
            return jnp.sum(jnp.tanh(f_fused(x, sh, w)[0]))

        force = jax.grad(energy, argnums=(0, 1, 2))
        jaxpr = jax.make_jaxpr(force)(x, sh, w)
        names = [str(e.primitive) for e in jaxpr.jaxpr.eqns]
        g = force(x, sh, w)
        return names, g

    on_names, g_on = counts("1")
    off_names, g_off = counts("0")
    assert on_names.count("equiformer_dtplin_bwd3") == 1
    assert on_names.count("equiformer_dtplin_leg") == 1  # fwd only
    assert off_names.count("equiformer_dtplin_bwd3") == 0
    assert off_names.count("equiformer_dtplin_leg") == 4  # fwd + x/sh/w legs
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)
