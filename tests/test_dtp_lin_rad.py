"""Radial-folded fused DTP+linear (the 6-leg family: out/x/sh/h/Wr/W) vs the
unfused composition ``w = h @ Wr + offset; lin(dtp(x, sh, w))`` — values,
first gradients, and the force-training grad-of-grad, interpret mode on CPU.

The folding replaces the reference's per-edge radial final matmul
(radial_func.py:9-50 applied at nets/graph_attention_transformer.py:490)
with in-kernel MXU dots against packed Wr blocks; these tests pin the
numerics at every AD order the MD17/DeNS force path uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the radial fold is a default-OFF A/B option (measured slower on chip,
# CLAUDE.md round-4); its full interpret-mode sweep costs ~7.5 min on the
# single-core container — whole module rides the slow tier
pytestmark = pytest.mark.slow

from equiformer_tpu.kernels.dtp_lin_pallas import DTPLinPlan
from equiformer_tpu.kernels.dtp_lin_ho import make_fused_dtp_lin_ho
from tests.test_dtp_lin import (
    ALPHA_OUT, LIN_OUT, TP, _data, _head_ws, _ref_lin,
)

E = 256
HD = 16  # radial hidden width


def _rad_data():
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    h = jax.random.normal(ks[0], (E, HD), jnp.float32)
    Wr = jax.random.normal(ks[1], (HD, TP.weight_numel), jnp.float32) * 0.3
    off = jax.random.normal(ks[2], (TP.weight_numel,), jnp.float32) * 0.1
    return h, Wr, off


def _pair_rad(heads, tile=128):
    plan = DTPLinPlan(TP, heads, fold_rescale=True, shared_weights=False,
                      needs_dsh=True, radial_fold=HD)
    fused = make_fused_dtp_lin_ho(plan, tile=tile, interpret=True)
    hws = [_head_ws(h, 10 + i) for i, h in enumerate(heads)]
    Ws = plan.pack_weights(hws)

    def f_fused(x, sh, h, Wr, off):
        Wrs = plan.pack_radial(Wr, off)
        return plan.split_output(fused(x, sh, (h, Wrs), Ws))

    def f_ref(x, sh, h, Wr, off):
        w = h @ Wr + off
        z = TP.apply(x, sh, w, scale_weights=True)
        return [_ref_lin(z, hh, hw) for hh, hw in zip(heads, hws)]

    return plan, f_fused, f_ref


@pytest.mark.parametrize(
    "heads", [[LIN_OUT, ALPHA_OUT]], ids=["two-head"]
)
def test_rad_fused_values_and_first_grads(heads):
    x, sh, _ = _data()
    h, Wr, off = _rad_data()
    _, f_fused, f_ref = _pair_rad(heads)

    for a, b in zip(f_fused(x, sh, h, Wr, off), f_ref(x, sh, h, Wr, off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def loss(f):
        return lambda *args: sum(jnp.sum(o**2) for o in f(*args))

    gf = jax.grad(loss(f_fused), argnums=(0, 1, 2, 3, 4))(x, sh, h, Wr, off)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2, 3, 4))(x, sh, h, Wr, off)
    for name, a, b in zip(("dx", "dsh", "dh", "dWr", "doffset"), gf, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4 * scale, err_msg=name
        )


@pytest.mark.slow
def test_rad_fused_grad_of_grad():
    """Force pattern: energy reduces the fused output; force = its (x, sh, h)
    gradient; the training loss differentiates |force|^2 wrt (x, Wr, offset)
    — second order through the radial-folded leg kernels incl. F_edge3/bwd3."""
    x, sh, _ = _data()
    h, Wr, off = _rad_data()
    _, f_fused, f_ref = _pair_rad([LIN_OUT])

    def make_loss(f):
        def energy(x, sh, h, Wr, off):
            outs = f(x, sh, h, Wr, off)
            return jnp.sum(jnp.tanh(outs[0]))

        def train_loss(x, sh, h, Wr, off):
            fx, fsh, fh = jax.grad(energy, argnums=(0, 1, 2))(x, sh, h, Wr, off)
            return jnp.sum(fx**2) + jnp.sum(fsh**2) + jnp.sum(fh**2)

        return train_loss

    lf, lr = make_loss(f_fused), make_loss(f_ref)
    np.testing.assert_allclose(float(lf(x, sh, h, Wr, off)),
                               float(lr(x, sh, h, Wr, off)), rtol=2e-4)
    gf = jax.grad(lf, argnums=(0, 3, 4))(x, sh, h, Wr, off)
    gr = jax.grad(lr, argnums=(0, 3, 4))(x, sh, h, Wr, off)
    for name, a, b in zip(("ddx", "ddWr", "ddoffset"), gf, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3 * scale, err_msg=name
        )


def test_rad_fused_padding_and_tile_skip():
    """Non-multiple-of-tile edge counts + n_edges tile skipping."""
    x, sh, _ = _data()
    h, Wr, off = _rad_data()
    x, sh, h = x[:200], sh[:200], h[:200]
    n_real = 150
    mask = jnp.arange(200) < n_real
    x = jnp.where(mask[:, None], x, 0)
    sh = jnp.where(mask[:, None], sh, 0)
    h = jnp.where(mask[:, None], h, 0)
    plan = DTPLinPlan(TP, [LIN_OUT], fold_rescale=True, needs_dsh=True,
                      radial_fold=HD)
    fused = make_fused_dtp_lin_ho(plan, tile=128, interpret=True)
    hws = [_head_ws(LIN_OUT, 3)]
    Ws = plan.pack_weights(hws)
    Wrs = plan.pack_radial(Wr, off)

    out = fused(x, sh, (h, Wrs), Ws, n_edges=n_real)
    w = h @ Wr + off
    z = TP.apply(x, sh, w, scale_weights=True)
    ref = jnp.where(mask[:, None], _ref_lin(z, LIN_OUT, hws[0]), 0)
    np.testing.assert_allclose(
        np.asarray(jnp.where(mask[:, None], out, 0)), np.asarray(ref),
        atol=5e-5,
    )

    def loss(h):
        o = fused(x, sh, (h, Wrs), Ws, n_edges=n_real)
        return jnp.sum(jnp.where(mask[:, None], o, 0) ** 2)

    def loss_ref(h):
        w = h @ Wr + off
        z = TP.apply(x, sh, w, scale_weights=True)
        o = _ref_lin(z, LIN_OUT, hws[0])
        return jnp.sum(jnp.where(mask[:, None], o, 0) ** 2)

    g, gr = jax.grad(loss)(h), jax.grad(loss_ref)(h)
    scale = max(1.0, float(jnp.max(jnp.abs(gr))))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=5e-4 * scale)


def test_separable_fctp_radial_fold_matches_unfused(monkeypatch):
    """Module-level integration: SeparableFCTP with the radial-folded fused
    kernel (EQUIFORMER_TPU_FOLD_RADIAL=1, pallas interpret) must match the
    fold-off fused path on the same params — values and the force-pattern
    gradient through (x, sh)."""
    import jax
    from equiformer_tpu.core.irreps import Irreps
    from equiformer_tpu.core.spherical import spherical_harmonics
    from equiformer_tpu.nn.tp_modules import SeparableFCTP

    irr = Irreps("8x0e+4x1e")
    sh_irr = Irreps("1x0e+1x1e")
    e = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(e, irr.dim)), jnp.float32)
    vec = jnp.asarray(rng.normal(size=(e, 3)), jnp.float32)
    sh = spherical_harmonics([0, 1], vec)
    scal = jnp.asarray(rng.normal(size=(e, 8)), jnp.float32)

    monkeypatch.setenv("EQUIFORMER_TPU_PALLAS", "1")

    def build(fold):
        monkeypatch.setenv("EQUIFORMER_TPU_FOLD_RADIAL", fold)
        # the HO path defaults fold off (on-chip regression); force it here
        monkeypatch.setenv("EQUIFORMER_TPU_FOLD_RADIAL_HO", fold)
        sep = SeparableFCTP(
            irr, sh_irr, irr, fc_neurons=(8, 8), use_activation=False,
            norm_layer=None, internal_weights=False, higher_order_grads=True,
        )
        return sep

    params = build("0").init(jax.random.PRNGKey(0), x, sh, scal)

    def run(fold, x, sh):
        sep = build(fold)
        return sep.apply(params, x, sh, scal)

    out_off = run("0", x, sh)
    out_on = run("1", x, sh)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=2e-5
    )

    def floss(fold):
        def energy(x, sh):
            return jnp.sum(jnp.tanh(run(fold, x, sh)))

        def train_loss(x, sh):
            fx, fsh = jax.grad(energy, argnums=(0, 1))(x, sh)
            return jnp.sum(fx**2) + jnp.sum(fsh**2)

        return train_loss

    l_off = float(floss("0")(x, sh))
    l_on = float(floss("1")(x, sh))
    np.testing.assert_allclose(l_on, l_off, rtol=2e-4)
    g_off = jax.grad(floss("0"))(x, sh)
    g_on = jax.grad(floss("1"))(x, sh)
    scale = max(1.0, float(jnp.max(jnp.abs(g_off))))
    np.testing.assert_allclose(
        np.asarray(g_on), np.asarray(g_off), atol=1e-3 * scale
    )


@pytest.mark.parametrize("save_z", [True, False], ids=["save-z", "remat-z"])
def test_rad_fused_first_order(save_z):
    """The first-order custom-vjp kernel (QM9/OC20 path) with radial folding:
    values and the single fused backward's cotangents (dx, dh, dWr, doffset,
    dW) vs the unfused composition."""
    from equiformer_tpu.kernels.dtp_lin_pallas import make_fused_dtp_lin

    x, sh, _ = _data()
    h, Wr, off = _rad_data()
    heads = [LIN_OUT, ALPHA_OUT]
    plan = DTPLinPlan(TP, heads, fold_rescale=True, shared_weights=False,
                      needs_dsh=False, radial_fold=HD)
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True, save_z=save_z)
    hws = [_head_ws(hh, 20 + i) for i, hh in enumerate(heads)]

    def f_fused(x, h, Wr, off, head_w):
        Ws = plan.pack_weights(head_w)
        Wrs = plan.pack_radial(Wr, off)
        return plan.split_output(fused(x, sh, (h, Wrs), Ws))

    def f_ref(x, h, Wr, off, head_w):
        w = h @ Wr + off
        z = TP.apply(x, sh, w, scale_weights=True)
        return [_ref_lin(z, hh, hw) for hh, hw in zip(heads, head_w)]

    for a, b in zip(f_fused(x, h, Wr, off, hws), f_ref(x, h, Wr, off, hws)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def loss(f):
        return lambda *args: sum(jnp.sum(o**2) for o in f(*args))

    gf = jax.grad(loss(f_fused), argnums=(0, 1, 2, 3, 4))(x, h, Wr, off, hws)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2, 3, 4))(x, h, Wr, off, hws)
    names = ("dx", "dh", "dWr", "doffset", "dW")
    for name, a, b in zip(names, gf, gr):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        for aa, bb in zip(fa, fb):
            scale = max(1.0, float(jnp.max(jnp.abs(bb))))
            np.testing.assert_allclose(
                np.asarray(aa), np.asarray(bb), atol=5e-4 * scale,
                err_msg=name,
            )


def test_rad_fused_first_order_padding_and_tile_skip():
    """First-order radial-folded kernel: non-multiple-of-tile edge counts +
    n_edges tile skipping, forward and backward."""
    from equiformer_tpu.kernels.dtp_lin_pallas import make_fused_dtp_lin

    x, sh, _ = _data()
    h, Wr, off = _rad_data()
    x, sh, h = x[:200], sh[:200], h[:200]
    n_real = 150
    mask = jnp.arange(200) < n_real
    x = jnp.where(mask[:, None], x, 0)
    sh = jnp.where(mask[:, None], sh, 0)
    h = jnp.where(mask[:, None], h, 0)
    plan = DTPLinPlan(TP, [LIN_OUT], fold_rescale=True, shared_weights=False,
                      needs_dsh=False, radial_fold=HD)
    fused = make_fused_dtp_lin(plan, tile=128, interpret=True)
    hws = [_head_ws(LIN_OUT, 3)]
    Ws = plan.pack_weights(hws)
    Wrs = plan.pack_radial(Wr, off)

    out = fused(x, sh, (h, Wrs), Ws, n_edges=n_real)
    w = h @ Wr + off
    z = TP.apply(x, sh, w, scale_weights=True)
    ref = jnp.where(mask[:, None], _ref_lin(z, LIN_OUT, hws[0]), 0)
    np.testing.assert_allclose(
        np.asarray(jnp.where(mask[:, None], out, 0)), np.asarray(ref),
        atol=5e-5,
    )

    def loss(x, h, Wr, off):
        Wrs = plan.pack_radial(Wr, off)
        o = fused(x, sh, (h, Wrs), Ws, n_edges=n_real)
        return jnp.sum(jnp.where(mask[:, None], o, 0) ** 2)

    def loss_ref(x, h, Wr, off):
        w = h @ Wr + off
        z = TP.apply(x, sh, w, scale_weights=True)
        o = _ref_lin(z, LIN_OUT, hws[0])
        return jnp.sum(jnp.where(mask[:, None], o, 0) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(x, h, Wr, off)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, h, Wr, off)
    for name, a, b in zip(("dx", "dh", "dWr", "doffset"), g, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4 * scale, err_msg=name
        )


def test_separable_fctp_radial_fold_first_order(monkeypatch):
    """Module-level integration for the FIRST-ORDER path (QM9/OC20,
    higher_order_grads=False): fold-on vs fold-off values and parameter
    gradients through the custom-vjp fused backward."""
    import jax
    from equiformer_tpu.core.irreps import Irreps
    from equiformer_tpu.core.spherical import spherical_harmonics
    from equiformer_tpu.nn.tp_modules import SeparableFCTP

    irr = Irreps("8x0e+4x1e")
    sh_irr = Irreps("1x0e+1x1e")
    e = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(e, irr.dim)), jnp.float32)
    vec = jnp.asarray(rng.normal(size=(e, 3)), jnp.float32)
    sh = spherical_harmonics([0, 1], vec)
    scal = jnp.asarray(rng.normal(size=(e, 8)), jnp.float32)

    monkeypatch.setenv("EQUIFORMER_TPU_PALLAS", "1")

    def build(fold):
        monkeypatch.setenv("EQUIFORMER_TPU_FOLD_RADIAL", fold)
        return SeparableFCTP(
            irr, sh_irr, irr, fc_neurons=(8, 8), use_activation=False,
            norm_layer=None, internal_weights=False, higher_order_grads=False,
        )

    params = build("0").init(jax.random.PRNGKey(0), x, sh, scal)

    def loss(fold):
        def f(params):
            return jnp.sum(build(fold).apply(params, x, sh, scal) ** 2)
        return f

    l_off, g_off = jax.value_and_grad(loss("0"))(params)
    l_on, g_on = jax.value_and_grad(loss("1"))(params)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=2e-5)
    key = lambda t: str(t[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_on), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g_off), key=key),
    ):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4 * scale,
            err_msg=str(ka),
        )
