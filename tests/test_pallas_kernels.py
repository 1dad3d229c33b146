"""Pallas DTP kernel vs reference einsum implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps, depthwise_tp, spherical_harmonics
from equiformer_tpu.kernels.dtp_pallas import PallasDTP

RNG = np.random.default_rng(12)


def _setup(irr_str="16x0e+8x1e+4x2e", sh_str="1x0e+1x1e+1x2e", E=24):
    irr = Irreps(irr_str)
    sh_irr = Irreps(sh_str)
    tp = depthwise_tp(irr, sh_irr, irr)
    x = jnp.asarray(RNG.normal(size=(E, irr.dim)))
    ls = [mi.ir.l for mi in sh_irr]
    sh = spherical_harmonics(ls, jnp.asarray(RNG.normal(size=(E, 3))))
    return tp, x, sh


@pytest.mark.parametrize("cfg", [
    ("16x0e+8x1e+4x2e", "1x0e+1x1e+1x2e"),
    ("16x0e+8x0o+8x1e+8x1o", "1x0e+1x1o+1x2e"),  # E(3) parity variant
    ("8x0e+8x1e+8x2e+4x3e", "1x0e+1x1e+1x2e+1x3e"),  # L3
])
def test_external_weights_match_einsum(cfg):
    tp, x, sh = _setup(*cfg)
    w = jnp.asarray(RNG.normal(size=(x.shape[0], tp.weight_numel)))
    k = PallasDTP(tp, tile=8, interpret=True)
    ref = tp.apply(x, sh, w, scale_weights=True)
    out = k(x, sh, w)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-12


def test_external_gradients_match():
    tp, x, sh = _setup()
    w = jnp.asarray(RNG.normal(size=(x.shape[0], tp.weight_numel)))
    k = PallasDTP(tp, tile=8, interpret=True)

    def lk(x, sh, w):
        return jnp.sum(jnp.sin(k(x, sh, w)))

    def lr(x, sh, w):
        return jnp.sum(jnp.sin(tp.apply(x, sh, w, scale_weights=True)))

    gk = jax.grad(lk, argnums=(0, 1, 2))(x, sh, w)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, sh, w)
    for a, b in zip(gk, gr):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-12


def test_shared_weights_match_einsum():
    tp, x, sh = _setup()
    w = jnp.asarray(RNG.normal(size=(tp.weight_numel,)))
    k = PallasDTP(tp, tile=8, interpret=True, fold_rescale=False, shared_weights=True)
    ref = tp.apply(x, sh, w)
    out = k(x, sh, w)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-12

    def lk(w):
        return jnp.sum(jnp.cos(k(x, sh, w)))

    def lr(w):
        return jnp.sum(jnp.cos(tp.apply(x, sh, w)))

    gk = jax.grad(lk)(w)
    gr = jax.grad(lr)(w)
    assert float(jnp.max(jnp.abs(gk - gr))) < 1e-12


def test_padding_to_tile():
    tp, x, sh = _setup(E=13)  # not a multiple of tile
    w = jnp.asarray(RNG.normal(size=(13, tp.weight_numel)))
    k = PallasDTP(tp, tile=8, interpret=True)
    ref = tp.apply(x, sh, w, scale_weights=True)
    out = k(x, sh, w)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-12


def test_double_backward_through_kernel():
    """Force-style grad-of-grad works through the custom VJP."""
    tp, x, sh = _setup(E=8)
    w = jnp.asarray(RNG.normal(size=(8, tp.weight_numel)))
    k = PallasDTP(tp, tile=8, interpret=True)

    def e(x):
        return jnp.sum(k(x, sh, w) ** 2)

    def force_norm(x):
        return jnp.sum(jax.grad(e)(x) ** 2)

    g2 = jax.grad(force_norm)(x)
    # compare against einsum double backward
    def e_ref(x):
        return jnp.sum(tp.apply(x, sh, w, scale_weights=True) ** 2)

    def force_norm_ref(x):
        return jnp.sum(jax.grad(e_ref)(x) ** 2)

    g2r = jax.grad(force_norm_ref)(x)
    assert float(jnp.max(jnp.abs(g2 - g2r))) < 1e-10


def test_first_order_fused_backward_matches():
    tp, x, sh = _setup()
    w = jnp.asarray(RNG.normal(size=(x.shape[0], tp.weight_numel)))
    k1 = PallasDTP(tp, tile=8, interpret=True, first_order=True)
    kN = PallasDTP(tp, tile=8, interpret=True)
    assert float(jnp.max(jnp.abs(k1(x, sh, w) - kN(x, sh, w)))) < 1e-12

    def loss(fn):
        return jax.grad(
            lambda x, sh, w: jnp.sum(jnp.sin(fn(x, sh, w))), argnums=(0, 1, 2)
        )(x, sh, w)

    for a, b in zip(loss(k1), loss(kN)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-12


def test_first_order_fused_shared_weights():
    tp, x, sh = _setup()
    w = jnp.asarray(RNG.normal(size=(tp.weight_numel,)))
    k1 = PallasDTP(tp, tile=8, interpret=True, fold_rescale=False,
                   shared_weights=True, first_order=True)
    ref = tp.apply(x, sh, w)
    assert float(jnp.max(jnp.abs(k1(x, sh, w) - ref))) < 1e-12
    g1 = jax.grad(lambda w: jnp.sum(jnp.cos(k1(x, sh, w))))(w)
    gr = jax.grad(lambda w: jnp.sum(jnp.cos(tp.apply(x, sh, w))))(w)
    assert float(jnp.max(jnp.abs(g1 - gr))) < 1e-12


def test_packed_kernel_matches_einsum():
    from equiformer_tpu.kernels.dtp_pallas import PackedPallasDTP

    tp, x, sh = _setup()
    w = jnp.asarray(RNG.normal(size=(x.shape[0], tp.weight_numel)))
    k = PackedPallasDTP(tp, tile_rows=8, interpret=True)
    ref = tp.apply(x, sh, w, scale_weights=True)
    assert float(jnp.max(jnp.abs(k(x, sh, w) - ref))) < 1e-12
    g = jax.grad(lambda x: jnp.sum(jnp.sin(k(x, sh, w))))(x)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(tp.apply(x, sh, w, scale_weights=True))))(x)
    assert float(jnp.max(jnp.abs(g - gr))) < 1e-12


def test_csr_segment_sum_matches_xla():
    """CSR node-tile scatter kernel (kernels/segment_csr_pallas.py) vs XLA's
    segment_sum: forward and gather backward, non-multiple shapes, masked
    edges, empty and boundary-straddling segments."""
    from equiformer_tpu.kernels.segment_csr_pallas import csr_segment_sum

    N, E, C = 300, 700, 130
    dst = jnp.asarray(np.sort(RNG.integers(0, N, E)).astype(np.int32))
    val = jnp.asarray(RNG.normal(size=(E, C)), jnp.float32)
    mask = jnp.asarray(RNG.random(E) > 0.2)
    ref = jax.ops.segment_sum(
        jnp.where(mask[:, None], val, 0), dst, num_segments=N
    )
    out = csr_segment_sum(val, dst, N, mask=mask, K=256)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4

    gk = jax.grad(
        lambda v: jnp.sum(csr_segment_sum(v, dst, N, mask=mask, K=128) ** 2)
    )(val)
    gr = jax.grad(
        lambda v: jnp.sum(
            jax.ops.segment_sum(
                jnp.where(mask[:, None], v, 0), dst, num_segments=N
            )
            ** 2
        )
    )(val)
    assert float(jnp.max(jnp.abs(gk - gr))) < 1e-4


def test_segment_sum_csr_routing(monkeypatch):
    """graph/segment.segment_sum routes wide sorted sums through the CSR
    kernel when EQUIFORMER_TPU_CSR_SCATTER=1; results match the XLA path
    (bf16 data, f32 kernel accumulation)."""
    from equiformer_tpu.graph import segment

    N, E, C = 256, 512, 256
    dst = jnp.asarray(np.sort(RNG.integers(0, N, E)).astype(np.int32))
    val = jnp.asarray(RNG.normal(size=(E, C)), jnp.bfloat16)
    mask = jnp.asarray(RNG.random(E) > 0.3)

    monkeypatch.setenv("EQUIFORMER_TPU_CSR_SCATTER", "0")
    ref = segment.segment_sum(val, dst, N, mask=mask, sorted=True)
    monkeypatch.setenv("EQUIFORMER_TPU_CSR_SCATTER", "1")
    out = segment.segment_sum(val, dst, N, mask=mask, sorted=True)
    assert out.dtype == ref.dtype
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    assert float(err) < 0.15  # bf16 scatter accumulation tolerance

    # narrow sums must stay on XLA (no kernel call for C < 128)
    narrow = segment.segment_sum(val[:, :8], dst, N, mask=mask, sorted=True)
    assert narrow.shape == (N, 8)

    # 3-D [E, H, D] attention values flatten through the kernel
    v3 = val.reshape(E, 2, C // 2)
    monkeypatch.setenv("EQUIFORMER_TPU_CSR_SCATTER", "0")
    ref3 = segment.segment_sum(v3, dst, N, mask=mask, sorted=True)
    monkeypatch.setenv("EQUIFORMER_TPU_CSR_SCATTER", "1")
    out3 = segment.segment_sum(v3, dst, N, mask=mask, sorted=True)
    assert out3.shape == ref3.shape
    err3 = jnp.max(jnp.abs(out3.astype(jnp.float32) - ref3.astype(jnp.float32)))
    assert float(err3) < 0.15

    # higher_order=True must stay on the double-differentiable XLA op:
    # reverse-over-reverse would raise through the CSR custom_vjp
    vsmall = jnp.asarray(RNG.normal(size=(8, 256)), jnp.float32)
    dsmall = jnp.asarray(np.sort(RNG.integers(0, 4, 8)).astype(np.int32))

    def e(v):
        return jnp.sum(segment.segment_sum(
            v, dsmall, 4, sorted=True, higher_order=True) ** 2)

    gg = jax.grad(lambda v: jnp.sum(jax.grad(e)(v) ** 2))(vsmall)
    assert gg.shape == vsmall.shape


def test_csr_attention_combine_matches_composed():
    """Fused softmax+dropout+combine kernel (kernels/attn_csr_pallas.py) vs
    the composed segment_softmax + segment_sum path: forward, dscore and
    dvalue cotangents, with/without a dropout multiplier, masked tail
    padding, empty segments, bf16 values."""
    from equiformer_tpu.graph.segment import segment_softmax, segment_sum
    from equiformer_tpu.kernels.attn_csr_pallas import csr_attention_combine

    E, H, D, N = 500, 4, 120, 180
    dst = np.sort(RNG.integers(0, N - 40, E)).astype(np.int32)  # empty tail segs
    mask = np.ones(E, bool)
    mask[-60:] = False
    dst[-60:] = N - 1
    dstj, maskj = jnp.asarray(dst), jnp.asarray(mask)
    scores = jnp.asarray(RNG.normal(size=(E, H)), jnp.float32)
    value = jnp.asarray(RNG.normal(size=(E, H, D)), jnp.float32)
    dropmul = jnp.asarray(RNG.integers(0, 2, (E, H)) / 0.8, jnp.float32)

    def composed(s, v, dm):
        p = segment_softmax(s, dstj, N, mask=maskj, sorted=True)
        if dm is not None:
            p = p * dm
        return segment_sum(v * p[..., None], dstj, N, mask=maskj, sorted=True)

    for dm in (None, dropmul):
        ref = composed(scores, value, dm)
        out = csr_attention_combine(scores, value, dstj, N, mask=maskj, dropmul=dm)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
        g = jnp.asarray(RNG.normal(size=ref.shape), jnp.float32)
        gs1, gv1 = jax.grad(
            lambda s, v: jnp.sum(composed(s, v, dm) * g), (0, 1)
        )(scores, value)
        gs2, gv2 = jax.grad(
            lambda s, v: jnp.sum(
                csr_attention_combine(s, v, dstj, N, mask=maskj, dropmul=dm) * g
            ),
            (0, 1),
        )(scores, value)
        assert float(jnp.max(jnp.abs(gs1 - gs2))) < 1e-4
        assert float(jnp.max(jnp.abs(gv1 - gv2))) < 1e-5

    # bf16 values (the training dtype): kernel accumulates in f32
    out16 = csr_attention_combine(
        scores.astype(jnp.bfloat16), value.astype(jnp.bfloat16), dstj, N,
        mask=maskj,
    )
    ref16 = composed(scores.astype(jnp.bfloat16), value.astype(jnp.bfloat16), None)
    err = jnp.max(jnp.abs(out16.astype(jnp.float32) - ref16.astype(jnp.float32)))
    assert float(err) < 0.05


def test_softmax_dropout_combine_routing(monkeypatch):
    """nn.attention_utils.softmax_dropout_combine: the fused path (flag on)
    matches the composed path (flag off) in a GraphAttention-shaped call,
    including identical dropout masks from the same rng stream."""
    import types

    from equiformer_tpu.nn.attention_utils import softmax_dropout_combine

    E, H, D, N = 300, 2, 64, 100
    dst = np.sort(RNG.integers(0, N, E)).astype(np.int32)
    mask = np.ones(E, bool)
    mask[-30:] = False
    dst[-30:] = N - 1
    edges = types.SimpleNamespace(dst=jnp.asarray(dst), mask=jnp.asarray(mask))
    alpha = jnp.asarray(RNG.normal(size=(E, H)), jnp.float32)
    value = jnp.asarray(RNG.normal(size=(E, H, D)), jnp.float32)
    module = types.SimpleNamespace(
        make_rng=lambda name: jax.random.PRNGKey(7)
    )

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("EQUIFORMER_TPU_CSR_ATTN", flag)
        outs[flag] = softmax_dropout_combine(
            module, alpha, value, edges, N, alpha_drop=0.3,
            deterministic=False, higher_order=False,
        )
    assert float(jnp.max(jnp.abs(outs["0"] - outs["1"]))) < 1e-5

    # higher_order=True must never take the fused kernel (first-order vjp)
    monkeypatch.setenv("EQUIFORMER_TPU_CSR_ATTN", "1")

    def e(v):
        return jnp.sum(
            softmax_dropout_combine(
                module, alpha, v, edges, N, alpha_drop=0.0,
                deterministic=True, higher_order=True,
            ) ** 2
        )

    gg = jax.grad(lambda v: jnp.sum(jax.grad(e)(v) ** 2))(value)
    assert gg.shape == value.shape
