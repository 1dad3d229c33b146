"""Arbitrary-order AD for the linear graph primitives (graph/linear_prims.py).

Checks the take / segsum / perm family against plain jnp compositions for
values, first gradients, and grad-of-grad (the force-model pattern), including
the rev-twin transpose and the CSR Pallas lowering (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.graph.linear_prims import permute_rows, segsum_rows, take_rows
from equiformer_tpu.graph.segment import (
    _segment_softmax_composed,
    gather_add,
    segment_sum,
)

RNG = np.random.default_rng(11)


def _edges(num_nodes=10, num_edges=64):
    """Symmetric dst-sorted edge list with a rev involution + tail padding."""
    pairs = set()
    while len(pairs) < num_edges // 2 - 4:
        i, j = RNG.integers(0, num_nodes, 2)
        if i != j:
            pairs.add((min(i, j), max(i, j)))
    es = [(i, j) for i, j in pairs] + [(j, i) for i, j in pairs]
    es.sort(key=lambda e: e[1])  # dst-sorted
    E = len(es)
    src = np.array([e[0] for e in es] + [0] * (num_edges - E), np.int32)
    dst = np.array([e[1] for e in es] + [num_nodes - 1] * (num_edges - E), np.int32)
    mask = np.arange(num_edges) < E
    # rev involution on real edges; padding maps to itself
    key = {(s, d): k for k, (s, d) in enumerate(es)}
    rev = np.arange(num_edges, dtype=np.int32)
    for k, (s, d) in enumerate(es):
        rev[k] = key[(d, s)]
    return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rev), jnp.asarray(mask)


def test_take_segsum_perm_values():
    src, dst, rev, mask = _edges()
    x = jnp.asarray(RNG.normal(size=(10, 7)))
    v = jnp.asarray(RNG.normal(size=(64, 5)))
    np.testing.assert_allclose(take_rows(x, src), np.asarray(x)[np.asarray(src)])
    np.testing.assert_allclose(
        segsum_rows(v, dst, 10, sorted=True),
        jax.ops.segment_sum(v, dst, num_segments=10),
    )
    np.testing.assert_allclose(permute_rows(v, rev), np.asarray(v)[np.asarray(rev)])


@pytest.mark.parametrize("order", [1, 2])
def test_take_grads_match_plain(order):
    src, dst, rev, mask = _edges()
    x0 = jnp.asarray(RNG.normal(size=(10, 7)))

    def f_prim(x):
        g = take_rows(x, src, t_ids=dst, t_perm=rev, t_sorted=True)
        g = jnp.where(mask[:, None], g, 0.0)
        return jnp.sum(jnp.sin(g) ** 2)

    def f_plain(x):
        g = x[src]
        g = jnp.where(mask[:, None], g, 0.0)
        return jnp.sum(jnp.sin(g) ** 2)

    gp, gq = jax.grad(f_prim)(x0), jax.grad(f_plain)(x0)
    if order == 2:
        gp = jax.grad(lambda x: jnp.sum(jax.grad(f_prim)(x) ** 2))(x0)
        gq = jax.grad(lambda x: jnp.sum(jax.grad(f_plain)(x) ** 2))(x0)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gq), rtol=1e-12)


@pytest.mark.parametrize("order", [1, 2])
def test_segsum_grads_match_plain(order):
    _, dst, _, mask = _edges()
    v0 = jnp.asarray(RNG.normal(size=(64, 5)))

    def f_prim(v):
        s = segsum_rows(jnp.where(mask[:, None], v, 0.0), dst, 10, sorted=True)
        return jnp.sum(jnp.cos(s) * s)

    def f_plain(v):
        s = jax.ops.segment_sum(jnp.where(mask[:, None], v, 0.0), dst, num_segments=10)
        return jnp.sum(jnp.cos(s) * s)

    gp, gq = jax.grad(f_prim)(v0), jax.grad(f_plain)(v0)
    if order == 2:
        gp = jax.grad(lambda v: jnp.sum(jax.grad(f_prim)(v) ** 2))(v0)
        gq = jax.grad(lambda v: jnp.sum(jax.grad(f_plain)(v) ** 2))(v0)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gq), rtol=1e-12)


@pytest.mark.parametrize("order", [1, 2])
def test_gather_add_higher_order_matches_plain(order):
    src, dst, rev, mask = _edges()
    xs0 = jnp.asarray(RNG.normal(size=(10, 6)))
    xd0 = jnp.asarray(RNG.normal(size=(10, 6)))

    def f(fn):
        def loss(xs, xd):
            g = fn(xs, xd)
            g = jnp.where(mask[:, None], g, 0.0)
            return jnp.sum(jnp.tanh(g))

        return loss

    prim = f(lambda xs, xd: gather_add(xs, xd, src, dst, 10, rev=rev, higher_order=True))
    plain = f(lambda xs, xd: xs[src] + xd[dst])
    gp, gq = jax.grad(prim, (0, 1))(xs0, xd0), jax.grad(plain, (0, 1))(xs0, xd0)
    if order == 2:
        gp = jax.grad(lambda a, b: sum(jnp.sum(t ** 2) for t in jax.grad(prim, (0, 1))(a, b)), (0, 1))(xs0, xd0)
        gq = jax.grad(lambda a, b: sum(jnp.sum(t ** 2) for t in jax.grad(plain, (0, 1))(a, b)), (0, 1))(xs0, xd0)
    for a, b in zip(gp, gq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_segment_sum_higher_order_csr_interpret(monkeypatch):
    """higher_order=True + CSR routing (forced on CPU -> interpret kernel):
    values and grad-of-grad match the XLA composition."""
    monkeypatch.setenv("EQUIFORMER_TPU_CSR_SCATTER", "1")
    _, dst, _, mask = _edges()
    v0 = jnp.asarray(RNG.normal(size=(64, 130)))  # cols >= 128 -> CSR eligible

    def f_csr(v):
        s = segment_sum(v, dst, 10, mask=mask, sorted=True, higher_order=True)
        return jnp.sum(s * jnp.sin(s))

    monkey_off = lambda v: segment_sum(
        jnp.where(mask[:, None], v, 0.0), dst, 10, sorted=False, higher_order=False
    )

    def f_plain(v):
        s = monkey_off(v)
        return jnp.sum(s * jnp.sin(s))

    # the CSR kernel accumulates in f32; the x64 XLA reference is exact
    np.testing.assert_allclose(
        np.asarray(f_csr(v0)), np.asarray(f_plain(v0)), rtol=1e-5
    )
    g1 = jax.grad(lambda v: jnp.sum(jax.grad(f_csr)(v) ** 2))(v0)
    g2 = jax.grad(lambda v: jnp.sum(jax.grad(f_plain)(v) ** 2))(v0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("order", [1, 2])
def test_composed_softmax_higher_order_matches(order):
    _, dst, _, mask = _edges()
    s0 = jnp.asarray(RNG.normal(size=(64, 4)))

    def f_ho(s):
        p = _segment_softmax_composed(s, dst, 10, mask=mask, sorted=True,
                                      higher_order=True)
        return jnp.sum(p * jnp.arange(4.0) * jnp.cosh(s * 0.1))

    def f_plain(s):
        p = _segment_softmax_composed(s, dst, 10, mask=mask, sorted=True)
        return jnp.sum(p * jnp.arange(4.0) * jnp.cosh(s * 0.1))

    np.testing.assert_allclose(np.asarray(f_ho(s0)), np.asarray(f_plain(s0)), rtol=1e-12)
    gp, gq = jax.grad(f_ho)(s0), jax.grad(f_plain)(s0)
    if order == 2:
        gp = jax.grad(lambda s: jnp.sum(jax.grad(f_ho)(s) ** 2))(s0)
        gq = jax.grad(lambda s: jnp.sum(jax.grad(f_plain)(s) ** 2))(s0)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gq), rtol=1e-9)


def test_take_rows_jit_and_jvp():
    src, dst, rev, mask = _edges()
    x0 = jnp.asarray(RNG.normal(size=(10, 7)))
    dx = jnp.asarray(RNG.normal(size=(10, 7)))
    f = jax.jit(lambda x: take_rows(x, src, t_ids=dst, t_perm=rev, t_sorted=True))
    out, tan = jax.jvp(f, (x0,), (dx,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0)[np.asarray(src)])
    np.testing.assert_allclose(np.asarray(tan), np.asarray(dx)[np.asarray(src)])
