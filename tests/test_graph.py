"""Tests for padded radius graph and segment ops."""

import jax
import jax.numpy as jnp
import numpy as np

from equiformer_tpu.graph import (
    GraphsTuple,
    collate,
    edge_vectors,
    radius_graph,
    segment_mean,
    segment_softmax,
    segment_sum,
)

RNG = np.random.default_rng(2)


def _brute_force_edges(pos, batch, mask, r):
    out = set()
    n = len(pos)
    for i in range(n):
        for j in range(n):
            if i == j or not (mask[i] and mask[j]) or batch[i] != batch[j]:
                continue
            if np.linalg.norm(pos[i] - pos[j]) < r:
                out.add((i, j))
    return out


def test_radius_graph_matches_brute_force():
    n = 24
    pos = RNG.normal(size=(n, 3)) * 2.0
    batch = np.repeat([0, 1, 2], 8)
    mask = np.ones(n, bool)
    mask[20:] = False
    el = radius_graph(jnp.asarray(pos), jnp.asarray(batch), jnp.asarray(mask), 2.5, 512)
    got = {
        (int(s), int(d))
        for s, d, m in zip(np.asarray(el.src), np.asarray(el.dst), np.asarray(el.mask))
        if m
    }
    assert got == _brute_force_edges(pos, batch, mask, 2.5)


def test_radius_graph_capacity_truncation():
    pos = np.zeros((6, 3))
    pos[:, 0] = np.arange(6) * 0.1  # all within radius: 30 ordered pairs
    el = radius_graph(
        jnp.asarray(pos), jnp.zeros(6, jnp.int32), jnp.ones(6, bool), 1.0, 16
    )
    assert int(el.mask.sum()) == 16  # silently capped


def test_edge_vectors_padding_safe():
    pos = RNG.normal(size=(8, 3))
    el = radius_graph(
        jnp.asarray(pos), jnp.zeros(8, jnp.int32), jnp.ones(8, bool), 2.0, 128
    )
    vec, length = edge_vectors(jnp.asarray(pos), el)
    m = np.asarray(el.mask)
    assert np.allclose(np.asarray(vec)[~m], 0.0)
    assert np.all(np.isfinite(np.asarray(length)))


def test_segment_softmax_matches_dense():
    scores = jnp.asarray(RNG.normal(size=(10,)))
    seg = jnp.asarray(np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 0]))
    mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 0, 1, 1], bool))
    out = np.asarray(segment_softmax(scores, seg, 4, mask=mask))
    for s in range(3):
        idx = [i for i in range(10) if int(seg[i]) == s and bool(mask[i])]
        ref = np.exp(np.asarray(scores)[idx])
        ref /= ref.sum()
        assert np.allclose(out[idx], ref, atol=1e-10)
    assert np.allclose(out[~np.asarray(mask)], 0.0)
    # empty segment contributes nothing and no NaNs
    assert np.all(np.isfinite(out))


def test_segment_softmax_grad_no_nan():
    scores = jnp.asarray(RNG.normal(size=(6,)))
    seg = jnp.asarray(np.array([0, 0, 1, 1, 2, 2]))
    mask = jnp.asarray(np.array([1, 1, 0, 0, 1, 1], bool))

    def loss(s):
        return jnp.sum(segment_softmax(s, seg, 3, mask=mask) ** 2)

    g = np.asarray(jax.grad(loss)(scores))
    assert np.all(np.isfinite(g))


def test_segment_mean_masked():
    data = jnp.asarray(np.array([1.0, 2.0, 3.0, 100.0]))
    seg = jnp.asarray(np.array([0, 0, 1, 1]))
    mask = jnp.asarray(np.array([1, 1, 1, 0], bool))
    out = np.asarray(segment_mean(data, seg, 2, mask=mask))
    assert np.allclose(out, [1.5, 3.0])


def test_collate_padding():
    graphs = [
        {"pos": RNG.normal(size=(5, 3)).astype(np.float32), "species": np.arange(5), "y": 1.0},
        {"pos": RNG.normal(size=(3, 3)).astype(np.float32), "species": np.arange(3), "y": 2.0},
    ]
    b = collate(graphs, node_capacity=12, graph_capacity=4)
    assert b.pos.shape == (12, 3)
    assert b.node_mask.sum() == 8
    assert b.graph_mask.sum() == 2
    assert np.allclose(b.y[:2], [1.0, 2.0])
    assert list(b.batch[:8]) == [0] * 5 + [1] * 3
    # padding nodes attached to last graph slot, masked out
    assert np.all(~b.node_mask[8:])


def test_radius_graph_dense_matches_flat():
    from equiformer_tpu.graph.batching import collate_dense
    from equiformer_tpu.graph.radius_graph import radius_graph_dense

    graphs = [
        {"pos": RNG.normal(size=(n, 3)).astype(np.float32) * 1.5,
         "species": np.zeros(n, np.int32), "y": 0.0}
        for n in (5, 7, 4)
    ]
    b = collate_dense(graphs, max_nodes_per_graph=8)
    flat = radius_graph(
        jnp.asarray(b.pos), jnp.asarray(b.batch), jnp.asarray(b.node_mask), 2.5, 256
    )
    dense = radius_graph_dense(
        jnp.asarray(b.pos), jnp.asarray(b.node_mask), 3, 2.5, 256
    )
    def edge_set(el):
        return {
            (int(s), int(d))
            for s, d, m in zip(np.asarray(el.src), np.asarray(el.dst), np.asarray(el.mask))
            if m
        }
    assert edge_set(flat) == edge_set(dense)


def test_gather_add_matches_composition_and_grads():
    from equiformer_tpu.graph.segment import gather_add

    N, E, D = 12, 40, 6
    xs = jnp.asarray(RNG.normal(size=(N, D)).astype(np.float32))
    xd = jnp.asarray(RNG.normal(size=(N, D)).astype(np.float32))
    # dst-sorted edge list (the radius-graph builders' invariant)
    dst = jnp.asarray(np.sort(RNG.integers(0, N, size=E)).astype(np.int32))
    src = jnp.asarray(RNG.integers(0, N, size=E).astype(np.int32))

    out = gather_add(xs, xd, src, dst, N)
    ref = xs[src] + xd[dst]
    assert np.allclose(out, ref)

    w = jnp.asarray(RNG.normal(size=(E, D)).astype(np.float32))
    f = lambda a, b: jnp.sum(gather_add(a, b, src, dst, N) * w)
    g = lambda a, b: jnp.sum((a[src] + b[dst]) * w)
    ga, gb = jax.grad(f, argnums=(0, 1))(xs, xd)
    ra, rb = jax.grad(g, argnums=(0, 1))(xs, xd)
    assert np.allclose(ga, ra, atol=1e-6)
    assert np.allclose(gb, rb, atol=1e-6)


def test_segment_softmax_custom_vjp_grads():
    from equiformer_tpu.graph.segment import (
        _segment_softmax_composed,
        segment_softmax,
    )

    N, E, H = 9, 50, 4
    ids = jnp.asarray(np.sort(RNG.integers(0, N, size=E)).astype(np.int32))
    scores = jnp.asarray(RNG.normal(size=(E, H)).astype(np.float32))
    mask = jnp.asarray(RNG.random(E) > 0.2)
    w = jnp.asarray(RNG.normal(size=(E, H)).astype(np.float32))

    for m in (None, mask):
        p = segment_softmax(scores, ids, N, mask=m, sorted=True)
        p_ref = _segment_softmax_composed(scores, ids, N, mask=m, sorted=True)
        assert np.allclose(p, p_ref, atol=1e-6)
        g = jax.grad(lambda s: jnp.sum(segment_softmax(s, ids, N, mask=m, sorted=True) * w))(scores)
        g_ref = jax.grad(lambda s: jnp.sum(_segment_softmax_composed(s, ids, N, mask=m, sorted=True) * w))(scores)
        assert np.allclose(g, g_ref, atol=1e-5), np.abs(np.asarray(g) - np.asarray(g_ref)).max()


def test_reverse_edge_perm_dense():
    from equiformer_tpu.graph.batching import collate_dense
    from equiformer_tpu.graph.radius_graph import (
        radius_graph_dense,
        reverse_edge_perm_dense,
    )
    from equiformer_tpu.graph.segment import gather_add

    graphs = [
        {"pos": RNG.normal(size=(n, 3)).astype(np.float32) * 1.5,
         "species": np.zeros(n, np.int32), "y": 0.0}
        for n in (5, 7, 4)
    ]
    b = collate_dense(graphs, max_nodes_per_graph=8)
    M, G = 8, 3
    edges = radius_graph_dense(jnp.asarray(b.pos), jnp.asarray(b.node_mask), G, 2.5, 256)
    rev = reverse_edge_perm_dense(edges, G, M)
    s, d, m = np.asarray(edges.src), np.asarray(edges.dst), np.asarray(edges.mask)
    r = np.asarray(rev)
    # every real edge's twin is the reversed pair
    for e in np.nonzero(m)[0]:
        assert s[r[e]] == d[e] and d[r[e]] == s[e], e

    # rev-backed gather_add grads match the plain composition (padded-edge
    # cotangents zeroed by a mask, as in the model)
    N = G * M
    xs = jnp.asarray(RNG.normal(size=(N, 5)).astype(np.float32))
    xd = jnp.asarray(RNG.normal(size=(N, 5)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(len(s), 5)).astype(np.float32))
    w = w * jnp.asarray(m)[:, None]
    f = lambda a, bb: jnp.sum(gather_add(a, bb, edges.src, edges.dst, N, rev=rev) * w)
    g = lambda a, bb: jnp.sum((a[edges.src] + bb[edges.dst]) * w)
    ga = jax.grad(f, argnums=(0, 1))(xs, xd)
    gr = jax.grad(g, argnums=(0, 1))(xs, xd)
    for u, v in zip(ga, gr):
        assert np.allclose(u, v, atol=1e-6)
