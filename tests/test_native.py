"""Native host-ops library vs the numpy reference implementations."""

import numpy as np
import pytest

from equiformer_tpu import native
from equiformer_tpu.data import compute_stats, qm9_like_dataset
from equiformer_tpu.graph.batching import collate_dense

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="no C++ compiler available"
)


def test_native_collate_matches_python():
    graphs = qm9_like_dataset(10, seed=5)
    arena = native.GraphArena(graphs, with_forces=False)
    idx = np.array([3, 7, 1, 4])
    b_native = arena.collate_dense(idx, slots=32)
    b_py = collate_dense([graphs[i] for i in idx], max_nodes_per_graph=32)
    assert np.allclose(b_native.pos, b_py.pos)
    assert np.array_equal(b_native.species, b_py.species)
    assert np.array_equal(b_native.node_mask, b_py.node_mask)
    assert np.array_equal(b_native.batch, b_py.batch)
    assert np.allclose(b_native.y, b_py.y)


def test_native_collate_with_forces():
    graphs = qm9_like_dataset(6, seed=6)
    for g in graphs:
        g["forces"] = np.random.default_rng(0).normal(size=g["pos"].shape).astype(np.float32)
    arena = native.GraphArena(graphs, with_forces=True)
    b = arena.collate_dense(np.array([0, 5]), slots=32)
    assert np.allclose(b.forces[: len(graphs[0]["pos"])], graphs[0]["forces"])


def test_native_stats_match_python():
    graphs = qm9_like_dataset(8, seed=7)
    arena = native.GraphArena(graphs)
    got = arena.radius_stats(5.0)
    ref = compute_stats(graphs, 5.0)
    assert got["avg_degree"] == pytest.approx(ref["avg_degree"], rel=1e-6)
    assert got["avg_edges"] == pytest.approx(ref["avg_edges"], rel=1e-6)


def test_native_collate_overflow_raises():
    graphs = qm9_like_dataset(4, seed=8, min_atoms=20, max_atoms=29)
    arena = native.GraphArena(graphs)
    with pytest.raises(ValueError):
        arena.collate_dense(np.array([0, 1]), slots=8)


def test_balanced_assign():
    sizes = np.array([10, 50, 20, 40, 30, 5])
    out = native.balanced_assign(sizes, 2)
    loads = [int(sizes[out == s].sum()) for s in (0, 1)]
    assert abs(loads[0] - loads[1]) <= 15


def test_balanced_loader_shards():
    """GraphLoader with num_shards>1 balances per-shard atom counts (the
    BalancedBatchSampler analog) while keeping round-robin batch counts."""
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset

    data = qm9_like_dataset(64, seed=11)
    loaders = [
        GraphLoader(data, batch_size=4, shuffle=True, seed=7, num_shards=4,
                    shard_index=s)
        for s in range(4)
    ]
    # same length as round-robin sharding
    rr = GraphLoader(data, batch_size=4, shuffle=True, seed=7, num_shards=4,
                     shard_index=0, balance=None)
    assert all(len(l) == len(rr) for l in loaders)
    atoms = []
    seen = 0
    for l in loaders:
        tot = 0
        for b in l:
            tot += int(np.asarray(b.node_mask).sum())
            seen += 1
        atoms.append(tot)
    assert seen == 4 * len(rr)
    # balanced within a tight tolerance; round-robin on shuffled QM9-like
    # sizes is typically several percent off
    spread = (max(atoms) - min(atoms)) / (sum(atoms) / len(atoms))
    assert spread < 0.02, atoms
