"""Host-side batching pipeline: shuffling, capacity-padded collation, device
prefetch — the analog of torch_geometric DataLoader + OCP BalancedBatchSampler
(SURVEY.md §2.5, §2.7) for static-shape XLA execution."""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..graph.batching import GraphsTuple, collate, collate_dense


class GraphLoader:
    """Iterates padded GraphsTuple batches over an in-memory graph list.

    ``node_capacity`` defaults to batch_size * max atom count (never drops a
    graph); pass an explicit tighter capacity for speed once dataset stats are
    known (avg_nodes * batch_size * slack).
    """

    def __init__(
        self,
        graphs: Sequence[Dict[str, np.ndarray]],
        batch_size: int,
        node_capacity: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        with_forces: bool = False,
        extra_node_keys: Sequence[str] = (),
        extra_graph_keys: Sequence[str] = (),
        num_shards: int = 1,
        shard_index: int = 0,
        dense_slots: Optional[int] = None,
        use_native: bool = True,
        balance: Optional[str] = "atoms",
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        if node_capacity is None:
            max_atoms = max(int(g["pos"].shape[0]) for g in self.graphs)
            node_capacity = batch_size * max_atoms
        self.node_capacity = node_capacity
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.with_forces = with_forces
        self.extra_node_keys = tuple(extra_node_keys)
        self.extra_graph_keys = tuple(extra_graph_keys)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.dense_slots = dense_slots
        self.balance = balance  # 'atoms' -> BalancedBatchSampler-style shards
        self.epoch = 0
        self._arena = None
        if use_native and dense_slots is not None and not extra_node_keys and not extra_graph_keys:
            from .. import native

            if native.HAVE_NATIVE:
                try:
                    self._arena = native.GraphArena(self.graphs, with_forces=with_forces)
                except (KeyError, ValueError):
                    self._arena = None

    def __len__(self):
        n = len(self.graphs) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[GraphsTuple]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        if self.num_shards > 1 and self.balance == "atoms":
            # atom-count-balanced sharding (the reference BalancedBatchSampler,
            # oc20/trainer/base_trainer_oc20.py:238-256): greedy
            # largest-first onto the lightest shard, capped so every shard
            # keeps exactly the round-robin item count.
            from .. import native

            sizes = np.array(
                [self.graphs[j]["pos"].shape[0] for j in order], np.int64
            )
            n, s = len(order), self.num_shards
            caps = np.full(s, n // s, np.int64)
            caps[: n % s] += 1
            assign = native.balanced_assign_capped(sizes, s, caps)
            order = order[assign == self.shard_index]
        else:
            order = order[self.shard_index :: self.num_shards]
        bs = self.batch_size
        for i in range(0, len(order) - (bs - 1 if self.drop_last else 0), bs):
            chunk = [self.graphs[j] for j in order[i : i + bs]]
            if self._arena is not None:
                yield self._arena.collate_dense(
                    np.asarray(order[i : i + bs]), self.dense_slots
                )
            elif self.dense_slots is not None:
                yield collate_dense(
                    chunk,
                    max_nodes_per_graph=self.dense_slots,
                    graph_capacity=bs,
                    with_forces=self.with_forces,
                    extra_node_keys=self.extra_node_keys,
                    extra_graph_keys=self.extra_graph_keys,
                )
            else:
                yield collate(
                    chunk,
                    node_capacity=self.node_capacity,
                    graph_capacity=bs,
                    with_forces=self.with_forces,
                    extra_node_keys=self.extra_node_keys,
                    extra_graph_keys=self.extra_graph_keys,
                )


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch so host collation overlaps device compute."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    sentinel = object()

    def producer():
        for item in iterator:
            q.put(item)
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
