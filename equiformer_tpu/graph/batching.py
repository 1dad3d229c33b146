"""Host-side packing of variable-size molecular graphs into static-shape batches.

The XLA analog of torch_geometric's ``Batch`` + OCP's ``BalancedBatchSampler``
(SURVEY.md §2.7): graphs are concatenated PyG-style into one flat node array,
then padded to a fixed node capacity so every training step compiles once.
Edges are built on device (see radius_graph.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GraphsTuple:
    """A padded batch of graphs in flat (PyG-like) layout.

    All arrays are host numpy (or device jnp) with static shapes:
      pos        [N_cap, 3] float
      species    [N_cap]    int32   (raw atomic number or pre-mapped type id)
      batch      [N_cap]    int32   (graph index; padding nodes point at
                                     graph num_graphs-1 but are masked out)
      node_mask  [N_cap]    bool
      graph_mask [G_cap]    bool
      y          [G_cap, ...]       per-graph targets (optional)
      forces     [N_cap, 3]         per-node targets (optional)
      extras     dict of additional arrays (tags, cell, natoms, ...)
    """

    pos: Any
    species: Any
    batch: Any
    node_mask: Any
    graph_mask: Any
    y: Any = None
    forces: Any = None
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]


def collate(
    graphs: Sequence[Dict[str, np.ndarray]],
    node_capacity: int,
    graph_capacity: Optional[int] = None,
    y_shape: Sequence[int] = (),
    with_forces: bool = False,
    extra_node_keys: Sequence[str] = (),
    extra_graph_keys: Sequence[str] = (),
) -> GraphsTuple:
    """Pack a list of graphs (dicts with 'pos', 'species', optional 'y'/'forces')
    into one padded ``GraphsTuple``.

    Raises if the graphs exceed ``node_capacity`` — callers are expected to
    bucket (length-balanced batching, the analog of OCP BalancedBatchSampler).
    """
    g_cap = graph_capacity if graph_capacity is not None else len(graphs)
    if len(graphs) > g_cap:
        raise ValueError(f"{len(graphs)} graphs > capacity {g_cap}")
    total_nodes = sum(int(g["pos"].shape[0]) for g in graphs)
    if total_nodes > node_capacity:
        raise ValueError(f"{total_nodes} nodes > capacity {node_capacity}")

    pos = np.zeros((node_capacity, 3), np.float32)
    species = np.zeros((node_capacity,), np.int32)
    batch = np.full((node_capacity,), max(g_cap - 1, 0), np.int32)
    node_mask = np.zeros((node_capacity,), bool)
    graph_mask = np.zeros((g_cap,), bool)
    y = np.zeros((g_cap,) + tuple(y_shape), np.float32)
    forces = np.zeros((node_capacity, 3), np.float32) if with_forces else None
    extras: Dict[str, np.ndarray] = {}
    for k in extra_node_keys:
        proto = np.asarray(graphs[0][k])
        extras[k] = np.zeros((node_capacity,) + proto.shape[1:], proto.dtype)
    for k in extra_graph_keys:
        proto = np.asarray(graphs[0][k])
        extras[k] = np.zeros((g_cap,) + proto.shape, proto.dtype)

    i = 0
    for gi, g in enumerate(graphs):
        n = int(g["pos"].shape[0])
        pos[i : i + n] = g["pos"]
        species[i : i + n] = g["species"]
        batch[i : i + n] = gi
        node_mask[i : i + n] = True
        graph_mask[gi] = True
        if "y" in g and g["y"] is not None:
            y[gi] = g["y"]
        if with_forces and "forces" in g:
            forces[i : i + n] = g["forces"]
        for k in extra_node_keys:
            extras[k][i : i + n] = g[k]
        for k in extra_graph_keys:
            extras[k][gi] = g[k]
        i += n

    return GraphsTuple(
        pos=pos,
        species=species,
        batch=batch,
        node_mask=node_mask,
        graph_mask=graph_mask,
        y=y,
        forces=forces,
        extras=extras,
    )


def collate_dense(
    graphs: Sequence[Dict[str, np.ndarray]],
    max_nodes_per_graph: int,
    graph_capacity: Optional[int] = None,
    y_shape: Sequence[int] = (),
    with_forces: bool = False,
    extra_node_keys: Sequence[str] = (),
    extra_graph_keys: Sequence[str] = (),
) -> GraphsTuple:
    """Pack graphs with a FIXED per-graph slot count M (N = G * M, graph-
    contiguous).  Required by the PBC graph builder (graph/pbc.py) which
    builds per-graph [M, M, C] distance tensors; also the natural layout for
    OC20 cells (reference BalancedBatchSampler works by atom count — here the
    static M plays that role)."""
    g_cap = graph_capacity if graph_capacity is not None else len(graphs)
    if len(graphs) > g_cap:
        raise ValueError(f"{len(graphs)} graphs > capacity {g_cap}")
    M = max_nodes_per_graph
    for g in graphs:
        if int(g["pos"].shape[0]) > M:
            raise ValueError(
                f"graph with {g['pos'].shape[0]} atoms > per-graph capacity {M}"
            )
    n_cap = g_cap * M
    pos = np.zeros((n_cap, 3), np.float32)
    species = np.zeros((n_cap,), np.int32)
    batch = np.repeat(np.arange(g_cap, dtype=np.int32), M)
    node_mask = np.zeros((n_cap,), bool)
    graph_mask = np.zeros((g_cap,), bool)
    y = np.zeros((g_cap,) + tuple(y_shape), np.float32)
    forces = np.zeros((n_cap, 3), np.float32) if with_forces else None
    extras: Dict[str, np.ndarray] = {}
    for k in extra_node_keys:
        proto = np.asarray(graphs[0][k])
        extras[k] = np.zeros((n_cap,) + proto.shape[1:], proto.dtype)
    for k in extra_graph_keys:
        proto = np.asarray(graphs[0][k])
        extras[k] = np.zeros((g_cap,) + proto.shape, proto.dtype)
    for gi, g in enumerate(graphs):
        n = int(g["pos"].shape[0])
        i = gi * M
        pos[i : i + n] = g["pos"]
        species[i : i + n] = g["species"]
        node_mask[i : i + n] = True
        graph_mask[gi] = True
        if "y" in g and g["y"] is not None:
            y[gi] = g["y"]
        if with_forces and "forces" in g:
            forces[i : i + n] = g["forces"]
        for k in extra_node_keys:
            extras[k][i : i + n] = g[k]
        for k in extra_graph_keys:
            extras[k][gi] = g[k]
    return GraphsTuple(
        pos=pos, species=species, batch=batch, node_mask=node_mask,
        graph_mask=graph_mask, y=y, forces=forces, extras=extras,
    )


def edge_capacity_for(node_capacity: int, avg_degree: float, slack: float = 1.5) -> int:
    """Heuristic static edge capacity, rounded up to a multiple of 128 (lanes)."""
    cap = int(node_capacity * avg_degree * slack)
    return ((cap + 127) // 128) * 128
