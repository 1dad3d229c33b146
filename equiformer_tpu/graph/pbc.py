"""Periodic-boundary radius graphs with a static top-k-neighbors formulation.

TPU-native replacement for ocpmodels ``radius_graph_pbc`` + ``get_pbc_distances``
(used by the reference OC20 models, graph_attention_transformer_oc20.py:267-302):
instead of a dynamic-size CUDA kernel, we enumerate a fixed lattice-image set
(±n_rep in each cell direction), build the dense per-graph distance tensor
[G, M, M, C], and take the ``max_neighbors`` nearest images per destination
atom with ``lax.top_k`` — exactly the reference's sorted-by-distance capping,
but with a fully static edge count of N * max_neighbors.

Batch layout: graphs are packed contiguously with a fixed per-graph node slot
count M (N_cap = G * M), which keeps the pair tensor at G*M^2*C instead of
(G*M)^2*C.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .radius_graph import EdgeList


class PBCEdges(NamedTuple):
    edges: EdgeList
    offsets: jnp.ndarray  # [E, 3] lattice offset vector to ADD to pos[src]


def _image_offsets(n_rep: int) -> np.ndarray:
    offs = np.array(
        list(itertools.product(range(-n_rep, n_rep + 1), repeat=3)), np.float32
    )
    # put the identity image first so it is easy to exclude self-loops
    center = np.all(offs == 0, axis=1)
    order = np.argsort(~center, kind="stable")
    return offs[order]


def radius_graph_pbc(
    pos: jnp.ndarray,  # [G*M, 3] flat positions, graph-contiguous
    cell: jnp.ndarray,  # [G, 3, 3] lattice vectors (rows)
    node_mask: jnp.ndarray,  # [G*M]
    graphs: int,
    r: float,
    max_neighbors: int,
    n_rep: int = 1,
) -> PBCEdges:
    """Edges (src=neighbor image, dst=center) capped at the nearest
    ``max_neighbors`` per atom over all lattice images."""
    G = graphs
    N = pos.shape[0]
    M = N // G
    posg = pos.reshape(G, M, 3)
    maskg = node_mask.reshape(G, M)
    offs_frac = jnp.asarray(_image_offsets(n_rep), pos.dtype)  # [C, 3]
    C = offs_frac.shape[0]
    offs = jnp.einsum("ci,gij->gcj", offs_frac, cell)  # [G, C, 3]

    # diff[g,i,j,c] = pos_i - (pos_j + off_c)
    diff = (
        posg[:, :, None, None, :]
        - posg[:, None, :, None, :]
        - offs[:, None, None, :, :]
    )
    d2 = jnp.sum(diff * diff, axis=-1)  # [G, M, M, C]
    valid = (d2 < r * r) & maskg[:, :, None, None] & maskg[:, None, :, None]
    # exclude self with identity image (offset index 0 after reordering)
    eye = jnp.eye(M, dtype=bool)[None, :, :, None] & (
        jnp.arange(C)[None, None, None, :] == 0
    )
    valid &= ~eye
    big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
    d2m = jnp.where(valid, d2, big)

    flat = d2m.reshape(G, M, M * C)
    neg, idx = jax.lax.top_k(-flat, max_neighbors)  # [G, M, K]
    edge_ok = neg > -big
    j = idx // C
    c = idx % C

    gi = jnp.arange(G)[:, None, None]
    src = (gi * M + j).reshape(-1)
    dst = jnp.broadcast_to(
        gi * M + jnp.arange(M)[None, :, None], (G, M, max_neighbors)
    ).reshape(-1)
    mask = edge_ok.reshape(-1)
    off_vec = offs[jnp.repeat(jnp.arange(G), M * max_neighbors), c.reshape(-1)]
    off_vec = jnp.where(mask[:, None], off_vec, 0.0)
    edges = EdgeList(src.astype(jnp.int32), dst.astype(jnp.int32), mask)
    return PBCEdges(edges=edges, offsets=off_vec)


def pbc_edge_vectors(pos: jnp.ndarray, pbc: PBCEdges, eps: float = 1e-12):
    """vec = pos[src] + offset - pos[dst]; zero on padded edges."""
    edges = pbc.edges
    vec = pos[edges.src] + pbc.offsets - pos[edges.dst]
    vec = jnp.where(edges.mask[:, None], vec, 0.0)
    length = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), eps))
    length = jnp.where(edges.mask, length, 0.0)
    return vec, length


def radius_graph_topk(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    graphs: int,
    r: float,
    max_neighbors: int,
) -> EdgeList:
    """Non-PBC variant with the same static top-k capping (OC20 use_pbc=False)."""
    zero_cell = jnp.zeros((graphs, 3, 3), pos.dtype)
    out = radius_graph_pbc(pos, zero_cell, node_mask, graphs, r, max_neighbors, n_rep=0)
    return out.edges
