"""Dataset statistics: avg nodes / edges / degree over the radius graph.

Reference ``compute_stats`` (engine.py:144-176, base_trainer_v2.py:594-648,
task_compute_stats) — produces the _AVG_NUM_NODES / _AVG_DEGREE constants the
models bake in.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def compute_stats(
    graphs: Sequence[Dict],
    radius: float,
    max_neighbors: Optional[int] = None,
    use_pbc: bool = False,
    n_rep: int = 1,
) -> Dict[str, float]:
    """avg nodes/edges/degree; with ``use_pbc`` the per-atom neighbor count
    includes lattice images within +-n_rep cells (graphs need a 'cell' key),
    the OC20 compute_stats semantics (base_trainer_v2.py:594-648)."""
    total_nodes = 0
    total_edges = 0
    n_graphs = 0
    for g in graphs:
        pos = np.asarray(g["pos"], np.float64)
        n = len(pos)
        if use_pbc:
            import itertools

            cell = np.asarray(g["cell"], np.float64)
            offs = np.array(
                list(itertools.product(range(-n_rep, n_rep + 1), repeat=3)), np.float64
            ) @ cell  # [C, 3]
            diff = pos[:, None, None, :] - pos[None, :, None, :] - offs[None, None]
            d_img = np.linalg.norm(diff, axis=-1)  # [n, n, C]
            within = d_img < radius
            # exclude self at the zero offset image
            center = np.all(np.abs(offs) < 1e-12, axis=1)
            ci = int(np.argmax(center))
            within[np.arange(n), np.arange(n), ci] = False
            deg = within.sum(axis=(1, 2))
            if max_neighbors is not None:
                deg = np.minimum(deg, max_neighbors)
            total_nodes += n
            total_edges += int(deg.sum())
            n_graphs += 1
            continue
        d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
        adj = (d < radius) & ~np.eye(n, dtype=bool)
        if max_neighbors is not None:
            deg = adj.sum(1)
            for i in np.where(deg > max_neighbors)[0]:
                order = np.argsort(np.where(adj[i], d[i], np.inf))
                keep = order[:max_neighbors]
                row = np.zeros(n, bool)
                row[keep] = True
                adj[i] = adj[i] & row
        total_nodes += n
        total_edges += int(adj.sum())
        n_graphs += 1
    return {
        "avg_nodes": total_nodes / max(n_graphs, 1),
        "avg_edges": total_edges / max(n_graphs, 1),
        "avg_degree": total_edges / max(total_nodes, 1),
    }
