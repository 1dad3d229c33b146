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
    cells: bool = False,
) -> Dict[str, float]:
    total_nodes = 0
    total_edges = 0
    n_graphs = 0
    for g in graphs:
        pos = np.asarray(g["pos"], np.float64)
        n = len(pos)
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
