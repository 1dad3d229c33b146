"""Synthetic molecular-graph generators with QM9/MD17-like statistics.

Used for benchmarking and smoke training where the real datasets are not on
disk (this container has no network egress).  Geometry: atoms placed by a
short random walk with ~1.5 A steps gives radius-5 graphs with average degree
close to QM9's 15.6 (reference constants graph_attention_transformer.py:35-36).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def random_molecule(
    rng: np.random.Generator,
    num_atoms: int,
    num_species: int = 5,
    step: float = 1.5,
    with_forces: bool = False,
) -> Dict[str, np.ndarray]:
    steps = rng.normal(size=(num_atoms, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    pos = np.cumsum(steps * step, axis=0)
    pos += rng.normal(scale=0.1, size=pos.shape)
    g = {
        "pos": pos.astype(np.float32),
        "species": rng.integers(0, num_species, size=num_atoms),
        "y": np.float32(rng.normal()),
    }
    if with_forces:
        g["forces"] = rng.normal(size=(num_atoms, 3)).astype(np.float32)
    return g


def qm9_like_dataset(
    n: int, seed: int = 0, min_atoms: int = 8, max_atoms: int = 29
) -> List[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    return [
        random_molecule(rng, int(rng.integers(min_atoms, max_atoms + 1)))
        for _ in range(n)
    ]


def md17_like_dataset(
    n: int, num_atoms: int = 21, seed: int = 0
) -> List[Dict[str, np.ndarray]]:
    """Fixed-topology frames like an MD17 molecule (aspirin has 21 atoms)."""
    rng = np.random.default_rng(seed)
    base = random_molecule(rng, num_atoms, num_species=4)
    out = []
    for _ in range(n):
        g = dict(base)
        g["pos"] = base["pos"] + rng.normal(scale=0.05, size=base["pos"].shape).astype(
            np.float32
        )
        g["y"] = np.float32(rng.normal())
        g["forces"] = rng.normal(size=(num_atoms, 3)).astype(np.float32)
        out.append(g)
    return out


def oc20_like_dataset(n: int, seed: int = 0, min_atoms: int = 40, max_atoms: int = 80):
    """Synthetic IS2RE-like systems: slab in a periodic cell + adsorbate tags."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        na = int(rng.integers(min_atoms, max_atoms + 1))
        a, b, c = rng.uniform(8.0, 14.0, size=3)
        cell = np.diag([a, b, c]).astype(np.float32)
        frac = rng.uniform(size=(na, 3))
        pos = (frac @ cell).astype(np.float32)
        tags = rng.integers(0, 3, size=na)
        g = {
            "pos": pos,
            "species": rng.integers(1, 84, size=na),
            "y": np.float32(rng.normal()),
            "tags": tags.astype(np.int32),
            "cell": cell,
            "pos_relaxed": (pos + rng.normal(scale=0.3, size=pos.shape)).astype(np.float32),
        }
        out.append(g)
    return out
