"""OC20 IS2RE LMDB dataset reader (reference oc20/trainer/lmdb_dataset.py:46-177).

Reads the standard OCP single-point LMDB format: a directory of ``*.lmdb``
files, each mapping integer keys to pickled data objects with atomic_numbers,
pos, pos_relaxed, tags, cell, y_relaxed, natoms.  Multi-file datasets use a
cumulative key index like the reference.

The ``lmdb`` package is not in this image — the module degrades to a clear
ImportError at use time, and ``metadata_stats`` / balanced bucketing work on
any graph list (the BalancedBatchSampler analog, base_trainer_oc20.py:238-256).
"""

from __future__ import annotations

import bisect
import glob
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import lmdb  # type: ignore

    HAVE_LMDB = True
except ImportError:  # pragma: no cover
    lmdb = None
    HAVE_LMDB = False


def _to_numpy(x):
    if hasattr(x, "numpy"):
        return x.numpy()
    return np.asarray(x)


class OC20LmdbDataset:
    def __init__(self, src: str):
        if not HAVE_LMDB:
            raise ImportError(
                "the 'lmdb' package is unavailable in this environment; "
                "convert LMDBs to npz offline or install lmdb"
            )
        if os.path.isdir(src):
            self.paths = sorted(glob.glob(os.path.join(src, "*.lmdb")))
        else:
            self.paths = [src]
        if not self.paths:
            raise FileNotFoundError(f"no lmdb files under {src}")
        self.envs = [
            lmdb.open(
                p, subdir=False, readonly=True, lock=False,
                readahead=False, meminit=False, max_readers=1,
            )
            for p in self.paths
        ]
        counts = []
        for env in self.envs:
            with env.begin() as txn:
                n = txn.stat()["entries"]
                if txn.get("length".encode()) is not None:
                    n = pickle.loads(txn.get("length".encode()))
                counts.append(n)
        self.cum = np.cumsum(counts)

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        file_idx = bisect.bisect(self.cum, idx)
        local = idx - (self.cum[file_idx - 1] if file_idx > 0 else 0)
        with self.envs[file_idx].begin() as txn:
            obj = pickle.loads(txn.get(f"{local}".encode()))
        get = lambda k: _to_numpy(getattr(obj, k))
        return {
            "pos": get("pos").astype(np.float32),
            "species": get("atomic_numbers").astype(np.int32),
            "tags": get("tags").astype(np.int32),
            "cell": get("cell").reshape(3, 3).astype(np.float32),
            "pos_relaxed": get("pos_relaxed").astype(np.float32),
            "y": np.float32(getattr(obj, "y_relaxed")),
        }

    def to_list(self, limit: Optional[int] = None) -> List[Dict]:
        n = len(self) if limit is None else min(limit, len(self))
        return [self[i] for i in range(n)]


def metadata_stats(graphs: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """natoms per graph — the reference make_lmdb_sizes metadata.npz content."""
    return {"natoms": np.array([len(g["species"]) for g in graphs])}


def balanced_order(graphs: Sequence[Dict], num_shards: int) -> List[List[int]]:
    """Greedy atom-count balancing across shards (BalancedBatchSampler mode
    'atoms'): sort by size descending, assign each to the lightest shard."""
    sizes = [(len(g["species"]), i) for i, g in enumerate(graphs)]
    sizes.sort(reverse=True)
    loads = [0] * num_shards
    shards: List[List[int]] = [[] for _ in range(num_shards)]
    for sz, i in sizes:
        k = int(np.argmin(loads))
        shards[k].append(i)
        loads[k] += sz
    return shards
