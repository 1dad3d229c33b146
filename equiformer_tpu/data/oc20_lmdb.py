"""OC20 IS2RE LMDB dataset reader (reference oc20/trainer/lmdb_dataset.py:46-177).

Reads the standard OCP single-point LMDB format: a directory of ``*.lmdb``
files, each mapping integer keys to pickled data objects with atomic_numbers,
pos, pos_relaxed, tags, cell, y_relaxed, natoms.  Multi-file datasets use a
cumulative key index like the reference.

Backends: the ``lmdb`` wheel when installed, else the first-party pure-Python
file-format reader (``lmdb_format.LmdbReader``) — no native dependency.
Pickles are loaded with a tolerant unpickler that shims classes from packages
absent in this image (torch_geometric ``Data``), exposing their state dict as
attributes.
"""

from __future__ import annotations

import bisect
import glob
import io
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .lmdb_format import LmdbReader
from ..train.registry import register_dataset

try:
    import lmdb  # type: ignore

    HAVE_LMDB = True
except ImportError:  # pragma: no cover - wheel not in this image
    lmdb = None
    HAVE_LMDB = False


class _Shim:
    """Stand-in for unimportable pickled classes (e.g. torch_geometric.data
    .Data): keeps the pickled state and exposes it as attributes."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)
        else:  # pragma: no cover
            self.__dict__["_state"] = state

    def __getattr__(self, name):
        # torch_geometric Data keeps tensors under a nested store dict
        for container in ("_store", "__dict__"):
            d = self.__dict__.get(container)
            if isinstance(d, dict) and name in d:
                return d[name]
        for v in self.__dict__.values():
            if isinstance(v, dict) and name in v:
                return v[name]
        raise AttributeError(name)


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Shim,), {"__module__": module})


def _loads(buf: bytes):
    return _TolerantUnpickler(io.BytesIO(buf)).load()


def _to_numpy(x):
    if hasattr(x, "numpy"):
        return x.numpy()
    return np.asarray(x)


class _PyTxn:
    """Adapter giving lmdb_format.LmdbReader the tiny txn surface used here."""

    def __init__(self, reader: LmdbReader):
        self._r = reader

    def get(self, key: bytes):
        return self._r.get(key)

    def stat(self):
        return {"entries": self._r.entries}


@register_dataset("lmdb_v2")
@register_dataset("single_point_lmdb_v2")
class OC20LmdbDataset:
    def __init__(self, src: str):
        if os.path.isdir(src):
            self.paths = sorted(glob.glob(os.path.join(src, "*.lmdb")))
        else:
            self.paths = [src]
        if not self.paths:
            raise FileNotFoundError(f"no lmdb files under {src}")
        if HAVE_LMDB:
            self._txns = [
                lmdb.open(
                    p, subdir=False, readonly=True, lock=False,
                    readahead=False, meminit=False, max_readers=1,
                ).begin()
                for p in self.paths
            ]
        else:
            self._txns = [_PyTxn(LmdbReader(p)) for p in self.paths]
        counts = []
        for txn in self._txns:
            n = txn.stat()["entries"]
            raw = txn.get("length".encode())
            if raw is not None:
                n = pickle.loads(raw)
            counts.append(n)
        self.cum = np.cumsum(counts)

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        file_idx = bisect.bisect(self.cum, idx)
        local = idx - (self.cum[file_idx - 1] if file_idx > 0 else 0)
        raw = self._txns[file_idx].get(f"{local}".encode())
        if raw is None:
            raise KeyError(f"index {local} missing in {self.paths[file_idx]}")
        obj = _loads(raw)
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


def write_is2re_lmdb(path: str, records: Sequence[Dict]) -> None:
    """Write IS2RE records to a single LMDB file in the OCP layout (integer
    string keys + pickled objects + a pickled 'length' entry) using the
    first-party writer — for tests and synthetic-data generation."""
    from types import SimpleNamespace

    from .lmdb_format import LmdbWriter

    items = []
    for i, r in enumerate(records):
        obj = SimpleNamespace(
            pos=np.asarray(r["pos"], np.float32),
            atomic_numbers=np.asarray(r["species"], np.float32),
            tags=np.asarray(r["tags"], np.int64),
            cell=np.asarray(r["cell"], np.float32).reshape(1, 3, 3),
            pos_relaxed=np.asarray(r["pos_relaxed"], np.float32),
            y_relaxed=float(r["y"]),
            natoms=len(r["species"]),
        )
        items.append((f"{i}".encode(), pickle.dumps(obj)))
    items.append((b"length", pickle.dumps(len(records))))
    LmdbWriter(path).write(items)


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
