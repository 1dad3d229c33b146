"""ctypes bindings for the native host runtime (host_ops.cpp).

Builds the shared library on first import with the system C++ compiler and
caches it next to the source; degrades gracefully to the numpy paths when no
compiler is available (``HAVE_NATIVE`` is False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB = os.path.join(_HERE, "libequiformer_host.so")

HAVE_NATIVE = False
_lib = None


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load():
    global _lib, HAVE_NATIVE
    if os.environ.get("EQUIFORMER_TPU_NATIVE", "1") in ("0", "false"):
        return
    try:
        if not _build():
            return
        lib = ctypes.CDLL(_LIB)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.collate_dense_batch.restype = ctypes.c_int
        lib.collate_dense_batch.argtypes = [
            f32p, i32p, f32p, i64p, f32p, i64p,
            ctypes.c_int64, ctypes.c_int64,
            f32p, i32p, u8p, i32p, u8p, f32p, f32p,
        ]
        lib.radius_graph_stats.restype = ctypes.c_int64
        lib.radius_graph_stats.argtypes = [f32p, i64p, ctypes.c_int64,
                                           ctypes.c_float, i64p]
        lib.balanced_assign.restype = None
        lib.balanced_assign.argtypes = [i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, i64p]
        lib.balanced_assign_capped.restype = None
        lib.balanced_assign_capped.argtypes = [i64p, i64p, ctypes.c_int64,
                                               ctypes.c_int64, i64p, i64p]
        _lib = lib
        HAVE_NATIVE = True
    except OSError:
        pass


_load()


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ip32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class GraphArena:
    """Contiguous dataset storage for zero-copy native collation.

    Built once from a list of graph dicts; per-batch collation then runs in
    C (one memcpy per field per graph instead of Python-side assembly).
    """

    def __init__(self, graphs, with_forces: bool = False):
        offsets = np.zeros(len(graphs) + 1, np.int64)
        for i, g in enumerate(graphs):
            offsets[i + 1] = offsets[i] + len(g["pos"])
        total = int(offsets[-1])
        self.offsets = offsets
        self.pos = np.zeros((total, 3), np.float32)
        self.species = np.zeros(total, np.int32)
        self.forces = np.zeros((total, 3), np.float32) if with_forces else None
        self.y = np.zeros(len(graphs), np.float32)
        for i, g in enumerate(graphs):
            s, e = offsets[i], offsets[i + 1]
            self.pos[s:e] = g["pos"]
            self.species[s:e] = g["species"]
            if with_forces and "forces" in g:
                self.forces[s:e] = g["forces"]
            if "y" in g and g["y"] is not None:
                self.y[i] = g["y"]
        self.with_forces = with_forces

    def __len__(self):
        return len(self.offsets) - 1

    def collate_dense(self, indices: np.ndarray, slots: int):
        """Native padded dense-slot collation -> GraphsTuple."""
        from ..graph.batching import GraphsTuple

        if not HAVE_NATIVE:
            raise RuntimeError("native library unavailable")
        b = len(indices)
        n_cap = b * slots
        indices = np.ascontiguousarray(indices, np.int64)
        pos = np.empty((n_cap, 3), np.float32)
        species = np.empty(n_cap, np.int32)
        node_mask = np.empty(n_cap, np.uint8)
        batch = np.empty(n_cap, np.int32)
        graph_mask = np.empty(b, np.uint8)
        y = np.empty(b, np.float32)
        forces = np.empty((n_cap, 3), np.float32) if self.with_forces else None
        ret = _lib.collate_dense_batch(
            _fp(self.pos), _ip32(self.species),
            _fp(self.forces) if self.forces is not None else None,
            _ip64(self.offsets), _fp(self.y), _ip64(indices),
            b, slots,
            _fp(pos), _ip32(species), _up(node_mask), _ip32(batch),
            _up(graph_mask), _fp(y),
            _fp(forces) if forces is not None else None,
        )
        if ret != 0:
            raise ValueError(f"a graph exceeds {slots} node slots")
        return GraphsTuple(
            pos=pos, species=species, batch=batch,
            node_mask=node_mask.astype(bool), graph_mask=graph_mask.astype(bool),
            y=y, forces=forces, extras={},
        )

    def radius_stats(self, radius: float):
        per = np.zeros(len(self), np.int64)
        total = _lib.radius_graph_stats(
            _fp(self.pos), _ip64(self.offsets), len(self),
            ctypes.c_float(radius), _ip64(per),
        )
        n = float(self.offsets[-1])
        return {
            "avg_nodes": n / len(self),
            "avg_edges": total / len(self),
            "avg_degree": total / n,
            "edges_per_graph": per,
        }


def balanced_assign(sizes: np.ndarray, shards: int) -> np.ndarray:
    sizes = np.ascontiguousarray(sizes, np.int64)
    order = np.argsort(-sizes).astype(np.int64)
    out = np.zeros(len(sizes), np.int64)
    if HAVE_NATIVE:
        _lib.balanced_assign(_ip64(order), _ip64(sizes), len(sizes), shards, _ip64(out))
        return out
    loads = np.zeros(shards, np.int64)
    for g in order:
        k = int(np.argmin(loads))
        out[g] = k
        loads[k] += sizes[g]
    return out


def balanced_assign_capped(sizes: np.ndarray, shards: int,
                           caps: np.ndarray) -> np.ndarray:
    """Greedy atom-count balancing with a per-shard item cap, so every shard
    keeps exactly the round-robin batch count (OCP BalancedBatchSampler
    analog, base_trainer_oc20.py:238-256)."""
    sizes = np.ascontiguousarray(sizes, np.int64)
    caps = np.ascontiguousarray(caps, np.int64)
    order = np.argsort(-sizes).astype(np.int64)
    out = np.zeros(len(sizes), np.int64)
    if HAVE_NATIVE:
        _lib.balanced_assign_capped(
            _ip64(order), _ip64(sizes), len(sizes), shards, _ip64(caps), _ip64(out)
        )
        return out
    loads = np.zeros(shards, np.int64)
    counts = np.zeros(shards, np.int64)
    for g in order:
        open_ = counts < caps
        if not open_.any():
            out[g] = 0
            continue
        k = int(np.flatnonzero(open_)[np.argmin(loads[open_])])
        out[g] = k
        loads[k] += sizes[g]
        counts[k] += 1
    return out
