"""QM9 dataset (reference datasets/pyg/qm9.py re-implemented without
rdkit/torch_geometric): parses the raw gdb9 SDF + targets CSV directly,
applies unit conversion and atomref subtraction, and reproduces the
torchmd-net split (110k/10k/rest, rng(1)) used by the reference
(:181-187).  Processed data is cached as an npz.

This container has no network egress — files must already exist under
``root/raw`` (gdb9.sdf, gdb9.sdf.csv, uncharacterized.txt) or as a processed
cache ``root/processed_tpu/qm9.npz``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

HAR2EV = 27.211386246
KCALMOL2EV = 0.04336414

# reference :20-23, after the column rotation in :163-164
CONVERSION = np.array(
    [1.0, 1.0, HAR2EV, HAR2EV, HAR2EV, 1.0, HAR2EV, HAR2EV, HAR2EV, HAR2EV,
     HAR2EV, 1.0, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, 1.0, 1.0, 1.0]
)

TARGETS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve", "U0", "U", "H",
           "G", "Cv", "U0_atom", "U_atom", "H_atom", "G_atom", "A", "B", "C"]

ATOMREFS = {
    7: [-13.61312172, -1029.86312267, -1485.30251237, -2042.61123593, -2713.48485589],
    8: [-13.5745904, -1029.82456413, -1485.26398105, -2042.5727046, -2713.44632457],
    9: [-13.54887564, -1029.79887659, -1485.2382935, -2042.54701705, -2713.42063702],
    10: [-13.90303183, -1030.25891228, -1485.71166277, -2043.01812778, -2713.88796536],
}

SYMBOL_TO_TYPE = {"H": 0, "C": 1, "N": 2, "O": 3, "F": 4}
# atomic number -> compact type id, reference graph_attention_transformer.py:872
Z_TO_TYPE = {1: 0, 6: 1, 7: 2, 8: 3, 9: 4}


def _atomref_matrix() -> np.ndarray:
    """[5 types, 19 targets] atomref table (reference :52-56)."""
    m = np.zeros((5, 19))
    for col, refs in ATOMREFS.items():
        m[:, col] = refs
    return m


def _parse_sdf(path: str):
    """Yield (symbols, positions) per molecule from a (gzipped) SDF file."""
    import gzip

    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        text = f.read()
    for block in text.split("$$$$\n"):
        lines = block.split("\n")
        if len(lines) < 4:
            continue
        counts = lines[3].split()
        try:
            n_atoms = int(counts[0])
        except (ValueError, IndexError):
            continue
        syms, pos = [], []
        for line in lines[4 : 4 + n_atoms]:
            parts = line.split()
            pos.append([float(parts[0]), float(parts[1]), float(parts[2])])
            syms.append(parts[3])
        yield syms, np.asarray(pos, np.float32)


def load_qm9(
    root: str,
    split: str = "train",
    target: int = 1,
    subtract_atomref: bool = True,
) -> Tuple[List[Dict], float, float]:
    """Returns (graphs, mean, std) for the requested split and target index.

    Graph dicts have 'pos', 'species' (compact type 0..4), 'y' (converted,
    atomref-subtracted target).  mean/std are computed on the train split.
    """
    cache = os.path.join(root, "processed_tpu", "qm9.npz")
    if os.path.exists(cache):
        data = np.load(cache, allow_pickle=False)
        all_pos, all_species = data["pos"], data["species"]
        counts, ys = data["counts"], data["y"]
    else:
        sdf = None
        for cand in ("gdb9.sdf", "gdb9.sdf.gz"):
            p = os.path.join(root, "raw", cand)
            if os.path.exists(p):
                sdf = p
                break
        if sdf is None:
            raise FileNotFoundError(
                f"QM9 raw data not found under {root}/raw (no network egress; "
                "place gdb9.sdf + gdb9.sdf.csv + uncharacterized.txt there)"
            )
        csv = os.path.join(root, "raw", "gdb9.sdf.csv")
        with open(csv) as f:
            rows = f.read().strip().split("\n")[1:]
        target_rows = np.array(
            [[float(x) for x in line.split(",")[1:20]] for line in rows], np.float64
        )
        # rotate columns (A,B,C to the end) then convert units (reference :163-164)
        target_rows = np.concatenate([target_rows[:, 3:], target_rows[:, :3]], axis=1)
        target_rows = target_rows * CONVERSION[None, :]

        skip_path = os.path.join(root, "raw", "uncharacterized.txt")
        with open(skip_path) as f:
            skip = {int(x.split()[0]) - 1 for x in f.read().split("\n")[9:-2]}

        pos_list, species_list, counts_l, ys_l = [], [], [], []
        for i, (syms, pos) in enumerate(_parse_sdf(sdf)):
            if i in skip:
                continue
            species = np.array([SYMBOL_TO_TYPE[s] for s in syms], np.int32)
            pos_list.append(pos)
            species_list.append(species)
            counts_l.append(len(syms))
            ys_l.append(target_rows[i])
        all_pos = np.concatenate(pos_list, axis=0)
        all_species = np.concatenate(species_list, axis=0)
        counts = np.asarray(counts_l, np.int64)
        ys = np.asarray(ys_l, np.float64)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, pos=all_pos, species=all_species, counts=counts, y=ys)

    n_mols = len(counts)
    # torchmd-net split (reference :181-187)
    n_train, n_valid = 110000, 10000
    perm = np.random.default_rng(1).permutation(n_mols)
    idx = {
        "train": perm[:n_train],
        "valid": perm[n_train : n_train + n_valid],
        "test": perm[n_train + n_valid :],
    }

    offsets = np.concatenate([[0], np.cumsum(counts)])
    atomref = _atomref_matrix()

    def build(indices):
        graphs = []
        for i in indices:
            s, e = offsets[i], offsets[i + 1]
            species = all_species[s:e]
            y = ys[i, target]
            if subtract_atomref:
                y = y - atomref[species, target].sum()
            graphs.append(
                {"pos": all_pos[s:e], "species": species, "y": np.float32(y)}
            )
        return graphs

    train_graphs = build(idx["train"])
    train_y = np.array([g["y"] for g in train_graphs], np.float64)
    mean, std = float(train_y.mean()), float(train_y.std())
    if split == "train":
        return train_graphs, mean, std
    return build(idx[split]), mean, std
