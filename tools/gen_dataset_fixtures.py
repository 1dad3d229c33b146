"""Generate format-true raw dataset fixtures for tests/test_dataset_fixtures.py.

The container has no network egress, so the real gdb9/MD17 archives cannot be
fetched; these fixtures replicate the *exact on-disk formats* of the
production files (so the real parsers in data/qm9.py and data/md17.py are
exercised end to end) with a small number of molecules whose geometries are
plausible but whose target values are synthetic:

* ``qm9_raw/raw/gdb9.sdf``        — 12 molecules in the gdb9 V2000 SDF layout
  (3 header lines, counts line ``%3d%3d...0999 V2000``, atom block
  ``%10.4f%10.4f%10.4f %-3s...``, bond block, ``M  END``, ``$$$$``); the
  first molecule is the real QM9 gdb_1 methane geometry.
* ``qm9_raw/raw/gdb9.sdf.csv``    — the MoleculeNet qm9.csv column layout:
  ``mol_id,A,B,C,mu,alpha,homo,lumo,gap,r2,zpve,u0,u298,h298,g298,cv,
  u0_atom,u298_atom,h298_atom,g298_atom`` (reference datasets/pyg/qm9.py
  reads columns 1:20 and rotates A,B,C to the end, :163-164).
* ``qm9_raw/raw/uncharacterized.txt`` — the 3054-molecule skip-list format:
  9 header lines, one ``%6d %s`` row per molecule (1-based), 2 footer lines
  (reference :250-255 reads ``split('\n')[9:-2]``).
* ``md17_raw/raw/md17_aspirin.npz`` — the sGDML archive keys (z/R/E/F) with
  the real aspirin atom ordering (9 C, 4 O, 8 H) and 30 synthetic frames.

Deterministic: running this script always reproduces the committed bytes
(tests assert that, so fixture drift is caught).
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")

# (name, [(symbol, xyz)...], bonds [(a, b, order)...]) — first entry is the
# real gdb_1 methane geometry from the QM9 deposit; the rest are plausible
# small molecules restricted to QM9's H/C/N/O/F alphabet
MOLS = [
    ("gdb_1", [
        ("C", (-0.0127, 1.0858, 0.0080)),
        ("H", (0.0022, -0.0060, 0.0020)),
        ("H", (1.0117, 1.4638, 0.0003)),
        ("H", (-0.5408, 1.4475, -0.8766)),
        ("H", (-0.5238, 1.4379, 0.9064)),
    ], [(1, 2, 1), (1, 3, 1), (1, 4, 1), (1, 5, 1)]),
    ("gdb_2", [
        ("N", (-0.0404, 1.0241, 0.0626)),
        ("H", (0.0172, 0.0125, -0.0274)),
        ("H", (0.9158, 1.3587, -0.0288)),
        ("H", (-0.5203, 1.3435, -0.7755)),
    ], [(1, 2, 1), (1, 3, 1), (1, 4, 1)]),
    ("gdb_3", [
        ("O", (-0.0343, 0.9775, 0.0076)),
        ("H", (0.0647, 0.0205, 0.0015)),
        ("H", (0.8717, 1.3007, 0.0006)),
    ], [(1, 2, 1), (1, 3, 1)]),
    ("gdb_4", [
        ("C", (0.5995, 0.0, 1.0)),
        ("C", (-0.5995, 0.0, 1.0)),
        ("H", (1.6616, 0.0, 1.0)),
        ("H", (-1.6616, 0.0, 1.0)),
    ], [(1, 2, 3), (1, 3, 1), (2, 4, 1)]),
    ("gdb_5", [
        ("C", (-0.0133, 1.1322, 0.0082)),
        ("N", (0.0022, 2.2879, 0.0011)),
        ("H", (-0.0278, 0.0651, 0.0143)),
    ], [(1, 2, 3), (1, 3, 1)]),
]


def _rand_mol(i, rng):
    syms = ["C", "N", "O", "F", "H"]
    n = int(rng.integers(6, 15))
    picks = ["C"] + [syms[int(rng.integers(0, 5))] for _ in range(n - 1)]
    pos = np.round(rng.normal(scale=1.5, size=(n, 3)), 4)
    bonds = [(1, j + 2, 1) for j in range(min(n - 1, 3))]
    return (f"gdb_{i}", [(s, tuple(p)) for s, p in zip(picks, pos)], bonds)


def gen_sdf(mols):
    out = []
    for name, atoms, bonds in mols:
        lines = [name, "     fixture          3D", ""]
        lines.append(
            "%3d%3d  0  0  0  0  0  0  0  0999 V2000" % (len(atoms), len(bonds))
        )
        for s, (x, y, z) in atoms:
            lines.append(
                "%10.4f%10.4f%10.4f %-3s 0  0  0  0  0  0  0  0  0  0  0  0"
                % (x, y, z, s)
            )
        for a, b, o in bonds:
            lines.append("%3d%3d%3d  0" % (a, b, o))
        lines.append("M  END")
        out.append("\n".join(lines))
    return "$$$$\n".join(out) + "$$$$\n"


def gen_csv(mols, rng):
    header = ("mol_id,A,B,C,mu,alpha,homo,lumo,gap,r2,zpve,u0,u298,h298,"
              "g298,cv,u0_atom,u298_atom,h298_atom,g298_atom")
    rows = [header]
    for name, atoms, _ in mols:
        vals = np.round(rng.normal(size=19) * [100, 100, 100, 2, 10, 0.3, 0.1,
                                               0.3, 30, 0.05, 40, 40, 40, 40,
                                               6, 300, 300, 300, 300], 6)
        rows.append(name + "," + ",".join("%g" % v for v in vals))
    return "\n".join(rows) + "\n"


def gen_uncharacterized(skip_indices):
    lines = ["header line %d" % i for i in range(1, 10)]  # 9 header lines
    for idx in skip_indices:
        lines.append("%6d %s" % (idx, "gdb_%d" % idx))
    # reference reads split('\n')[9:-2]: with the trailing newline the final
    # "" plus this summary line are the two trailing elements
    lines += ["%d molecules failed geometry consistency" % len(skip_indices)]
    return "\n".join(lines) + "\n"


# real aspirin (C9H8O4) atom ordering from the sGDML md17_aspirin.npz
ASPIRIN_Z = np.array([6, 6, 6, 6, 6, 6, 6, 6, 6, 8, 8, 8, 8,
                      1, 1, 1, 1, 1, 1, 1, 1], np.int64)


def gen_md17(rng, frames=30):
    base = np.round(rng.normal(scale=2.0, size=(21, 3)), 6)
    R = base[None] + rng.normal(scale=0.05, size=(frames, 21, 3))
    E = -406757.0 + rng.normal(scale=5.0, size=(frames, 1))  # kcal/mol scale
    F = rng.normal(scale=30.0, size=(frames, 21, 3))
    return dict(z=ASPIRIN_Z, R=R.astype(np.float64), E=E, F=F.astype(np.float64))


def main():
    rng = np.random.default_rng(42)
    mols = MOLS + [_rand_mol(i, rng) for i in range(6, 13)]
    qdir = os.path.join(FIX, "qm9_raw", "raw")
    os.makedirs(qdir, exist_ok=True)
    with open(os.path.join(qdir, "gdb9.sdf"), "w") as f:
        f.write(gen_sdf(mols))
    with open(os.path.join(qdir, "gdb9.sdf.csv"), "w") as f:
        f.write(gen_csv(mols, rng))
    # molecule 7 (1-based) is "uncharacterized" -> parser must skip it
    with open(os.path.join(qdir, "uncharacterized.txt"), "w") as f:
        f.write(gen_uncharacterized([7]))

    mdir = os.path.join(FIX, "md17_raw", "raw")
    os.makedirs(mdir, exist_ok=True)
    np.savez(os.path.join(mdir, "md17_aspirin.npz"), **gen_md17(rng))
    print("wrote", qdir, "and", mdir)


if __name__ == "__main__":
    main()
