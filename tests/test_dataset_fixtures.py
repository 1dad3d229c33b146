"""Format-true raw dataset fixtures through the *real* parsers (VERDICT r2
item 5): a 12-molecule gdb9-format SDF+CSV+uncharacterized excerpt and an
sGDML-format md17_aspirin.npz, committed under tests/fixtures/ and generated
by tools/gen_dataset_fixtures.py.  Exercises data/qm9.py's SDF parse, CSV
column rotation + unit conversion, skip-list handling, atomref subtraction and
npz caching, and data/md17.py's z/R/E/F load + split caching — on the exact
production file layouts (reference datasets/pyg/qm9.py:59-295,
datasets/pyg/md17.py:8-236)."""

import os
import shutil

import numpy as np
import pytest

from equiformer_tpu.data.md17 import load_md17
from equiformer_tpu.data.qm9 import ATOMREFS, HAR2EV, load_qm9

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture()
def qm9_root(tmp_path):
    root = tmp_path / "qm9"
    shutil.copytree(os.path.join(FIX, "qm9_raw"), root)
    return str(root)


@pytest.fixture()
def md17_root(tmp_path):
    root = tmp_path / "md17"
    shutil.copytree(os.path.join(FIX, "md17_raw"), root)
    return str(root)


def _csv_rows(root):
    with open(os.path.join(root, "raw", "gdb9.sdf.csv")) as f:
        rows = f.read().strip().split("\n")[1:]
    return {r.split(",")[0]: [float(x) for x in r.split(",")[1:20]] for r in rows}


def test_qm9_sdf_parse_and_skip(qm9_root):
    graphs, mean, std = load_qm9(qm9_root, split="train", target=1)
    # 12 molecules in the SDF, molecule 7 (1-based) is uncharacterized
    assert len(graphs) == 11
    # gdb_1 is the real QM9 methane: C + 4 H -> compact types [1,0,0,0,0]
    methane = [g for g in graphs if len(g["species"]) == 5
               and g["species"][0] == 1 and np.all(g["species"][1:] == 0)]
    assert len(methane) == 1
    np.testing.assert_allclose(
        methane[0]["pos"][0], [-0.0127, 1.0858, 0.0080], atol=1e-6
    )
    assert np.isfinite(mean) and std > 0


def test_qm9_conversion_and_atomref(qm9_root):
    rows = _csv_rows(qm9_root)
    # CSV layout: A,B,C,mu,alpha,homo,... -> rotated so alpha is target 1,
    # homo target 2 (x HAR2EV), U0 target 7 (x HAR2EV, atomref-subtracted)
    alpha = {k: v[4] for k, v in rows.items()}
    homo = {k: v[5] for k, v in rows.items()}
    u0 = {k: v[10] for k, v in rows.items()}

    g_alpha, _, _ = load_qm9(qm9_root, split="train", target=1)
    got = sorted(round(float(g["y"]), 4) for g in g_alpha)
    want = sorted(round(v, 4) for k, v in alpha.items() if k != "gdb_7")
    assert got == want  # conversion factor 1.0, no atomref for alpha

    g_homo, _, _ = load_qm9(qm9_root, split="train", target=2)
    got = sorted(round(float(g["y"]), 3) for g in g_homo)
    want = sorted(round(v * HAR2EV, 3) for k, v in homo.items() if k != "gdb_7")
    assert got == want

    # U0: converted to eV then per-atom reference energies subtracted
    g_u0, _, _ = load_qm9(qm9_root, split="train", target=7)
    ref = np.asarray(ATOMREFS[7])
    got = sorted(round(float(g["y"]), 2) for g in g_u0)
    by_count = {}
    for g in g_u0:
        by_count.setdefault(len(g["species"]), []).append(g)
    methane = [g for g in g_u0 if len(g["species"]) == 5
               and g["species"][0] == 1 and np.all(g["species"][1:] == 0)][0]
    expect = u0["gdb_1"] * HAR2EV - (ref[1] + 4 * ref[0])
    assert abs(float(methane["y"]) - expect) < 1e-2

    g_raw, _, _ = load_qm9(qm9_root, split="train", target=7, subtract_atomref=False)
    got_raw = sorted(round(float(g["y"]), 2) for g in g_raw)
    want_raw = sorted(round(v * HAR2EV, 2) for k, v in u0.items() if k != "gdb_7")
    assert got_raw == want_raw


def test_qm9_cache_roundtrip(qm9_root):
    g1, m1, s1 = load_qm9(qm9_root, split="train", target=1)
    assert os.path.exists(os.path.join(qm9_root, "processed_tpu", "qm9.npz"))
    g2, m2, s2 = load_qm9(qm9_root, split="train", target=1)  # from cache
    assert (m1, s1) == (m2, s2) and len(g1) == len(g2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a["pos"], b["pos"])
        np.testing.assert_array_equal(a["species"], b["species"])
        assert float(a["y"]) == float(b["y"])


def test_md17_npz_parse_and_split(md17_root):
    train, mean, std = load_md17(md17_root, "aspirin", n_train=20, n_val=5)
    assert len(train) == 20
    g = train[0]
    # real aspirin atom ordering: 9 C, 4 O, 8 H (raw atomic numbers)
    assert list(g["species"][:9]) == [6] * 9
    assert list(g["species"][9:13]) == [8] * 4
    assert list(g["species"][13:]) == [1] * 8
    assert g["pos"].shape == (21, 3) and g["forces"].shape == (21, 3)
    assert std > 0 and mean < -4e5  # kcal/mol total energies

    # split file is cached and reused; valid/test disjoint from train
    assert os.path.exists(
        os.path.join(md17_root, "splits_aspirin_20_5_1.npz")
    )
    valid, _, _ = load_md17(md17_root, "aspirin", split="valid", n_train=20, n_val=5)
    test, _, _ = load_md17(md17_root, "aspirin", split="test", n_train=20, n_val=5)
    assert len(valid) == 5 and len(test) == 5
    keys = set()
    for grp in (train, valid, test):
        for g in grp:
            keys.add(tuple(np.asarray(g["pos"][0]).tolist()))
    assert len(keys) == 30  # all frames accounted for, no overlap


def test_fixtures_match_generator(tmp_path):
    """The committed fixture bytes are exactly what the generator describes;
    silent drift would weaken the format coverage."""
    import tools.gen_dataset_fixtures as gen

    rng = np.random.default_rng(42)
    mols = gen.MOLS + [gen._rand_mol(i, rng) for i in range(6, 13)]
    sdf = gen.gen_sdf(mols)
    csv = gen.gen_csv(mols, rng)
    unchar = gen.gen_uncharacterized([7])
    qdir = os.path.join(FIX, "qm9_raw", "raw")
    assert open(os.path.join(qdir, "gdb9.sdf")).read() == sdf
    assert open(os.path.join(qdir, "gdb9.sdf.csv")).read() == csv
    assert open(os.path.join(qdir, "uncharacterized.txt")).read() == unchar
    md = gen.gen_md17(rng)
    with np.load(os.path.join(FIX, "md17_raw", "raw", "md17_aspirin.npz")) as f:
        for k in ("z", "R", "E", "F"):
            np.testing.assert_array_equal(f[k], md[k])
