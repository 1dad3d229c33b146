"""Dataset loader tests with small synthetic raw-file fixtures."""

import os

import numpy as np
import pytest

from equiformer_tpu.data.md17 import load_md17
from equiformer_tpu.data.qm9 import CONVERSION, load_qm9
from equiformer_tpu.utils.config import apply_overrides, build_config


def _write_sdf(path, molecules):
    """Minimal V2000 SDF writer."""
    out = []
    for syms, pos in molecules:
        out.append("mol\n  prog\n comment")
        out.append(f"{len(syms):3d}  0  0  0  0  0  0  0  0  0999 V2000")
        for s, p in zip(syms, pos):
            out.append(f"{p[0]:10.4f}{p[1]:10.4f}{p[2]:10.4f} {s:<3} 0  0  0  0  0  0  0  0  0  0  0  0")
        out.append("M  END")
        out.append("$$$$")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def test_qm9_parsing_pipeline(tmp_path, monkeypatch):
    # fabricate a tiny raw QM9: 12 molecules, 2 uncharacterized
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir()
    mols = []
    for i in range(12):
        n = int(rng.integers(3, 6))
        syms = rng.choice(["H", "C", "N", "O", "F"], size=n)
        pos = rng.normal(size=(n, 3))
        mols.append((list(syms), pos))
    _write_sdf(raw / "gdb9.sdf", mols)
    with open(raw / "gdb9.sdf.csv", "w") as f:
        f.write("header\n")
        for i in range(12):
            vals = ",".join(str(float(v)) for v in rng.normal(size=19))
            f.write(f"gdb_{i+1},{vals},x\n")
    with open(raw / "uncharacterized.txt", "w") as f:
        # reference format: 9 header lines, entries, 2 trailer lines
        f.write("\n" * 9 + "3  bad\n7  bad\n" + "tail\nend")

    # shrink the split sizes for the fixture
    import equiformer_tpu.data.qm9 as qm9mod

    orig = qm9mod.load_qm9.__code__
    # monkeypatch the split sizes via a wrapper: easier to test internals by
    # calling with patched constants
    src = None
    graphs, mean, std = _load_tiny(qm9mod, str(tmp_path), "train")
    val, _, _ = _load_tiny(qm9mod, str(tmp_path), "valid")
    test, _, _ = _load_tiny(qm9mod, str(tmp_path), "test")
    assert len(graphs) == 6 and len(val) == 2 and len(test) == 2
    assert np.isfinite(mean) and std > 0
    g = graphs[0]
    assert g["pos"].shape[1] == 3
    assert g["species"].max() < 5
    # cache file created and reused
    assert os.path.exists(tmp_path / "processed_tpu" / "qm9.npz")
    graphs2, mean2, _ = _load_tiny(qm9mod, str(tmp_path), "train")
    assert mean2 == mean


def _load_tiny(qm9mod, root, split):
    """load_qm9 with fixture-sized splits (monkeypatch the constants)."""
    import re
    import types

    src_fn = qm9mod.load_qm9

    # temporarily patch the split sizes inside the function's consts
    code = src_fn.__code__

    def fix(c):
        if c == 110000:
            return 6
        if c == 10000:
            return 2
        if isinstance(c, tuple):
            return tuple(fix(x) for x in c)
        return c

    consts = tuple(fix(c) for c in code.co_consts)
    patched = types.FunctionType(
        code.replace(co_consts=consts), src_fn.__globals__, "load_qm9_tiny",
        src_fn.__defaults__,
    )
    return patched(root, split)


def test_md17_loader(tmp_path):
    rng = np.random.default_rng(1)
    n_frames, n_atoms = 40, 9
    np.savez(
        tmp_path / "md17_aspirin.npz",
        z=rng.integers(1, 10, n_atoms),
        R=rng.normal(size=(n_frames, n_atoms, 3)),
        E=rng.normal(size=(n_frames, 1)),
        F=rng.normal(size=(n_frames, n_atoms, 3)),
    )
    train, mean, std = load_md17(str(tmp_path), "aspirin", "train", n_train=20, n_val=10)
    val, _, _ = load_md17(str(tmp_path), "aspirin", "valid", n_train=20, n_val=10)
    test, _, _ = load_md17(str(tmp_path), "aspirin", "test", n_train=20, n_val=10)
    assert len(train) == 20 and len(val) == 10 and len(test) == 10
    assert train[0]["forces"].shape == (9, 3)
    # split file persisted; reload gives the same split
    train2, mean2, _ = load_md17(str(tmp_path), "aspirin", "train", n_train=20, n_val=10)
    assert mean2 == mean
    assert np.allclose(train2[0]["pos"], train[0]["pos"])


def test_config_includes_and_overrides(tmp_path):
    (tmp_path / "base.yml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    (tmp_path / "child.yml").write_text(
        "includes:\n  - base.yml\nnested:\n  y: 3\nb: hello\n"
    )
    cfg = build_config(str(tmp_path / "child.yml"), ["nested.x=9", "c.d=true"])
    assert cfg == {"a": 1, "nested": {"x": 9, "y": 3}, "b": "hello", "c": {"d": True}}
