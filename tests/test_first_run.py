"""Real-data readiness drill tests (VERDICT r4 item 6).

Covers the three in-container-verifiable legs of scripts/first_run.sh:
the e3nn-constants JSON schema contract between tools/gen_e3nn_constants.py
(producer, needs live e3nn) and tools/convert_checkpoint.py::check_constants
(consumer, runs anywhere), the dataset manifest verifier, and — in the slow
tier — the full drill script in fixture mode.
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_converter_module():
    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint", os.path.join(REPO, "tools", "convert_checkpoint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _simulated_e3nn_dump(lmax=2):
    """Build the JSON gen_e3nn_constants.py would write, with the in-repo
    e3nn simulator (core/e3nn_compat derivations) standing in for live e3nn
    — same keys, same nesting, same orientation of every table."""
    from equiformer_tpu.core import e3nn_compat as E
    from equiformer_tpu.core.spherical import spherical_harmonics

    out = {"lmax": lmax, "wigner_3j": {}, "sh_relation": {}}
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            for l3 in range(abs(l1 - l2), min(lmax, l1 + l2) + 1):
                out["wigner_3j"][f"{l1},{l2},{l3}"] = E.e3nn_wigner_3j(
                    l1, l2, l3
                ).tolist()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(16, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    for l in range(lmax + 1):
        ours = np.asarray(spherical_harmonics([l], pts, normalize=True))
        R = E.e3nn_basis_rotation(l)
        out["sh_relation"][str(l)] = {
            "points": pts.tolist(),
            "sh": (ours @ R.T).tolist(),  # what live e3nn would emit
        }
    return out


def test_e3nn_constants_schema_accepted(tmp_path):
    """check_constants consumes exactly the schema gen_e3nn_constants.py
    produces (both tables), so a real user-side dump will be verifiable."""
    mod = _load_converter_module()
    p = tmp_path / "e3nn_constants.json"
    p.write_text(json.dumps(_simulated_e3nn_dump()))
    mod.check_constants(str(p))  # must not raise


def test_e3nn_constants_mismatch_refuses(tmp_path):
    mod = _load_converter_module()
    dump = _simulated_e3nn_dump()
    dump["wigner_3j"]["1,1,1"] = (
        -np.array(dump["wigner_3j"]["1,1,1"])
    ).tolist()
    p = tmp_path / "bad_wigner.json"
    p.write_text(json.dumps(dump))
    with pytest.raises(SystemExit, match="wigner_3j"):
        mod.check_constants(str(p))

    dump = _simulated_e3nn_dump()
    sh = np.array(dump["sh_relation"]["2"]["sh"])
    sh[:, 0] *= -1.0  # flip one basis column's sign
    dump["sh_relation"]["2"]["sh"] = sh.tolist()
    p = tmp_path / "bad_sh.json"
    p.write_text(json.dumps(dump))
    with pytest.raises(SystemExit, match="sh_relation"):
        mod.check_constants(str(p))


# ---------------------------------------------------------------- manifest


def _fixture_root(tmp_path):
    import shutil

    from equiformer_tpu.data.oc20_lmdb import write_is2re_lmdb
    from equiformer_tpu.data.synthetic import oc20_like_dataset

    root = tmp_path / "datasets"
    fx = os.path.join(REPO, "tests", "fixtures")
    (root / "qm9").mkdir(parents=True)
    shutil.copytree(os.path.join(fx, "qm9_raw", "raw"), root / "qm9" / "raw")
    (root / "md17").mkdir()
    shutil.copy(
        os.path.join(fx, "md17_raw", "raw", "md17_aspirin.npz"), root / "md17"
    )
    (root / "oc20" / "train").mkdir(parents=True)
    write_is2re_lmdb(
        str(root / "oc20" / "train" / "data.lmdb"), oc20_like_dataset(6, seed=0)
    )
    return root


def test_manifest_validates_and_locks(tmp_path):
    from equiformer_tpu.data.manifest import run

    root = _fixture_root(tmp_path)
    lock = tmp_path / "datasets.lock.json"
    status = run(str(root), "all", "aspirin", str(lock), write_lock=True)
    assert status == 0
    locked = json.loads(lock.read_text())
    assert set(locked) == {"qm9", "md17", "oc20"}
    assert locked["qm9"]["validated"]["molecules"] > 0
    assert "warning" in locked["md17"]["validated"]  # fixture-scale flagged
    assert all(
        len(h) == 64 for d in locked.values() for h in d["sha256"].values()
    )

    # hash drift is detected
    bad = dict(locked)
    key = next(iter(bad["md17"]["sha256"]))
    bad["md17"]["sha256"][key] = "0" * 64
    lock.write_text(json.dumps(bad))
    status = run(str(root), "md17", "aspirin", str(lock), write_lock=False)
    assert status == 3

    # missing files are reported, not crashed on
    status = run(str(tmp_path / "nowhere"), "qm9", "aspirin",
                 str(lock), write_lock=False)
    assert status == 1


@pytest.mark.slow
def test_first_run_script_fixture_mode(tmp_path):
    """The full drill runs green end-to-end in fixture mode (no datasets, no
    e3nn, torch-built .pt fixture, OC20 smoke + recorded loss envelope)."""
    env = dict(os.environ)
    env["FIRST_RUN_WORK"] = str(tmp_path / "work")
    # pinned-platform deployments ignore JAX_PLATFORMS; the CLIs honor this
    env["EQUIFORMER_TPU_PLATFORM"] = "cpu"
    (tmp_path / "work").mkdir()
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "first_run.sh")],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO,
    )
    assert out.returncode == 0, (out.stdout[-3000:], out.stderr[-3000:])
    assert "ALL STAGES GREEN" in out.stdout
