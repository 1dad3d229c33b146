"""Dataset readiness manifest + verifier (the real-data drill's stage 2).

This container has no dataset files and no network egress, so true content
hashes cannot be pinned here.  Instead the manifest records, per dataset,
the exact file layout the parsers consume, the public source the reference
downloads from, and a structural validation that runs the REAL parser on a
sample; ``--write-lock`` then pins sha256 hashes of the user's verified
files into a lockfile so later runs detect corruption or silent
re-downloads.

Usage:
  python -m equiformer_tpu.data.manifest <datasets-root> \
      [--dataset qm9|md17|oc20|all] [--molecule aspirin] \
      [--lock datasets.lock.json] [--write-lock]

Layouts (matching the loaders and the reference's download surface):
  qm9/raw/gdb9.sdf + gdb9.sdf.csv + uncharacterized.txt
      (reference datasets/pyg/qm9.py:66-69: deepchem gdb9.tar.gz +
       figshare 3195404; parsed by equiformer_tpu/data/qm9.py)
  md17/md17_<molecule>.npz with keys z/R/E/F
      (reference datasets/pyg/md17.py:14: quantum-machine.org/gdml/data/npz;
       parsed by equiformer_tpu/data/md17.py)
  oc20/<split>/*.lmdb (+ optional *.lmdb-lock)
      (reference OC20 IS2RE LMDBs; read by equiformer_tpu/data/oc20_lmdb.py
       over the from-spec data/lmdb_format.py reader)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from typing import Dict, List


def _sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            b = fh.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def qm9_files(root: str) -> List[str]:
    raw = os.path.join(root, "qm9", "raw")
    sdf = os.path.join(raw, "gdb9.sdf")
    if not os.path.exists(sdf) and os.path.exists(sdf + ".gz"):
        sdf = sdf + ".gz"
    return [sdf, os.path.join(raw, "gdb9.sdf.csv"),
            os.path.join(raw, "uncharacterized.txt")]


def md17_files(root: str, molecule: str) -> List[str]:
    from .md17 import _FILE_NAMES

    fname = _FILE_NAMES.get(molecule, f"md17_{molecule}.npz")
    # load_md17 accepts both md17/raw/<f> and md17/<f>
    raw = os.path.join(root, "md17", "raw", fname)
    return [raw if os.path.exists(raw) else os.path.join(root, "md17", fname)]


def oc20_files(root: str, split: str = "train") -> List[str]:
    d = os.path.join(root, "oc20", split)
    if not os.path.isdir(d):
        return [d]  # reported as missing
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".lmdb")
    ) or [os.path.join(d, "<no .lmdb files>")]


def validate_qm9(root: str) -> Dict:
    """Structural validation through the real parser (first records)."""
    from .qm9 import load_qm9

    graphs, mean, std = load_qm9(os.path.join(root, "qm9"), "train", target=1)
    g = graphs[0]
    assert g["pos"].shape[1] == 3 and g["species"].ndim == 1
    info = {"molecules": len(graphs), "target_mean": float(mean),
            "target_std": float(std)}
    if len(graphs) < 100000:
        info["warning"] = ("train split has {} molecules; real QM9 has "
                           "~110k (fixture-scale data?)".format(len(graphs)))
    return info


def validate_md17(root: str, molecule: str) -> Dict:
    import numpy as np

    from .md17 import _FILE_NAMES, load_md17

    # size the split to the file (real MD17 has >=100k frames; the committed
    # fixtures have 30) so the structural validation runs on either
    fname = _FILE_NAMES.get(molecule, f"md17_{molecule}.npz")
    path = md17_files(root, molecule)[0]
    n_frames = int(np.load(path)["E"].shape[0])
    n_train = min(950, max(2, n_frames * 2 // 3))
    n_val = min(50, max(1, n_frames // 6))
    frames, mean, std = load_md17(
        os.path.join(root, "md17"), molecule, "train", n_train=n_train,
        n_val=n_val,
    )
    g = frames[0]
    assert g["pos"].shape == g["forces"].shape and g["pos"].shape[1] == 3
    info = {"frames": len(frames), "atoms": int(g["pos"].shape[0]),
            "energy_mean": float(mean), "energy_std": float(std)}
    if n_frames < 100000:
        info["warning"] = (f"{fname} has {n_frames} frames; real MD17 files "
                           "have >=100k (fixture-scale data?)")
    return info


def validate_oc20(root: str, split: str = "train") -> Dict:
    from .oc20_lmdb import OC20LmdbDataset

    ds = OC20LmdbDataset(os.path.join(root, "oc20", split))
    n = min(4, len(ds))
    for i in range(n):
        g = ds[i]
        assert g["pos"].shape[1] == 3 and "cell" in g
    return {"systems": len(ds), "sampled": n}


def run(root: str, dataset: str, molecule: str, lock_path: str,
        write_lock: bool) -> int:
    jobs = (["qm9", "md17", "oc20"] if dataset == "all" else [dataset])
    lock = {}
    if os.path.exists(lock_path):
        with open(lock_path) as fh:
            lock = json.load(fh)
    status = 0
    new_lock = dict(lock)
    for name in jobs:
        files = {"qm9": lambda: qm9_files(root),
                 "md17": lambda: md17_files(root, molecule),
                 "oc20": lambda: oc20_files(root)}[name]()
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            print(f"[{name}] MISSING files:")
            for f in missing:
                print(f"    {f}")
            print(f"    (see module docstring for the download surface)")
            status = max(status, 1)
            continue
        try:
            info = {"qm9": lambda: validate_qm9(root),
                    "md17": lambda: validate_md17(root, molecule),
                    "oc20": lambda: validate_oc20(root)}[name]()
        except Exception as exc:  # structural failure: corrupt / wrong format
            print(f"[{name}] INVALID: {exc}")
            status = max(status, 2)
            continue
        hashes = {os.path.relpath(f, root): _sha256(f) for f in files}
        prev = lock.get(name, {}).get("sha256", {})
        changed = {k: v for k, v in hashes.items()
                   if k in prev and prev[k] != v}
        if changed and not write_lock:
            print(f"[{name}] HASH MISMATCH vs {lock_path}:")
            for k in changed:
                print(f"    {k}: {prev[k][:16]}... -> {hashes[k][:16]}...")
            status = max(status, 3)
            continue
        new_lock[name] = {"sha256": hashes, "validated": info}
        print(f"[{name}] ok: {info}")
    if write_lock and status == 0:
        with open(lock_path, "w") as fh:
            json.dump(new_lock, fh, indent=2, sort_keys=True)
        print(f"wrote {lock_path}")
    return status


def main(argv=None):
    ap = argparse.ArgumentParser(
        "dataset manifest verifier", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("root", help="datasets root (contains qm9/ md17/ oc20/)")
    ap.add_argument("--dataset", default="all",
                    choices=["qm9", "md17", "oc20", "all"])
    ap.add_argument("--molecule", default="aspirin")
    ap.add_argument("--lock", default="datasets.lock.json")
    ap.add_argument("--write-lock", action="store_true",
                    help="pin sha256 of validated files into the lockfile")
    args = ap.parse_args(argv)
    return run(args.root, args.dataset, args.molecule, args.lock,
               args.write_lock)


if __name__ == "__main__":
    sys.exit(main())
