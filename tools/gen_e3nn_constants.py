"""Regenerate / cross-check e3nn ground-truth constants (run WITH e3nn).

The build container for this framework has no network and no e3nn wheel, so
``equiformer_tpu/core/e3nn_compat.py`` *derives* e3nn's conventions from its
published algorithm, anchored to documented values.  This script is the
verification half of that contract: run it in any environment that has e3nn
(pip install e3nn) to

1. dump e3nn's actual ``o3.wigner_3j`` values and spherical-harmonics basis
   relation to ``e3nn_constants.json``, and
2. cross-check every derived table in e3nn_compat against the live values,
   failing loudly on any sign or basis mismatch.

``tools/convert_checkpoint.py`` accepts the JSON with ``--e3nn-constants`` to
override the derived tables, so a conversion can always be grounded in a
live e3nn install even if a future e3nn release changes conventions.

Usage:  python tools/gen_e3nn_constants.py [--out e3nn_constants.json] [--lmax 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="e3nn_constants.json")
    ap.add_argument("--lmax", type=int, default=3)
    ap.add_argument("--skip-check", action="store_true",
                    help="only dump, do not compare against e3nn_compat")
    args = ap.parse_args()

    try:
        import torch
        from e3nn import o3
    except ImportError as exc:  # pragma: no cover - by design
        raise SystemExit(
            f"this script needs a live e3nn install ({exc}); it is the "
            "user-side verification counterpart of core/e3nn_compat.py"
        )

    lmax = args.lmax
    out = {"lmax": lmax, "wigner_3j": {}, "sh_relation": {}}

    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            for l3 in range(abs(l1 - l2), min(lmax, l1 + l2) + 1):
                C = o3.wigner_3j(l1, l2, l3).numpy()
                out["wigner_3j"][f"{l1},{l2},{l3}"] = C.tolist()

    # SH basis relation: e3nn_Y_l(v) vs our framework's Y_l(v)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(64, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    tpts = torch.tensor(pts)
    for l in range(lmax + 1):
        sh = o3.spherical_harmonics(l, tpts, normalize=True,
                                    normalization="component").numpy()
        out["sh_relation"][str(l)] = {"points": pts.tolist(), "sh": sh.tolist()}

    with open(args.out, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {args.out}")

    if args.skip_check:
        return

    from equiformer_tpu.core import e3nn_compat as E
    from equiformer_tpu.core.spherical import spherical_harmonics

    bad = []
    for key, Clist in out["wigner_3j"].items():
        l1, l2, l3 = map(int, key.split(","))
        live = np.array(Clist)
        derived = E.e3nn_wigner_3j(l1, l2, l3)
        if not np.allclose(live, derived, atol=1e-9):
            bad.append(("wigner_3j", key,
                        float(np.abs(live - derived).max())))
    for l in range(lmax + 1):
        rel = out["sh_relation"][str(l)]
        p = np.array(rel["points"])
        live = np.array(rel["sh"])
        ours = np.asarray(spherical_harmonics([l], p, normalize=True))
        R = E.e3nn_basis_rotation(l)
        if not np.allclose(live, ours @ R.T, atol=1e-6):
            bad.append(("sh_relation", l,
                        float(np.abs(live - ours @ R.T).max())))
    if bad:
        for item in bad:
            print("MISMATCH:", item)
        raise SystemExit(
            "derived e3nn_compat tables disagree with live e3nn — pass the "
            "dumped JSON to convert_checkpoint.py --e3nn-constants and "
            "report the mismatch"
        )
    print("all derived e3nn_compat tables match live e3nn")


if __name__ == "__main__":
    main()
