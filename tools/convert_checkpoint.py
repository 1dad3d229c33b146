"""Convert a reference PyTorch Equiformer checkpoint to equiformer_tpu npz.

Reads a torch ``.pt``/``.pth`` file (as linked from the reference README's
pretrained-model table, /root/reference/README.md:84-130) with the built-in
torch-free zip+pickle reader (utils/pt_reader.py — no torch install needed;
``--use-torch`` opts back into torch.load), maps the state_dict onto this
framework's parameter tree via ``equiformer_tpu.utils.convert`` (CG signs /
layouts / rescales handled — see core/e3nn_compat.py), and writes a
weights-only ``.npz`` loadable with ``train.checkpoint.load_params``.

Usage:
  python tools/convert_checkpoint.py ref.pth out.npz \
      --model graph_attention_transformer_nonlinear_l2 [--model-kwargs k=v ...]
      [--e3nn-constants e3nn_constants.json]

``--e3nn-constants`` (produced by tools/gen_e3nn_constants.py in a live e3nn
environment) cross-checks the in-repo derived convention tables before
converting and aborts on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check_constants(path: str) -> None:
    """Verify every table in a tools/gen_e3nn_constants.py dump against the
    in-repo derivations (both the wigner_3j values and the SH basis
    relation); refuse to convert on any mismatch."""
    from equiformer_tpu.core import e3nn_compat as E
    from equiformer_tpu.core.spherical import spherical_harmonics

    with open(path) as fh:
        data = json.load(fh)
    for key, Clist in data["wigner_3j"].items():
        l1, l2, l3 = map(int, key.split(","))
        live = np.array(Clist)
        derived = E.e3nn_wigner_3j(l1, l2, l3)
        if not np.allclose(live, derived, atol=1e-9):
            raise SystemExit(
                f"e3nn constant mismatch at wigner_3j({key}): the in-repo "
                "derivation disagrees with your live e3nn dump — do not "
                "convert; report this with the JSON file"
            )
    for lstr, rel in data.get("sh_relation", {}).items():
        l = int(lstr)
        pts = np.array(rel["points"])
        live = np.array(rel["sh"])
        ours = np.asarray(spherical_harmonics([l], pts, normalize=True))
        R = E.e3nn_basis_rotation(l)
        if not np.allclose(live, ours @ R.T, atol=1e-6):
            raise SystemExit(
                f"e3nn constant mismatch at sh_relation(l={l}): the derived "
                "SH basis rotation disagrees with your live e3nn dump — do "
                "not convert; report this with the JSON file"
            )
    print(f"verified derived tables against {path}")


def main():
    from equiformer_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="reference torch checkpoint (.pt/.pth)")
    ap.add_argument("dst", help="output .npz")
    ap.add_argument("--model", default="graph_attention_transformer_nonlinear_l2")
    ap.add_argument("--model-kwargs", nargs="*", default=[],
                    help="k=v overrides passed to the model entrypoint")
    ap.add_argument("--e3nn-constants", default=None)
    ap.add_argument("--state-dict-key", default=None,
                    help="key inside the checkpoint dict holding the state_dict "
                         "(auto-detects 'state_dict' / 'model' / raw)")
    ap.add_argument("--use-torch", action="store_true",
                    help="read the checkpoint with torch.load instead of the "
                         "built-in torch-free zip+pickle reader")
    args = ap.parse_args()

    if args.e3nn_constants:
        check_constants(args.e3nn_constants)

    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train.checkpoint import save_params
    from equiformer_tpu.utils.convert import convert_qm9_state_dict

    if args.use_torch:
        # explicit escape hatch (e.g. a legacy pre-1.6 checkpoint)
        import torch

        ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = ckpt
        if isinstance(ckpt, dict) and not any(
            hasattr(v, "shape") for v in list(ckpt.values())[:4]
        ):
            for key in ([args.state_dict_key] if args.state_dict_key else
                        ["state_dict", "model", "model_ema"]):
                if key and key in ckpt:
                    sd = ckpt[key]
                    break
        sd = {k: v for k, v in sd.items()}
        if all(k.startswith("module.") for k in sd):
            sd = {k[len("module."):]: v for k, v in sd.items()}
    else:
        # default: the from-spec torch-free zip+pickle reader — no torch
        # needed to ingest a reference checkpoint (utils/pt_reader.py)
        from equiformer_tpu.utils.pt_reader import load_state_dict

        sd = load_state_dict(args.src, args.state_dict_key)

    kwargs = {}
    for kv in args.model_kwargs:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        kwargs[k] = v
    kwargs.setdefault("max_edges", 4096)
    model = model_entrypoint(args.model)(**kwargs)

    params = convert_qm9_state_dict(sd, model)
    save_params(args.dst, params)
    n = sum(np.asarray(v).size for v in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.dst}: {n / 1e6:.2f}M parameters")


if __name__ == "__main__":
    main()
