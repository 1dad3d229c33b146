"""Dataset statistics task (reference compute_stats: engine.py:144-176,
scripts/train/qm9/compute_stats.sh, oc20 task_compute_stats).

  python -m equiformer_tpu.cli.compute_stats --dataset qm9 --radius 5
  python -m equiformer_tpu.cli.compute_stats --synthetic --radius 5
"""

from __future__ import annotations

import argparse
import json

from ..data import compute_stats, md17_like_dataset, oc20_like_dataset, qm9_like_dataset


def main():
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser("dataset statistics")
    p.add_argument("--dataset", choices=["qm9", "md17", "oc20"], default="qm9")
    p.add_argument("--data-path", type=str, default="datasets")
    p.add_argument("--molecule", type=str, default="aspirin")
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--max-neighbors", type=int, default=None)
    p.add_argument("--limit", type=int, default=2000)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    if args.synthetic:
        graphs = {
            "qm9": qm9_like_dataset(args.limit),
            "md17": md17_like_dataset(args.limit),
            "oc20": oc20_like_dataset(min(args.limit, 256)),
        }[args.dataset]
    elif args.dataset == "qm9":
        from ..data.qm9 import load_qm9

        graphs, _, _ = load_qm9(args.data_path, "train")
        graphs = graphs[: args.limit]
    elif args.dataset == "md17":
        from ..data.md17 import load_md17

        graphs, _, _ = load_md17(args.data_path, args.molecule, "train")
        graphs = graphs[: args.limit]
    else:
        from ..data.oc20_lmdb import OC20LmdbDataset

        graphs = OC20LmdbDataset(args.data_path).to_list(args.limit)

    try:
        from .. import native

        if native.HAVE_NATIVE and args.max_neighbors is None:
            stats = native.GraphArena(graphs).radius_stats(args.radius)
            stats.pop("edges_per_graph")
        else:
            stats = compute_stats(graphs, args.radius, args.max_neighbors)
    except Exception:
        stats = compute_stats(graphs, args.radius, args.max_neighbors)
    print(json.dumps({k: round(float(v), 6) for k, v in stats.items()}))


if __name__ == "__main__":
    main()
