"""MD17 energy+forces training CLI (reference main_md17.py), with optional
DeNS denoising auxiliary training (main_md17_dens.py) via --use-dens.

Example:
  python -m equiformer_tpu.cli.train_md17 --molecule aspirin \
      --model-name graph_attention_transformer_nonlinear_exp_l3_md17
  python -m equiformer_tpu.cli.train_md17 --synthetic --epochs 2
  python -m equiformer_tpu.cli.train_md17 --use-dens --synthetic --epochs 2
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data import GraphLoader, md17_like_dataset
from ..models import model_entrypoint
from ..train import (
    TrainState,
    cosine_warmup_schedule,
    create_optimizer,
    make_dens_steps,
    make_md17_steps,
)
from ..utils.logger import FileLogger
from .common import add_common_args, run_epochs


def get_args():
    p = argparse.ArgumentParser("MD17 Equiformer training (TPU)")
    add_common_args(p)
    p.add_argument("--molecule", type=str, default="aspirin")
    p.add_argument("--train-size", type=int, default=950)
    p.add_argument("--val-size", type=int, default=50)
    p.add_argument("--energy-weight", type=float, default=0.2)
    p.add_argument("--force-weight", type=float, default=0.8)
    # DeNS options (main_md17_dens.py)
    p.add_argument("--use-dens", action="store_true")
    p.add_argument("--denoising-pos-weight", type=float, default=1.0)
    p.add_argument("--denoising-pos-std", type=float, default=0.05)
    p.add_argument("--denoising-pos-prob", type=float, default=0.5)
    p.add_argument("--denoising-corrupt-ratio", type=float, default=None)
    p.add_argument("--use-denoising-pos-weight-linear-decay", action="store_true")
    p.add_argument("--config-yml", type=str, default=None,
                   help="YAML with model kwargs (md17/configs analog)")
    p.set_defaults(
        model_name="graph_attention_transformer_nonlinear_exp_l2_md17",
        batch_size=8, eval_batch_size=24, epochs=1000,
        # reference main_md17.py:97-100 defaults
        test_interval=10, test_max_iter=1000,
    )
    return p.parse_args()


def main(args):
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    log = FileLogger(jax.process_index() == 0, args.output_dir)
    if args.synthetic:
        train = md17_like_dataset(256, num_atoms=21, seed=1)
        val = md17_like_dataset(64, num_atoms=21, seed=2)
        test = md17_like_dataset(64, num_atoms=21, seed=3)
        mean, std = 0.0, 1.0
    else:
        from ..data.md17 import load_md17

        train, mean, std = load_md17(
            args.data_path, args.molecule, "train", args.train_size, args.val_size
        )
        val, _, _ = load_md17(args.data_path, args.molecule, "valid",
                              args.train_size, args.val_size)
        test, _, _ = load_md17(args.data_path, args.molecule, "test",
                               args.train_size, args.val_size)
        test = test[:5000]  # evaluation subset like common practice
    log.info("%s: %d train frames; E mean %.4f std %.4f",
             args.molecule, len(train), mean, std)

    n_atoms = int(train[0]["pos"].shape[0])
    node_cap = ((args.batch_size * n_atoms + 127) // 128) * 128
    edge_cap = ((node_cap * (n_atoms + 1) + 127) // 128) * 128

    model_kwargs = {}
    if args.config_yml:
        from ..utils.config import build_config
        from ..core.irreps import Irreps as _I

        ycfg = build_config(args.config_yml).get("model", {})
        for k, v in ycfg.items():
            model_kwargs[k] = _I(v) if isinstance(v, str) and ("x0e" in v or "x1" in v or "x2" in v or "x3" in v) else v
        if "fc_neurons" in model_kwargs:
            model_kwargs["fc_neurons"] = tuple(model_kwargs["fc_neurons"])
    if args.drop_path:
        model_kwargs.setdefault("drop_path_rate", args.drop_path)
    if args.input_irreps:
        model_kwargs.setdefault("irreps_in", args.input_irreps)
    if args.use_dens:
        model = model_entrypoint("equiformer_md17_dens")(max_edges=edge_cap, **model_kwargs)
    else:
        model = model_entrypoint(args.model_name)(
            radius=args.radius, num_basis=args.num_basis, max_edges=edge_cap,
            remat=True, **model_kwargs,
        )
    train_loader = GraphLoader(
        train, args.batch_size, node_cap, seed=args.seed, with_forces=True
    )
    val_loader = GraphLoader(
        val, args.batch_size, node_cap, shuffle=False, drop_last=False, with_forces=True
    )
    test_loader = GraphLoader(
        test, args.batch_size, node_cap, shuffle=False, drop_last=False, with_forces=True
    )

    steps_per_epoch = len(train_loader)
    schedule = cosine_warmup_schedule(
        args.lr, args.warmup_epochs * steps_per_epoch,
        args.epochs * steps_per_epoch, args.min_lr,
    )
    opt = create_optimizer(schedule, args.weight_decay, grad_clip_norm=args.clip_grad)

    if args.use_dens:
        train_step, eval_step = make_dens_steps(
            model, opt, mean, std,
            energy_weight=args.energy_weight, force_weight=args.force_weight,
            denoising_pos_std=args.denoising_pos_std,
            denoising_pos_prob=args.denoising_pos_prob,
            corrupt_ratio=args.denoising_corrupt_ratio,
            ema_decay=None if args.no_model_ema else args.ema_decay,
            pmean_axis="dp" if args.dp > 1 else None,
        )

        def extra(epoch):
            w = args.denoising_pos_weight
            if args.use_denoising_pos_weight_linear_decay:
                w = w * (1.0 - min(1.0, epoch / args.epochs))
            return (jnp.asarray(w, jnp.float32),)

        metric_keys = ("loss", "loss_e", "loss_f", "loss_dp")
    else:
        train_step, eval_step = make_md17_steps(
            model, opt, mean, std, args.energy_weight, args.force_weight,
            ema_decay=None if args.no_model_ema else args.ema_decay, pmean_axis="dp" if args.dp > 1 else None,
        )
        extra = lambda epoch: ()
        metric_keys = ("loss", "mae_e", "mae_f")

    batch0 = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(args.seed), batch0, deterministic=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log.info("model: %.2fM params", n_params / 1e6)
    if args.checkpoint_path:
        from ..train.checkpoint import load_params

        params = load_params(args.checkpoint_path, params)
    state = TrainState.create(params, opt)

    def eval_reduce(s):
        return {
            "mae_e": s["mae_e_sum"] / max(s["count_e"], 1.0),
            "mae_f": s["mae_f_sum"] / max(s["count_f"], 1.0),
        }

    def weighted_error(r):
        # update_best_results criterion (main_md17.py:334-335):
        # energy_weight * e_err + force_weight * f_err
        return args.energy_weight * r["mae_e"] + args.force_weight * r["mae_f"]

    run_epochs(
        args, state, train_step, eval_step, train_loader, val_loader, test_loader,
        metric_keys=metric_keys, eval_reduce=eval_reduce,
        extra_step_args=extra, logger=log, best_key="mae_f",
        score_fn=weighted_error,
    )


if __name__ == "__main__":
    main(get_args())
