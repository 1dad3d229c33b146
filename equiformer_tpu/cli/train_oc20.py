"""OC20 IS2RE training CLI (reference main_oc20.py + EnergyTrainerV2).

Config-driven like the reference: a YAML file with ``includes:`` inheritance
plus dot-overrides.  Example:

  python -m equiformer_tpu.cli.train_oc20 --config-yml configs/oc20/l1_base.yml
  python -m equiformer_tpu.cli.train_oc20 --synthetic --epochs 2
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.irreps import Irreps
from ..data import oc20_like_dataset
from ..data.loader import prefetch
from ..graph.batching import collate_dense
from ..models import GraphAttentionTransformerOC20
from ..train import (
    AverageMeter,
    TrainState,
    cosine_warmup_schedule,
    create_optimizer,
    make_oc20_steps,
    multistep_warmup_schedule,
    with_grad_accumulation,
)
from ..train.checkpoint import CheckpointManager
from ..utils.config import build_config
from ..utils.logger import FileLogger, MetricsWriter


def get_args():
    p = argparse.ArgumentParser("OC20 IS2RE Equiformer training (TPU)")
    p.add_argument("--config-yml", type=str, default=None)
    p.add_argument("--override", nargs="*", default=[], help="a.b=c overrides")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "validate", "predict"])
    p.add_argument("--output-dir", type=str, default="runs/oc20")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    return p.parse_args()


DEFAULT_CONFIG = {
    "model": {
        "irreps_node_embedding": "256x0e+128x1e",
        "num_layers": 6,
        "irreps_sh": "1x0e+1x1e",
        "max_radius": 5.0,
        "number_of_basis": 128,
        "fc_neurons": [64, 64],
        "irreps_feature": "512x0e",
        "irreps_head": "32x0e+16x1e",
        "num_heads": 8,
        "irreps_mlp_mid": "768x0e+384x1e",
        "nonlinear_message": True,
        "alpha_drop": 0.2,
        "max_neighbors": 50,
        "use_auxiliary_task": False,
    },
    "optim": {
        "batch_size": 32,
        "max_epochs": 20,
        "lr_initial": 5e-4,
        "warmup_epochs": 2,
        "weight_decay": 1e-3,
        "clip_grad_norm": 10.0,
        "scheduler": "cosine",
        "grad_accumulation_steps": 1,
        "ema_decay": 0.999,
        "auxiliary_task_weight": 15.0,
        "use_noisy_nodes": False,
        "eval_every_epochs": 1,
    },
    "normalizer": {"target_mean": -1.525913953781128, "target_std": 2.279365062713623,
                   "positions_std": 0.8772},
    "dataset": {"train_src": None, "val_src": None, "max_nodes_per_graph": 96},
}


def _deep_update(base, upd):
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def main(args):
    cfg = dict(DEFAULT_CONFIG)
    if args.config_yml:
        _deep_update(cfg, build_config(args.config_yml, args.override))
    elif args.override:
        from ..utils.config import apply_overrides

        apply_overrides(cfg, args.override)
    if args.epochs is not None:
        cfg["optim"]["max_epochs"] = args.epochs

    log = FileLogger(jax.process_index() == 0, args.output_dir)
    writer = MetricsWriter(args.output_dir)
    mcfg, ocfg, ncfg, dcfg = cfg["model"], cfg["optim"], cfg["normalizer"], cfg["dataset"]

    if args.synthetic or dcfg["train_src"] is None:
        train = oc20_like_dataset(256, seed=1)
        val = oc20_like_dataset(64, seed=2)
    else:
        from ..data.oc20_lmdb import OC20LmdbDataset

        train = OC20LmdbDataset(dcfg["train_src"]).to_list()
        val = OC20LmdbDataset(dcfg["val_src"]).to_list()
    log.info("train %d systems, val %d", len(train), len(val))

    M = dcfg["max_nodes_per_graph"]
    bs = ocfg["batch_size"]

    def make_batches(graphs, shuffle_seed=None):
        order = np.arange(len(graphs))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for i in range(0, len(order) - bs + 1, bs):
            chunk = [graphs[j] for j in order[i : i + bs]]
            yield collate_dense(
                chunk, M, extra_node_keys=("tags", "pos_relaxed"),
                extra_graph_keys=("cell",),
            )

    model_kwargs = dict(mcfg)
    for k in ("irreps_node_embedding", "irreps_sh", "irreps_feature",
              "irreps_head", "irreps_mlp_mid"):
        model_kwargs[k] = Irreps(model_kwargs[k])
    model_kwargs["fc_neurons"] = tuple(model_kwargs["fc_neurons"])
    model = GraphAttentionTransformerOC20(**model_kwargs, remat=True)

    steps_per_epoch = len(train) // bs
    total_steps = ocfg["max_epochs"] * steps_per_epoch
    if ocfg["scheduler"] == "cosine":
        schedule = cosine_warmup_schedule(
            ocfg["lr_initial"], ocfg["warmup_epochs"] * steps_per_epoch, total_steps
        )
    else:
        schedule = multistep_warmup_schedule(
            ocfg["lr_initial"], ocfg["warmup_epochs"] * steps_per_epoch,
            [m * steps_per_epoch for m in ocfg.get("lr_milestones", [])],
        )
    opt = with_grad_accumulation(
        create_optimizer(schedule, ocfg["weight_decay"],
                         grad_clip_norm=ocfg["clip_grad_norm"]),
        ocfg["grad_accumulation_steps"],
    )
    train_step, eval_step = make_oc20_steps(
        model, opt,
        target_mean=ncfg["target_mean"], target_std=ncfg["target_std"],
        positions_std=ncfg["positions_std"],
        use_auxiliary_task=mcfg["use_auxiliary_task"],
        auxiliary_task_weight=ocfg["auxiliary_task_weight"],
        total_steps=total_steps,
        use_noisy_nodes=ocfg["use_noisy_nodes"],
        ema_decay=ocfg["ema_decay"],
    )

    batch0 = next(make_batches(train))
    params = model.init(jax.random.PRNGKey(0), batch0, deterministic=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log.info("model: %.2fM params", n_params / 1e6)
    state = TrainState.create(params, opt)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "ckpt"))
    start_epoch = 0
    if args.resume and ckpt.latest_step() is not None:
        state, meta = ckpt.restore(state)
        start_epoch = (meta or {}).get("epoch", 0) + 1
        log.info("resumed from step %d (epoch %d)", int(state.step), start_epoch)

    step_fn = jax.jit(train_step, donate_argnums=(0,))
    eval_fn = jax.jit(eval_step)
    rng = jax.random.PRNGKey(1)

    # preemption handling (analog of submitit Checkpointable + mark_preempting,
    # main_oc20.py:33,81-88): on SIGTERM, checkpoint at the next step boundary
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread

    def validate(params):
        sums = {}
        for b in make_batches(val):
            out = eval_fn(params, b)
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        c = max(sums.get("count", 1.0), 1.0)
        res = {
            "energy_mae": sums["mae_sum"] / c,
            "energy_mse": sums["mse_sum"] / c,
            "energy_within_threshold": sums["within_threshold"] / c,
        }
        log.info("val: %s", {k: round(v, 6) for k, v in res.items()})
        return res

    if args.mode == "validate":
        return validate(state.ema_params or state.params)

    if args.mode == "predict":
        # reference EnergyTrainerV2.predict (energy_trainer_v2.py:133-225):
        # per-rank prediction arrays merged by the master process
        params = state.ema_params if state.ema_params is not None else state.params
        energies = []
        for b in make_batches(val):
            out = model.apply(params, jax.tree_util.tree_map(jnp.asarray, b),
                              deterministic=True)
            e = out[0] if mcfg["use_auxiliary_task"] else out
            e = np.asarray(e) * ncfg["target_std"] + ncfg["target_mean"]
            energies.append(e[np.asarray(b.graph_mask)])
        energies = np.concatenate(energies) if energies else np.zeros(0)
        rank = jax.process_index()
        path = os.path.join(args.output_dir, f"predictions_{rank}.npz")
        np.savez(path, energy=energies)
        log.info("wrote %d predictions to %s", len(energies), path)
        return path

    for epoch in range(start_epoch, ocfg["max_epochs"]):
        meters = {k: AverageMeter() for k in ("loss", "mae")}
        t0 = time.perf_counter()
        for batch in prefetch(make_batches(train, shuffle_seed=epoch)):
            rng, sub = jax.random.split(rng)
            state, m = step_fn(state, batch, sub)
            for k in meters:
                if k in m:
                    meters[k].update(float(m[k]))
            if preempted["flag"]:
                ckpt.save(int(state.step), state, metadata={"epoch": epoch - 1})
                log.info("preempted: checkpointed at step %d", int(state.step))
                ckpt.close()
                return
        dt = time.perf_counter() - t0
        log.info("epoch %d: loss %.5f mae %.5f (%.1fs)", epoch,
                 meters["loss"].avg, meters["mae"].avg, dt)
        writer.write(int(state.step), {k: v.avg for k, v in meters.items()})
        if (epoch + 1) % ocfg["eval_every_epochs"] == 0:
            validate(state.ema_params if state.ema_params is not None else state.params)
        ckpt.save(int(state.step), state, metadata={"epoch": epoch})
    ckpt.close()


if __name__ == "__main__":
    main(get_args())
