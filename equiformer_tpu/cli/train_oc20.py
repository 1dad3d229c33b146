"""OC20 IS2RE training CLI (reference main_oc20.py + EnergyTrainerV2).

Config-driven like the reference: a YAML file with ``includes:`` inheritance
plus dot-overrides, dispatched through the trainer/task/dataset/logger
registry (the reference's ocpmodels.common.registry pattern,
main_oc20.py:60-66).  Example:

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
from ..train.oc20_engine import save_results
from ..train.registry import get as registry_get
from ..train.registry import register_task, register_trainer
from ..utils.config import build_config
from ..utils.logger import FileLogger, MetricsWriter


def get_args(argv=None):
    p = argparse.ArgumentParser("OC20 IS2RE Equiformer training (TPU)")
    p.add_argument("--config-yml", type=str, default=None)
    p.add_argument("--override", nargs="*", default=[], help="a.b=c overrides")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "validate", "predict"])
    p.add_argument("--output-dir", type=str, default="runs/oc20")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel devices (reference g@N; overrides "
                        "config parallel.dp)")
    p.add_argument("--sweep-yml", type=str, default=None,
                   help="YAML of dot-keyed value lists; runs the cartesian "
                        "grid (reference main_oc20.py --sweep-yml)")
    p.add_argument("--submit", action="store_true",
                   help="with --sweep-yml: emit a SLURM array script + "
                        "per-cell configs instead of running locally "
                        "(submitit-executor analog)")
    return p.parse_args(argv)


DEFAULT_CONFIG = {
    "trainer": "energy_v2",
    "logger": "file",
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
                   "positions_std": 0.9452036023139954},
    "dataset": {"format": "lmdb_v2", "train_src": None, "val_src": None,
                "max_nodes_per_graph": 96},
}


def _deep_update(base, upd):
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def resolve_config(args):
    cfg = dict(DEFAULT_CONFIG)
    if args.config_yml:
        _deep_update(cfg, build_config(args.config_yml, args.override))
    elif args.override:
        from ..utils.config import apply_overrides

        apply_overrides(cfg, args.override)
    if args.epochs is not None:
        cfg["optim"]["max_epochs"] = args.epochs
    if args.dp is not None:
        cfg.setdefault("parallel", {})["dp"] = args.dp
    return cfg


@register_trainer("energy_v2")
class EnergyTrainerV2:
    """IS2RE energy trainer (reference oc20/trainer/energy_trainer_v2.py):
    loads data, builds the model/optimizer/EMA, and exposes train / validate /
    predict, each reachable as a registered task."""

    def __init__(self, args, cfg):
        self.args = args
        self.cfg = cfg
        self.log = FileLogger(jax.process_index() == 0, args.output_dir)
        self.writer = MetricsWriter(args.output_dir)
        # exporter by config name (reference logger registry,
        # base_trainer_oc20.py:225-236): tensorboard | wandb | file (JSONL only)
        exporter = cfg.get("logger", "file")
        if exporter == "wandb":
            self.tb = registry_get("logger", "wandb")(args.output_dir, enabled=True)
        else:
            self.tb = registry_get("logger", "tensorboard")(
                os.path.join(args.output_dir, "tb"),
                enabled=exporter == "tensorboard",
            )
        mcfg, ocfg, ncfg, dcfg = cfg["model"], cfg["optim"], cfg["normalizer"], cfg["dataset"]
        self.mcfg, self.ocfg, self.ncfg, self.dcfg = mcfg, ocfg, ncfg, dcfg

        if args.synthetic or dcfg["train_src"] is None:
            self.train_data = oc20_like_dataset(256, seed=1)
            self.val_data = oc20_like_dataset(64, seed=2)
        else:
            dataset_cls = registry_get("dataset", dcfg.get("format", "lmdb_v2"))
            self.train_data = dataset_cls(dcfg["train_src"]).to_list()
            self.val_data = dataset_cls(dcfg["val_src"]).to_list()
        # stable system ids for predict (LMDB records carry sid; synthetic
        # systems get their index)
        for i, g in enumerate(self.val_data):
            g.setdefault("sid", i)
        self.log.info("train %d systems, val %d", len(self.train_data), len(self.val_data))

        model_kwargs = dict(mcfg)
        for k in ("irreps_node_embedding", "irreps_sh", "irreps_feature",
                  "irreps_head", "irreps_mlp_mid"):
            model_kwargs[k] = Irreps(model_kwargs[k])
        model_kwargs["fc_neurons"] = tuple(model_kwargs["fc_neurons"])
        self.model = GraphAttentionTransformerOC20(**model_kwargs, remat=True)

        bs = ocfg["batch_size"]
        self.steps_per_epoch = len(self.train_data) // bs
        total_steps = ocfg["max_epochs"] * self.steps_per_epoch
        if ocfg["scheduler"] == "cosine":
            schedule = cosine_warmup_schedule(
                ocfg["lr_initial"], ocfg["warmup_epochs"] * self.steps_per_epoch,
                total_steps,
            )
        else:
            schedule = multistep_warmup_schedule(
                ocfg["lr_initial"], ocfg["warmup_epochs"] * self.steps_per_epoch,
                [m * self.steps_per_epoch for m in ocfg.get("lr_milestones", [])],
            )
        opt = with_grad_accumulation(
            create_optimizer(schedule, ocfg["weight_decay"],
                             grad_clip_norm=ocfg["clip_grad_norm"]),
            ocfg["grad_accumulation_steps"],
        )
        # data parallelism over the device mesh (reference g@N multi-GPU
        # cells, oc20/trainer distutils): optim.batch_size is per device
        self.dp = int(cfg.get("parallel", {}).get("dp", 1))
        self.train_step, self.eval_step = make_oc20_steps(
            self.model, opt,
            target_mean=ncfg["target_mean"], target_std=ncfg["target_std"],
            positions_std=ncfg["positions_std"],
            pmean_axis="dp" if self.dp > 1 else None,
            use_auxiliary_task=mcfg["use_auxiliary_task"],
            auxiliary_task_weight=ocfg["auxiliary_task_weight"],
            total_steps=total_steps,
            use_noisy_nodes=ocfg["use_noisy_nodes"],
            ema_decay=ocfg["ema_decay"],
        )

        batch0 = next(self.make_batches(self.train_data))
        params = self.model.init(jax.random.PRNGKey(0), batch0, deterministic=True)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        self.log.info("model: %.2fM params", n_params / 1e6)
        self.state = TrainState.create(params, opt)

        self.ckpt = CheckpointManager(os.path.join(args.output_dir, "ckpt"))
        self.start_epoch = 0
        if args.resume and self.ckpt.latest_step() is not None:
            self.state, meta = self.ckpt.restore(self.state)
            self.start_epoch = (meta or {}).get("epoch", 0) + 1
            self.log.info("resumed from step %d (epoch %d)",
                          int(self.state.step), self.start_epoch)

        self.eval_fn = jax.jit(self.eval_step)

    def make_batches(self, graphs, shuffle_seed=None, with_sids=False):
        bs = self.ocfg["batch_size"]
        M = self.dcfg["max_nodes_per_graph"]
        order = np.arange(len(graphs))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for i in range(0, len(order) - bs + 1, bs):
            chunk = [graphs[j] for j in order[i : i + bs]]
            batch = collate_dense(
                chunk, M, extra_node_keys=("tags", "pos_relaxed"),
                extra_graph_keys=("cell",),
            )
            if with_sids:
                yield batch, [g.get("sid", j) for g, j in zip(chunk, order[i : i + bs])]
            else:
                yield batch

    def _eval_params(self):
        return self.state.ema_params if self.state.ema_params is not None else self.state.params

    def validate(self):
        sums = {}
        for b in self.make_batches(self.val_data):
            out = self.eval_fn(self._eval_params(), b)
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        c = max(sums.get("count", 1.0), 1.0)
        res = {
            "energy_mae": sums["mae_sum"] / c,
            "energy_mse": sums["mse_sum"] / c,
            "energy_within_threshold": sums["within_threshold"] / c,
        }
        self.log.info("val: %s", {k: round(v, 6) for k, v in res.items()})
        return res

    def predict(self):
        """Denormalized per-system energies, merged across ranks by rank 0
        (reference EnergyTrainerV2.predict + BaseTrainerV2.save_results,
        energy_trainer_v2.py:133-225, base_trainer_oc20.py:707-757)."""
        params = self._eval_params()
        predictions = {"id": [], "energy": []}
        for b, sids in self.make_batches(self.val_data, with_sids=True):
            out = self.model.apply(params, jax.tree_util.tree_map(jnp.asarray, b),
                                   deterministic=True)
            e = out[0] if self.mcfg["use_auxiliary_task"] else out
            e = np.asarray(e) * self.ncfg["target_std"] + self.ncfg["target_mean"]
            keep = np.asarray(b.graph_mask)
            predictions["energy"].extend(e[keep].tolist())
            predictions["id"].extend(str(s) for s, k in zip(sids, keep) if k)
        merged = save_results(predictions, self.args.output_dir, "predictions",
                              keys=("energy",))
        if merged:
            self.log.info("wrote %d merged predictions to %s",
                          len(predictions["id"]), merged)
        return merged

    def train(self):
        if self.dp > 1:
            from ..parallel import make_mesh, make_parallel_train_step

            mesh = make_mesh(self.dp)
            step_fn = make_parallel_train_step(self.train_step, mesh)
            self.log.info("data parallel over %d devices", self.dp)
        else:
            mesh = None
            step_fn = jax.jit(self.train_step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)

        # preemption handling (analog of submitit Checkpointable +
        # mark_preempting, main_oc20.py:33,81-88): on SIGTERM, checkpoint at
        # the next step boundary
        import signal

        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass  # not the main thread

        for epoch in range(self.start_epoch, self.ocfg["max_epochs"]):
            meters = {k: AverageMeter() for k in ("loss", "mae", "grad_norm")}
            t0 = time.perf_counter()
            it = prefetch(self.make_batches(self.train_data, shuffle_seed=epoch))
            if self.dp > 1:
                from ..parallel import shard_batch, stack_batches

                def grouped(itr, dp=self.dp):
                    while True:
                        chunk = []
                        try:
                            for _ in range(dp):
                                chunk.append(next(itr))
                        except StopIteration:
                            return
                        yield shard_batch(stack_batches(chunk), mesh)

                it = grouped(it)
            for batch in it:
                rng, sub = jax.random.split(rng)
                self.state, m = step_fn(self.state, batch, sub)
                for k in meters:
                    if k in m:
                        meters[k].update(float(m[k]))
                if preempted["flag"]:
                    self.ckpt.save(int(self.state.step), self.state,
                                   metadata={"epoch": epoch - 1})
                    self.log.info("preempted: checkpointed at step %d",
                                  int(self.state.step))
                    self.ckpt.close()
                    return
            dt = time.perf_counter() - t0
            self.log.info("epoch %d: loss %.5f mae %.5f (%.1fs)", epoch,
                          meters["loss"].avg, meters["mae"].avg, dt)
            scalars = {k: v.avg for k, v in meters.items()}
            self.writer.write(int(self.state.step), scalars)
            self.tb.add_scalars(int(self.state.step), scalars)
            if (epoch + 1) % self.ocfg["eval_every_epochs"] == 0:
                val = self.validate()
                self.tb.add_scalars(int(self.state.step),
                                    {f"val/{k}": v for k, v in val.items()})
            self.ckpt.save(int(self.state.step), self.state, metadata={"epoch": epoch})
        self.ckpt.close()
        self.tb.close()


@register_task("train")
def _task_train(trainer):
    return trainer.train()


@register_task("validate")
def _task_validate(trainer):
    return trainer.validate()


@register_task("predict")
def _task_predict(trainer):
    return trainer.predict()


def _run_one(args, cfg):
    trainer_cls = registry_get("trainer", cfg.get("trainer", "energy_v2"))
    trainer = trainer_cls(args, cfg)
    task = registry_get("task", args.mode)
    return task(trainer)


def _submit_sweep(args, grid):
    """Write per-cell config snapshots + a SLURM array script whose tasks
    auto-requeue with --resume (the submitit Checkpointable analog,
    reference main_oc20.py:108-130; SIGTERM checkpointing is already handled
    in EnergyTrainerV2.train)."""
    import yaml as _yaml

    root = args.output_dir
    os.makedirs(root, exist_ok=True)
    for i, cfg in enumerate(grid):
        with open(os.path.join(root, f"sweep_{i}.yml"), "w") as f:
            _yaml.safe_dump(cfg, f)
    script = os.path.join(root, "sweep_array.sh")
    with open(script, "w") as f:
        f.write(
            "#!/bin/bash\n"
            f"#SBATCH --array=0-{len(grid) - 1}\n"
            "#SBATCH --requeue\n"
            "#SBATCH --signal=TERM@120\n"
            f"python -m equiformer_tpu.cli.train_oc20 \\\n"
            f"  --config-yml {root}/sweep_${{SLURM_ARRAY_TASK_ID}}.yml \\\n"
            f"  --output-dir {root}/cell_${{SLURM_ARRAY_TASK_ID}} --resume\n"
        )
    os.chmod(script, 0o755)
    print(f"wrote {len(grid)} sweep configs + {script}")
    return script


def main(args):
    """Registry-dispatched entry (reference main_oc20.py:60-66): config names
    the trainer, the CLI mode names the task; --sweep-yml expands a config
    grid (run sequentially, or emitted as a SLURM array with --submit)."""
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    cfg = resolve_config(args)
    if args.sweep_yml:
        from ..utils.config import create_grid

        grid = create_grid(cfg, args.sweep_yml)
        if args.submit:
            return _submit_sweep(args, grid)
        results = []
        base_out = args.output_dir
        for i, c in enumerate(grid):
            args.output_dir = os.path.join(base_out, f"cell_{i}")
            print(f"sweep cell {i}/{len(grid)}: {c.get('sweep_point')}")
            results.append(_run_one(args, c))
        args.output_dir = base_out
        return results
    return _run_one(args, cfg)


if __name__ == "__main__":
    main(get_args())
