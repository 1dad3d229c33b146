"""Shared CLI training-loop machinery for the QM9/MD17 runners.

Mirrors the reference engine/main loops (engine.py:30-141, main_qm9.py:226-288,
main_md17.py:225-329): epoch loop with per-epoch evaluation, EMA evaluation,
best-val/best-test checkpointing, wall-clock + metric logging — but with one
jitted train step and padded static batches.
"""

from __future__ import annotations

import argparse
import itertools
import os
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..data import GraphLoader, prefetch
from ..parallel import make_mesh, make_parallel_train_step, shard_batch, stack_batches
from ..train import AverageMeter, TrainState
from ..train.checkpoint import save_params
from ..utils.logger import FileLogger, MetricsWriter


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--output-dir", type=str, default="runs/default")
    p.add_argument("--model-name", type=str, default=None)
    p.add_argument("--data-path", type=str, default="datasets")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--eval-batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--min-lr", type=float, default=1e-6)
    p.add_argument("--weight-decay", type=float, default=5e-3)
    p.add_argument("--warmup-epochs", type=int, default=10)
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--num-basis", type=int, default=128)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--ema-decay", type=float, default=0.999)
    p.add_argument("--no-model-ema", action="store_true",
                   help="disable the EMA copy (reference --no-model-ema)")
    p.add_argument("--input-irreps", type=str, default=None,
                   help="one-hot input irreps (reference signature compat)")
    p.add_argument("--feature-type", type=str, default="one_hot",
                   choices=["one_hot"],
                   help="atom feature encoding (reference --feature-type)")
    p.add_argument("--drop-path", type=float, default=0.0)
    p.add_argument("--no-amp", action="store_true",
                   help="fp32 feature compute (default: bfloat16, the TPU "
                        "analog of the reference AMP autocast)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic data (no dataset files needed)")
    p.add_argument("--eval-interval", type=int, default=1)
    p.add_argument("--test-interval", type=int, default=0,
                   help="epoch interval for periodic test-set evaluation "
                        "(reference main_md17.py --test-interval; 0 = only "
                        "evaluate test when val improves)")
    p.add_argument("--test-max-iter", type=int, default=-1,
                   help="max batches per periodic test eval (reference "
                        "--test-max-iter; -1 = full test set)")
    p.add_argument("--print-freq", type=int, default=100)
    p.add_argument("--checkpoint-path", type=str, default=None)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--dp", type=int, default=1, help="data-parallel devices")
    return p


def run_epochs(
    args,
    state: TrainState,
    train_step: Callable,
    eval_step: Callable,
    train_loader: GraphLoader,
    val_loader: Optional[GraphLoader],
    test_loader: Optional[GraphLoader] = None,
    metric_keys=("loss", "mae"),
    eval_reduce: Optional[Callable] = None,
    extra_step_args: Callable = lambda epoch: (),
    logger: Optional[FileLogger] = None,
    best_key: str = "mae",
    score_fn: Optional[Callable[[Dict[str, float]], float]] = None,
):
    """Epoch loop with best-val AND best-test checkpointing.

    Mirrors main_md17.py:247-265 + update_best_results (main_md17.py:332-358):
    the test set is evaluated every ``args.test_interval`` epochs (and whenever
    val improves); val and test each keep their own best checkpoint, scored by
    ``score_fn`` (the reference's weighted energy/force error) or ``best_key``.
    """
    log = logger or FileLogger(True, args.output_dir)
    writer = MetricsWriter(args.output_dir)
    dp = getattr(args, "dp", 1)
    mesh = None
    if dp > 1:
        # data-parallel over the device mesh; the caller must have built
        # train_step with pmean_axis='dp'
        mesh = make_mesh(dp)
        n_extra = len(extra_step_args(0))
        step_fn = make_parallel_train_step(train_step, mesh, num_extra_args=n_extra)
        log.info("data parallel over %d devices", dp)
    else:
        step_fn = jax.jit(train_step, donate_argnums=(0,))
    eval_fn = jax.jit(eval_step)
    rng = jax.random.PRNGKey(args.seed)
    best_val = float("inf")
    best_test = float("inf")
    score = score_fn or (lambda r: r.get(best_key, float("inf")))
    test_interval = getattr(args, "test_interval", 0) or 0
    test_max_iter = getattr(args, "test_max_iter", -1)
    global_step = 0

    def evaluate(params, loader, tag, max_iter=-1):
        sums: Dict[str, float] = {}
        it = iter(loader)
        if max_iter >= 0:
            it = itertools.islice(it, max_iter)
        for batch in it:
            out = eval_fn(params, batch)
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        result = eval_reduce(sums) if eval_reduce else {
            "mae": sums.get("mae_sum", 0.0) / max(sums.get("count", 1.0), 1.0)
        }
        log.info("%s: %s", tag, {k: round(v, 6) for k, v in result.items()})
        return result

    if args.evaluate and val_loader is not None:
        return evaluate(state.params, val_loader, "eval")

    for epoch in range(args.epochs):
        meters = {k: AverageMeter() for k in metric_keys}
        t0 = time.perf_counter()
        it = prefetch(iter(train_loader))
        if dp > 1:
            def grouped(itr):
                while True:
                    chunk = []
                    try:
                        for _ in range(dp):
                            chunk.append(next(itr))
                    except StopIteration:
                        return
                    yield shard_batch(stack_batches(chunk), mesh)
            it = grouped(it)
        for i, batch in enumerate(it):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub, *extra_step_args(epoch))
            global_step += 1
            for k in metric_keys:
                if k in metrics:
                    meters[k].update(float(metrics[k]))
            if i % args.print_freq == 0:
                writer.write(global_step, {k: meters[k].avg for k in metric_keys})
        dt = time.perf_counter() - t0
        n_steps = max(len(train_loader), 1)
        log.info(
            "epoch %d: %s  (%.1fs, %.1f ms/step, %.1f graphs/s)",
            epoch,
            {k: round(meters[k].avg, 6) for k in metric_keys},
            dt, 1000 * dt / n_steps, args.batch_size * n_steps / dt,
        )
        if val_loader is not None and (epoch + 1) % args.eval_interval == 0:
            params_eval = state.ema_params if state.ema_params is not None else state.params
            result = evaluate(params_eval, val_loader, f"val epoch {epoch}")
            val_score = score(result)
            improved_val = val_score < best_val
            if improved_val:
                best_val = val_score
                save_params(os.path.join(args.output_dir, "best_val.npz"), params_eval)
                log.info("new best val score=%.6f", best_val)
            test_due = test_interval > 0 and (epoch + 1) % test_interval == 0
            if test_loader is not None and (test_due or improved_val):
                test_result = evaluate(
                    params_eval, test_loader, f"test epoch {epoch}",
                    max_iter=test_max_iter if test_due else -1,
                )
                test_score = score(test_result)
                if test_score < best_test:
                    best_test = test_score
                    save_params(
                        os.path.join(args.output_dir, "best_test.npz"), params_eval
                    )
                    log.info("new best test score=%.6f", best_test)
    save_params(os.path.join(args.output_dir, "final.npz"), state.params)
    return state
