"""Unit tests for the shared CLI epoch loop: --test-interval periodic test
evaluation, --test-max-iter capping, and separate best-val / best-test
checkpoints (reference main_md17.py:219-265, update_best_results :332-358)."""

import os
from types import SimpleNamespace

import jax.numpy as jnp
import optax
import pytest

from equiformer_tpu.cli.common import run_epochs
from equiformer_tpu.train import TrainState


class CountingLoader:
    """Iterable of identical fake batches that counts consumption."""

    def __init__(self, n_batches):
        self.n_batches = n_batches
        self.iters = 0
        self.batches_consumed = 0

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        self.iters += 1
        for _ in range(self.n_batches):
            self.batches_consumed += 1
            yield jnp.zeros((1,))


def _args(tmp_path, **kw):
    base = dict(
        output_dir=str(tmp_path), epochs=4, eval_interval=1, test_interval=2,
        test_max_iter=-1, print_freq=100, seed=0, batch_size=1, dp=1,
        evaluate=False,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _state():
    return TrainState.create({"w": jnp.zeros((1,))}, optax.sgd(0.0), use_ema=False)


def _train_step(state, batch, rng):
    return state, {"loss": jnp.zeros(())}


def _const_eval_step(params, batch):
    return {"mae_sum": jnp.ones(()), "count": jnp.ones(())}


def test_periodic_test_eval_and_checkpoints(tmp_path):
    train, val, test = CountingLoader(2), CountingLoader(1), CountingLoader(5)
    run_epochs(
        _args(tmp_path), _state(), _train_step, _const_eval_step,
        train, val, test, metric_keys=("loss",),
    )
    # val is constant: improves only at epoch 0 (from inf) -> one full test
    # eval; test_interval=2 adds periodic evals at epochs 1 and 3.
    assert test.iters == 3
    assert test.batches_consumed == 15
    assert os.path.exists(tmp_path / "best_val.npz")
    # the test score also only improves once (epoch 0)
    assert os.path.exists(tmp_path / "best_test.npz")


def test_test_max_iter_caps_periodic_evals(tmp_path):
    train, val, test = CountingLoader(2), CountingLoader(1), CountingLoader(5)
    run_epochs(
        _args(tmp_path, test_max_iter=2), _state(), _train_step,
        _const_eval_step, train, val, test, metric_keys=("loss",),
    )
    # epoch 0: improved-val eval is uncapped (5); epochs 1 and 3: periodic,
    # capped at 2 batches each (reference --test-max-iter, main_md17.py:99).
    assert test.batches_consumed == 5 + 2 + 2


def test_no_interval_means_test_only_on_val_improvement(tmp_path):
    train, val, test = CountingLoader(2), CountingLoader(1), CountingLoader(3)
    run_epochs(
        _args(tmp_path, test_interval=0), _state(), _train_step,
        _const_eval_step, train, val, test, metric_keys=("loss",),
    )
    assert test.iters == 1  # only the epoch-0 improvement


def test_weighted_score_fn_drives_best_checkpoint(tmp_path):
    # score_fn receives the reduced eval dict; make it blow up if missing keys
    calls = []

    def score(r):
        calls.append(r)
        return 0.2 * r["mae"] + 0.8 * r["mae"]

    train, val = CountingLoader(2), CountingLoader(1)
    run_epochs(
        _args(tmp_path, epochs=2), _state(), _train_step, _const_eval_step,
        train, val, None, metric_keys=("loss",), score_fn=score,
    )
    assert len(calls) == 2
    assert os.path.exists(tmp_path / "best_val.npz")
    assert not os.path.exists(tmp_path / "best_test.npz")
