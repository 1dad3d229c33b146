"""OC20: PBC radius graph correctness and model forward tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiformer_tpu.core import Irreps
from equiformer_tpu.data import oc20_like_dataset
from equiformer_tpu.graph import (
    collate_dense,
    pbc_edge_vectors,
    radius_graph_pbc,
    radius_graph_topk,
)
from equiformer_tpu.models import GraphAttentionTransformerOC20, model_entrypoint

RNG = np.random.default_rng(8)


def _brute_force_pbc(pos, cell, r, max_neighbors, n_rep=1):
    """For each atom i: nearest max_neighbors neighbor images within r."""
    n = len(pos)
    reps = range(-n_rep, n_rep + 1)
    result = {}
    for i in range(n):
        cands = []
        for j in range(n):
            for ox in reps:
                for oy in reps:
                    for oz in reps:
                        off = np.array([ox, oy, oz], float) @ cell
                        if i == j and ox == oy == oz == 0:
                            continue
                        d = np.linalg.norm(pos[i] - pos[j] - off)
                        if d < r:
                            cands.append((d, j, (ox, oy, oz)))
        cands.sort(key=lambda t: t[0])
        result[i] = cands[:max_neighbors]
    return result


def test_pbc_graph_matches_brute_force():
    n = 12
    cell = np.diag([4.0, 5.0, 6.0])
    pos = RNG.uniform(size=(n, 3)) @ cell
    out = radius_graph_pbc(
        jnp.asarray(pos), jnp.asarray(cell)[None], jnp.ones(n, bool),
        graphs=1, r=3.0, max_neighbors=8, n_rep=1,
    )
    ref = _brute_force_pbc(pos, cell, 3.0, 8)
    src = np.asarray(out.edges.src)
    dst = np.asarray(out.edges.dst)
    mask = np.asarray(out.edges.mask)
    vec, length = pbc_edge_vectors(jnp.asarray(pos), out)
    length = np.asarray(length)
    for i in range(n):
        mine = sorted(length[(dst == i) & mask])
        want = [d for d, _, _ in ref[i]]
        assert np.allclose(mine, want, atol=1e-6), f"atom {i}"


def test_pbc_graph_respects_mask_and_batch():
    data = oc20_like_dataset(3, seed=1, min_atoms=10, max_atoms=20)
    b = collate_dense(
        data, max_nodes_per_graph=24, extra_node_keys=("tags",), extra_graph_keys=("cell",)
    )
    out = radius_graph_pbc(
        jnp.asarray(b.pos), jnp.asarray(b.extras["cell"]), jnp.asarray(b.node_mask),
        graphs=3, r=5.0, max_neighbors=12,
    )
    src, dst, m = map(np.asarray, (out.edges.src, out.edges.dst, out.edges.mask))
    # all real edges connect real nodes within the same graph
    assert np.all(b.node_mask[src[m]])
    assert np.all(b.node_mask[dst[m]])
    assert np.all(b.batch[src[m]] == b.batch[dst[m]])


def test_topk_truncation_keeps_nearest():
    pos = np.zeros((6, 3))
    pos[:, 0] = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    el = radius_graph_topk(jnp.asarray(pos), jnp.ones(6, bool), 1, r=10.0, max_neighbors=2)
    src, dst, m = map(np.asarray, (el.src, el.dst, el.mask))
    # atom 0's two nearest neighbors are atoms 1 and 2
    nb0 = sorted(src[(dst == 0) & m])
    assert nb0 == [1, 2]


def _tiny_oc20(**kw):
    base = dict(
        irreps_node_embedding=Irreps("16x0e+8x1e"),
        num_layers=2,
        irreps_sh=Irreps("1x0e+1x1e"),
        max_radius=5.0,
        number_of_basis=8,
        fc_neurons=(8, 8),
        irreps_feature=Irreps("32x0e"),
        irreps_head=Irreps("4x0e+2x1e"),
        num_heads=2,
        irreps_mlp_mid=Irreps("24x0e+12x1e"),
        alpha_drop=0.0,
        max_neighbors=12,
    )
    base.update(kw)
    return GraphAttentionTransformerOC20(**base)


def _oc20_batch(seed=2):
    data = oc20_like_dataset(2, seed=seed, min_atoms=10, max_atoms=16)
    return collate_dense(
        data, max_nodes_per_graph=20,
        extra_node_keys=("tags", "pos_relaxed"), extra_graph_keys=("cell",),
    )


def test_oc20_forward_energy():
    model = _tiny_oc20()
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e = model.apply(params, b, deterministic=True)
    assert e.shape == (2,)
    assert np.all(np.isfinite(np.asarray(e)))


def test_oc20_translation_invariance_with_pbc():
    """Rigid translation (mod cell) must not change the energy."""
    model = _tiny_oc20()
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e = np.asarray(model.apply(params, b, deterministic=True))
    shift = np.array([0.37, -1.21, 0.55], np.float32)
    b2 = dataclasses.replace(b, pos=b.pos + shift)
    e2 = np.asarray(model.apply(params, b2, deterministic=True))
    assert np.max(np.abs(e - e2)) < 2e-5


def test_oc20_aux_head():
    model = _tiny_oc20(use_auxiliary_task=True)
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e, aux = model.apply(params, b, deterministic=True)
    assert e.shape == (2,) and aux.shape == (b.pos.shape[0], 3)
    assert np.all(np.isfinite(np.asarray(aux)))


def test_oc20_attention_head_joint():
    model = _tiny_oc20(use_attention_head=True, use_auxiliary_task=True)
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e, aux = model.apply(params, b, deterministic=True)
    assert e.shape == (2,) and aux.shape == (b.pos.shape[0], 3)


def test_oc20_atom_edge_attr_and_registry():
    model = model_entrypoint("graph_attention_transformer_oc20")(
        irreps_node_embedding=Irreps("16x0e+8x1e"),
        num_layers=1,
        irreps_sh=Irreps("1x0e+1x1e"),
        number_of_basis=8,
        fc_neurons=(8,),
        irreps_feature=Irreps("32x0e"),
        irreps_head=Irreps("4x0e+2x1e"),
        num_heads=2,
        irreps_mlp_mid=Irreps("16x0e+8x1e"),
        use_atom_edge_attr=True,
        max_neighbors=8,
    )
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e = model.apply(params, b, deterministic=True)
    assert np.all(np.isfinite(np.asarray(e)))


@pytest.mark.slow  # 33s integration step; components unit-tested separately
def test_oc20_training_step_with_aux_and_noisy_nodes():
    from equiformer_tpu.train import (
        TrainState,
        cosine_warmup_schedule,
        create_optimizer,
        make_oc20_steps,
        with_grad_accumulation,
    )

    model = _tiny_oc20(use_auxiliary_task=True)
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    opt = with_grad_accumulation(
        create_optimizer(cosine_warmup_schedule(2e-4, 10, 100), grad_clip_norm=10.0),
        every=2,
    )
    train_step, eval_step = make_oc20_steps(
        model, opt, target_mean=-1.5259, target_std=2.2794, positions_std=0.8772,
        use_auxiliary_task=True, auxiliary_task_weight=15.0, total_steps=100,
        use_noisy_nodes=True,
    )
    state = TrainState.create(params, opt)
    step = jax.jit(train_step)
    rng = jax.random.PRNGKey(4)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, m = step(state, b, sub)
        assert np.isfinite(float(m["loss"])), i
        assert np.isfinite(float(m["loss_aux"]))
    ev = jax.jit(eval_step)(state.params, b)
    assert float(ev["count"]) == 2.0
    assert np.isfinite(float(ev["mae_sum"]))


def test_noisy_nodes_only_moves_tagged_atoms():
    from equiformer_tpu.train import interpolate_init_relaxed_pos

    b = _oc20_batch()
    import jax.numpy as jnp
    b2 = interpolate_init_relaxed_pos(
        dataclasses.replace(b, pos=jnp.asarray(b.pos)), jax.random.PRNGKey(0)
    )
    moved = np.abs(np.asarray(b2.pos) - np.asarray(b.pos)).sum(-1) > 0
    tags = np.asarray(b.extras["tags"])
    assert not np.any(moved[(tags == 0) | ~np.asarray(b.node_mask)])


def test_dp_attention_oc20_forward():
    model = model_entrypoint("dp_attention_transformer_oc20")(
        irreps_node_embedding=Irreps("16x0e+8x1e"),
        num_layers=1,
        irreps_sh=Irreps("1x0e+1x1e"),
        number_of_basis=8,
        fc_neurons=(8,),
        irreps_feature=Irreps("32x0e"),
        irreps_head=Irreps("4x0e+2x1e"),
        num_heads=2,
        irreps_mlp_mid=Irreps("16x0e+8x1e"),
        max_neighbors=8,
    )
    assert model.attn_type == "dot"
    b = _oc20_batch()
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    e = model.apply(params, b, deterministic=True)
    assert np.all(np.isfinite(np.asarray(e)))


def test_trainer_registry():
    from equiformer_tpu.train.registry import get

    assert get("logger", "file") is not None
    assert get("dataset", "lmdb_v2") is not None
    import pytest as _pytest

    with _pytest.raises(KeyError):
        get("trainer", "nope")


def test_tensorboard_writer_roundtrip(tmp_path):
    """TFEvents writer: crc32c known-answer + write/parse round trip."""
    from equiformer_tpu.utils.tensorboard import (
        TensorboardWriter,
        crc32c,
        read_events,
    )

    # public CRC-32C test vector (RFC 3720 / golang hash/crc32 Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283

    logdir = str(tmp_path / "tb")
    with TensorboardWriter(logdir) as tb:
        tb.add_scalars(1, {"loss": 0.5, "mae": 2.0})
        tb.add_scalars(2, {"loss": 0.25})
        tb.add_scalar("lr", 1e-3, 3)
    import glob
    import os

    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    # first record is the file_version header
    assert events[0][2] == {}
    assert events[1][0] == 1 and abs(events[1][2]["loss"] - 0.5) < 1e-7
    assert abs(events[1][2]["mae"] - 2.0) < 1e-7
    assert events[2][0] == 2 and abs(events[2][2]["loss"] - 0.25) < 1e-7
    assert events[3][0] == 3 and abs(events[3][2]["lr"] - 1e-3) < 1e-9

    # disabled writer writes nothing and tolerates calls
    tb2 = TensorboardWriter(str(tmp_path / "tb2"), enabled=False)
    tb2.add_scalars(1, {"x": 1.0})
    tb2.close()
    assert not os.path.exists(str(tmp_path / "tb2"))


def test_tensorboard_real_consumer(tmp_path):
    """The from-spec TFEvents writer, parsed by the REAL tensorboard package
    (EventFileLoader verifies the masked CRC32C of every record) — external
    validation of the wire format, not a round trip through our own reader."""
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    from equiformer_tpu.utils.tensorboard import TensorboardWriter

    logdir = str(tmp_path / "tb")
    with TensorboardWriter(logdir) as tb:
        tb.add_scalars(1, {"loss": 0.5, "mae": 2.0})
        tb.add_scalar("lr", 1e-3, 3)
    import glob
    import os

    (path,) = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    events = list(EventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"
    assert events[0].wall_time > 0

    scalars = {}
    for ev in events[1:]:
        for val in ev.summary.value:
            # tensorboard 2.x migrates simple_value -> rank-0 tensor on load
            v = (val.tensor.float_val[0] if val.tensor.float_val
                 else val.simple_value)
            scalars[(ev.step, val.tag)] = v
    assert abs(scalars[(1, "loss")] - 0.5) < 1e-7
    assert abs(scalars[(1, "mae")] - 2.0) < 1e-7
    assert abs(scalars[(3, "lr")] - 1e-3) < 1e-9


def test_export_jsonl_to_tensorboard(tmp_path):
    from equiformer_tpu.utils.tensorboard import export_jsonl, read_events

    run = tmp_path / "run"
    run.mkdir()
    (run / "metrics.jsonl").write_text(
        '{"step": 1, "loss": 1.5, "time": 99.0}\n{"step": 2, "loss": 0.75}\n'
    )
    out = export_jsonl(str(run))
    import glob
    import os

    (f,) = glob.glob(os.path.join(out, "events.out.tfevents.*"))
    events = [e for e in read_events(f) if e[2]]
    assert [e[0] for e in events] == [1, 2]
    assert "time" not in events[0][2]


def test_save_results_merge(tmp_path):
    """Cross-rank predict merge (reference base_trainer_oc20.py:707-757):
    rank files concatenated, deduped by id, rank files removed."""
    import os

    import numpy as np

    from equiformer_tpu.train.oc20_engine import save_results

    d = str(tmp_path)
    # simulate rank 1 having written first (with an overlapping id, as the
    # distributed sampler pads shards by repeating systems)
    save_results({"id": ["2", "3", "0"], "energy": [2.0, 3.0, 99.0]}, d,
                 "predictions", rank=1, world_size=2)
    merged = save_results({"id": ["0", "1"], "energy": [0.0, 1.0]}, d,
                          "predictions", rank=0, world_size=2)
    assert merged is not None and os.path.exists(merged)
    with np.load(merged, allow_pickle=True) as data:
        ids = [str(i) for i in data["ids"]]
        assert ids == ["0", "1", "2", "3"]
        np.testing.assert_allclose(data["energy"], [0.0, 1.0, 2.0, 3.0])
    assert not os.path.exists(os.path.join(d, "is2re_predictions_0.npz"))
    assert not os.path.exists(os.path.join(d, "is2re_predictions_1.npz"))


@pytest.mark.slow
def test_oc20_cli_registry_dispatch(tmp_path):
    """End-to-end: the CLI resolves trainer + task via the registry, trains a
    synthetic epoch, and predict writes a merged npz with ids."""
    import numpy as np

    from equiformer_tpu.cli.train_oc20 import get_args, main

    out = str(tmp_path / "run")
    argv = ["--synthetic", "--epochs", "1", "--output-dir", out,
            "--override", "model.num_layers=1", "model.irreps_node_embedding=32x0e+16x1e",
            "model.irreps_feature=64x0e", "model.irreps_head=8x0e+4x1e",
            "model.irreps_mlp_mid=48x0e+24x1e", "model.number_of_basis=16",
            "model.fc_neurons=[16,16]", "optim.batch_size=16"]
    main(get_args(argv))
    pred_path = main(get_args(argv + ["--mode", "predict"]))
    with np.load(pred_path, allow_pickle=True) as data:
        assert len(data["ids"]) == len(data["energy"]) == 64
