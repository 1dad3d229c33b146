"""MD17 force-training soak: a sustained on-chip energy+force run through the
round-3 arbitrary-order fused kernels (kernels/dtp_lin_ho.py + the
graph/linear_prims scatters) — the double-backward path that unit tests only
touch for a few steps.

The synthetic target is a *conservative* field the model can learn: a
per-molecule harmonic potential around the centroid,
``E* = k/2 sum |r - centroid|^2``, ``F* = -k (r - centroid)`` (forces are
exactly -dE*/dpos, matching what the model structurally predicts).  Absolute
MAE values are not comparable to real aspirin training; the validated
properties are monotonic force-MAE decay, NaN-freeness, and step-time
flatness (reference recipe: graph_attention_transformer_md17.py:318-325,
main_md17.py:349-405, batch 8, energy:force = 1:80).

Run: PYTHONPATH=. python scripts/soak_md17.py --steps 600 --out SOAK_r03_md17.md
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--out", type=str, default="SOAK_r03_md17.md")
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from bench import tight_edge_cap
    from equiformer_tpu.data import GraphLoader, md17_like_dataset
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train import (
        TrainState,
        cosine_warmup_schedule,
        create_optimizer,
        make_md17_steps,
    )

    bs = args.batch
    slots = 21
    k_spring = 0.5
    data = md17_like_dataset(bs * 32, num_atoms=slots, seed=0)
    for g in data:
        pos = g["pos"]
        c = pos.mean(axis=0, keepdims=True)
        g["y"] = np.float32(0.5 * k_spring * float(np.sum((pos - c) ** 2)))
        g["forces"] = (-k_spring * (pos - c)).astype(np.float32)
    ys = [float(g["y"]) for g in data]
    mean, std = float(np.mean(ys)), float(np.std(ys))

    edge_cap = tight_edge_cap(data, bs, 5.0)
    model = model_entrypoint("graph_attention_transformer_nonlinear_exp_l3_md17")(
        radius=5.0, num_basis=128, max_edges=edge_cap, nodes_per_graph=slots,
        compute_dtype=None if args.fp32 else "bfloat16",
    )
    loader = GraphLoader(
        data, batch_size=bs, shuffle=True, seed=0, dense_slots=slots,
        with_forces=True,
    )
    batches = [jax.tree_util.tree_map(jnp.asarray, b) for b in loader]

    params = model.init(jax.random.PRNGKey(0), batches[0], deterministic=True)
    opt = create_optimizer(
        cosine_warmup_schedule(5e-4, 100, args.steps), weight_decay=1e-6,
        grad_clip_norm=100.0,
    )
    # script hyperparameters: scripts/train/md17/equiformer/l3/target@aspirin.sh
    train_step, _ = make_md17_steps(
        model, opt, mean, std, energy_weight=1.0, force_weight=80.0
    )
    state = TrainState.create(params, opt)
    step = jax.jit(train_step, donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    samples = []
    t_start = time.time()
    for chunk_start in range(0, args.steps, args.chunk):
        t0 = time.perf_counter()
        for i in range(chunk_start, min(chunk_start + args.chunk, args.steps)):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batches[i % len(batches)], sub)
        mae_f = float(metrics["mae_f"])  # host materialization = true sync
        mae_e = float(metrics["mae_e"])
        dt = time.perf_counter() - t0
        n = min(args.chunk, args.steps - chunk_start)
        samples.append({
            "step": chunk_start + n, "loss": round(float(metrics["loss"]), 4),
            "mae_e": round(mae_e, 4), "mae_f": round(mae_f, 4),
            "graphs_per_sec": round(bs * n / dt, 1),
        })
        print(json.dumps(samples[-1]), flush=True)
        assert np.isfinite(mae_f) and np.isfinite(mae_e), samples[-1]

    total_s = time.time() - t_start
    rates = [s["graphs_per_sec"] for s in samples[1:]]
    fmaes = [s["mae_f"] for s in samples]
    with open(args.out, "w") as fh:
        fh.write("# MD17 force-training soak report\n\n")
        fh.write(
            f"- config: nonlinear_exp_l3 (aspirin recipe), batch {bs}, "
            f"{'fp32' if args.fp32 else 'bf16'}, energy:force = 1:80, "
            f"{args.steps} steps, {total_s/60:.1f} min wall; the double "
            f"backward runs on the arbitrary-order fused DTP+linear leg "
            f"kernels + linear graph primitives\n"
        )
        fh.write(
            f"- force MAE (norm. units): start {fmaes[0]} -> final "
            f"{fmaes[-1]} (min {min(fmaes)}); all metrics finite at every "
            f"sample\n"
        )
        if rates:
            fh.write(
                f"- step-time stability: {np.mean(rates):.1f} graphs/s mean, "
                f"min {min(rates)}, max {max(rates)} "
                f"({100*np.std(rates)/np.mean(rates):.1f}% rel std)\n\n"
            )
        fh.write("| step | loss | energy MAE | force MAE | graphs/s |\n")
        fh.write("|---|---|---|---|---|\n")
        for s in samples:
            fh.write(
                f"| {s['step']} | {s['loss']} | {s['mae_e']} | {s['mae_f']} "
                f"| {s['graphs_per_sec']} |\n"
            )
        fh.write(
            "\nSynthetic harmonic-potential target (no MD17 files in the "
            "container): decay shape, NaN-freeness and step-time flatness "
            "are the validated properties.\n"
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
