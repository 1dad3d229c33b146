"""OC20 IS2RE on-chip soak: several-hundred-step flagship run exercising the
full trainer surface — PBC top-k graphs, tag embedding, the IS2RS auxiliary
position head with linearly-decaying weight, Noisy-Nodes augmentation, and
grad accumulation — none of which run for more than a unit test elsewhere.

Model: the l1_256_nonlinear headline config (reference
oc20/configs/is2re/all/graph_attention_transformer/l1_256_nonlinear_g@2_local.yml,
graph_attention_transformer_oc20.py:74-386), batch 32, bf16, AdamW + EMA.
Training loop semantics: energy_trainer_v2.py:227-396.

The synthetic dataset carries a learnable structural target (a function of
composition and geometry) so the loss can decay; absolute values are not
comparable to real IS2RE, the decay shape / NaN-freeness / step-time
stability are the validated properties.

Run: PYTHONPATH=. python scripts/soak_oc20.py --steps 600 --out SOAK_r03.md
     PYTHONPATH=. python scripts/soak_oc20.py --blocks 18 --steps 3 --compile-check
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--accum", type=int, default=2, help="grad accumulation steps")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--out", type=str, default="SOAK_r03.md")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--compile-check", action="store_true",
                    help="run --steps steps and exit without a report (e.g. the "
                    "18-block aux config compile check)")
    args = ap.parse_args()

    import jax.tree_util as jtu

    from equiformer_tpu.data import oc20_like_dataset
    from equiformer_tpu.graph.batching import collate_dense
    from equiformer_tpu.models.oc20 import GraphAttentionTransformerOC20
    from equiformer_tpu.train import TrainState, cosine_warmup_schedule, create_optimizer
    from equiformer_tpu.train.oc20_engine import make_oc20_steps, with_grad_accumulation

    bs = args.batch
    slots = 80
    model = GraphAttentionTransformerOC20(
        num_layers=args.blocks,
        max_radius=5.0,
        max_neighbors=50,
        nonlinear_message=True,
        use_auxiliary_task=True,
        compute_dtype=None if args.fp32 else "bfloat16",
        # deep configs don't fit HBM with full activation (+save-z residual)
        # storage at batch 32: 18 blocks measured 34.5G vs 15.75G on v5e —
        # rematerialize blocks like the reference's checkpointing would
        remat=args.blocks > 8,
    )

    # learnable target: composition + geometry function with small noise
    data = oc20_like_dataset(bs * 16, seed=0)
    rng_np = np.random.default_rng(1)
    ys = []
    for g in data:
        pos = np.asarray(g["pos"])
        z = np.asarray(g["species"])
        y = (0.02 * len(pos) + 0.01 * float(z.mean())
             + 0.1 * float(np.linalg.norm(pos - pos.mean(0), axis=1).mean())
             + rng_np.normal(scale=0.01))
        g["y"] = np.float32(y)
        ys.append(y)
    mean, std = float(np.mean(ys)), float(np.std(ys))

    batches = []
    for i in range(0, len(data), bs):
        b = collate_dense(
            data[i : i + bs], slots,
            extra_node_keys=("tags", "pos_relaxed"), extra_graph_keys=("cell",),
        )
        batches.append(jtu.tree_map(jnp.asarray, b))

    params = model.init(jax.random.PRNGKey(0), batches[0], deterministic=True)
    opt = with_grad_accumulation(
        create_optimizer(
            cosine_warmup_schedule(2e-4, 100, args.steps), weight_decay=1e-3
        ),
        args.accum,
    )
    train_step, _ = make_oc20_steps(
        model, opt, target_mean=mean, target_std=max(std, 1e-3),
        use_auxiliary_task=True, auxiliary_task_weight=15.0,
        total_steps=args.steps, use_noisy_nodes=True,
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
        mae = float(metrics["mae"])  # host materialization = true sync
        loss = float(metrics["loss"])
        loss_aux = float(metrics["loss_aux"])
        dt = time.perf_counter() - t0
        n = min(args.chunk, args.steps - chunk_start)
        samples.append({
            "step": chunk_start + n, "loss": round(loss, 4),
            "mae": round(mae, 4), "loss_aux": round(loss_aux, 4),
            "graphs_per_sec": round(bs * n / dt, 1),
        })
        print(json.dumps(samples[-1]), flush=True)
        assert np.isfinite(loss) and np.isfinite(mae) and np.isfinite(loss_aux), (
            f"non-finite metric at step {chunk_start + n}"
        )
    total_s = time.time() - t_start
    if args.compile_check:
        print(f"compile-check ok ({args.blocks} blocks, {args.steps} steps, "
              f"{total_s:.0f}s)")
        return

    maes = [s["mae"] for s in samples]
    rates = [s["graphs_per_sec"] for s in samples[1:]]
    with open(args.out, "w") as fh:
        fh.write("# OC20 IS2RE soak report\n\n")
        fh.write(f"- config: l1_256_nonlinear, {args.blocks} blocks, aux IS2RS "
                 f"head (w 15->1), Noisy Nodes, grad accumulation x{args.accum}, "
                 f"batch {bs}, {'fp32' if args.fp32 else 'bf16'}, {args.steps} "
                 f"steps, {total_s/60:.1f} min wall\n")
        fh.write(f"- energy MAE (norm. units): start {maes[0]:.4f} -> min "
                 f"{min(maes):.4f} (final {maes[-1]:.4f}); all metrics finite "
                 f"at every sample\n")
        if rates:
            fh.write(f"- step-time stability: {np.mean(rates):.0f} graphs/s "
                     f"mean, min {min(rates):.0f}, max {max(rates):.0f} "
                     f"({100*np.std(rates)/np.mean(rates):.1f}% rel std)\n\n")
        fh.write("| step | loss | energy MAE | aux loss | graphs/s |\n"
                 "|---|---|---|---|---|\n")
        for s in samples:
            fh.write(f"| {s['step']} | {s['loss']} | {s['mae']} | "
                     f"{s['loss_aux']} | {s['graphs_per_sec']} |\n")
        fh.write("\nSynthetic PBC systems (no OC20 LMDB files in the "
                 "container); the target is a learnable structural function, "
                 "so decay shape, NaN-freeness and step-time flatness are the "
                 "validated properties (reference loop: "
                 "energy_trainer_v2.py:227-396).\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
