"""Benchmark: QM9 Equiformer training throughput (graphs/sec/chip).

Runs the flagship graph_attention_transformer_nonlinear_l2 full training step
(forward + backward + AdamW + EMA, alpha dropout active) on synthetic batches
with QM9 statistics (avg 18 atoms, r=5A radius graphs), batch 128 — the
reference training configuration (main_qm9.py defaults).  Features run in
bfloat16 by default (the analog of the reference's AMP training,
engine.py:58-81); pass --fp32 for full precision.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing protocol: the remote-TPU backend's block_until_ready does not imply
execution completed, so the loop host-materializes the loss every 10 steps
(true sync; ~100ms tunnel RTT amortized to <5%).

Baseline: the reference publishes no throughput numbers (BASELINE.md); we use
an estimated 400 graphs/sec for PyTorch Equiformer QM9 AMP training on one
A100 (batch 128, ~3.5M params, e3nn TPs) as the denominator — the
BASELINE.json target of 3x then corresponds to vs_baseline >= 3.0.  See
BASELINE.md "Throughput baseline derivation" for how 400 g/s was estimated.

MFU: FLOPs/step come from XLA's cost analysis of the *einsum-path* model
(EQUIFORMER_TPU_PALLAS=0) lowered on CPU — the Pallas kernels compute exactly
the same math (kernel tests enforce PallasDTP == plan.apply), but XLA cannot
count FLOPs inside custom calls, so the einsum lowering is the honest
analytic count.  Peak is the TPU v5e bf16 figure (197 TFLOP/s).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

A100_BASELINE_GRAPHS_PER_SEC = 400.0
TPU_V5E_PEAK_BF16_FLOPS = 197e12  # per chip (Google's published v5e spec)


def step_flops(batch_size: int) -> float:
    """Analytic FLOPs for one training step at this batch size, via XLA cost
    analysis of the einsum-path model lowered on CPU (run in a subprocess so
    the parent's backend choice is untouched).  Returns 0.0 on failure."""
    env = dict(os.environ)
    env["EQUIFORMER_TPU_PALLAS"] = "0"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops-only",
             "--batch", str(batch_size)],
            capture_output=True, text=True, timeout=1200, env=env,
        )
        for line in out.stdout.splitlines():
            if line.startswith('{"flops_per_step"'):
                return float(json.loads(line)["flops_per_step"])
    except Exception:
        pass
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny model on CPU")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--remat", action="store_true", help="rematerialize blocks (saves memory, ~30%% slower)")
    ap.add_argument("--fp32", action="store_true",
                    help="full fp32 features (default bf16, matching the reference's AMP training)")
    ap.add_argument("--flops-only", action="store_true",
                    help="lower the train step on CPU and print analytic FLOPs/step")
    args = ap.parse_args()

    import jax

    if args.smoke or args.flops_only:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from equiformer_tpu.core import Irreps
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.models import GraphAttentionTransformer, model_entrypoint
    from equiformer_tpu.train import (
        TrainState,
        cosine_warmup_schedule,
        create_optimizer,
        make_qm9_steps,
    )

    batch_size = 8 if args.smoke else args.batch
    slots = 30  # per-graph node slots (QM9 molecules have <= 29 atoms)
    node_cap = batch_size * slots
    # avg 18 atoms x avg degree 15.6 x 1.3 slack
    edge_cap = ((int(batch_size * 18 * 15.6 * 1.3) + 127) // 128) * 128

    if args.smoke:
        model = GraphAttentionTransformer(
            irreps_node_embedding=Irreps("16x0e+8x1e+4x2e"),
            num_layers=2,
            irreps_sh=Irreps("1x0e+1x1e+1x2e"),
            number_of_basis=16,
            fc_neurons=(16, 16),
            irreps_feature=Irreps("32x0e"),
            irreps_head=Irreps("4x0e+2x1e+1x2e"),
            num_heads=2,
            irreps_mlp_mid=Irreps("16x0e+8x1e+4x2e"),
            max_edges=edge_cap,
            nodes_per_graph=slots,
        )
    else:
        model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
            radius=5.0, num_basis=128, max_edges=edge_cap, remat=args.remat,
            nodes_per_graph=slots,
            compute_dtype=None if args.fp32 else "bfloat16",
        )

    data = qm9_like_dataset(batch_size * 4, seed=0)
    loader = GraphLoader(
        data, batch_size=batch_size, node_capacity=node_cap, shuffle=False,
        dense_slots=slots,
    )
    import jax.tree_util as jtu

    # device-resident batches: measure the device step, not host conversion
    batches = [jtu.tree_map(jnp.asarray, b) for b in loader]
    batch = batches[0]

    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    opt = create_optimizer(
        cosine_warmup_schedule(5e-4, 100, 100000), weight_decay=5e-3
    )
    train_step, _ = make_qm9_steps(model, opt, 0.0, 1.0, "l1")
    state = TrainState.create(params, opt)

    if args.flops_only:
        lowered = jax.jit(train_step).lower(state, batch, jax.random.PRNGKey(1))
        cost = lowered.cost_analysis() or {}
        print(json.dumps({"flops_per_step": float(cost.get("flops", 0.0))}))
        return

    step = jax.jit(train_step, donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    for i in range(args.warmup):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batches[i % len(batches)], sub)
    float(metrics["loss"])  # true sync (see note below)

    n_steps = 5 if args.smoke else args.steps
    # NOTE: on the axon remote backend jax.block_until_ready does NOT imply
    # execution completed; a host materialization (float()) is the only true
    # sync.  Fetch every 25 steps so the tunnel RTT (~100ms) amortizes to
    # <4%% of the measured window while still bounding the dispatch queue.
    t0 = time.perf_counter()
    for i in range(n_steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batches[i % len(batches)], sub)
        if (i + 1) % 25 == 0 or i == n_steps - 1:
            float(metrics["loss"])
    dt = time.perf_counter() - t0

    graphs_per_sec = batch_size * n_steps / dt

    result = {
        "metric": "qm9_train_throughput",
        "value": round(graphs_per_sec, 2),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(graphs_per_sec / A100_BASELINE_GRAPHS_PER_SEC, 3),
    }
    if not args.smoke:
        flops = step_flops(batch_size)
        if flops > 0:
            achieved = flops * (graphs_per_sec / batch_size)
            result["flops_per_step"] = flops
            result["mfu"] = round(achieved / TPU_V5E_PEAK_BF16_FLOPS, 5)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
