"""DeNS on-chip soak: a sustained run of the full DeNS recipe — on-device
masked gaussian noise augmentation, force encoding, the mixed outputs_dy head
(forces on clean nodes, denoising vectors on corrupted nodes), the 3-term
energy/force/denoising loss with double backward through the energy branch,
and the linearly-decaying denoising weight (reference main_md17_dens.py:
349-403, equiformer_md17_dens.py:238-352).

Model: the aspirin L3 DeNS config (configs/md17_dens/equiformer_dens_l3.yml =
reference equiformer_dens_N@6_L@3_C@128-64-64-32.yml), batch 8, bf16,
AdamW + EMA; script hyperparameters from
scripts/train/md17/equiformer_dens/se_l3/target@aspirin.sh
(e=1, f=80, dp=5.0 linearly decayed, prob 0.25, std 0.05, corrupt 0.25).

The synthetic target is the same conservative harmonic field soak_md17.py
uses (E* = k/2 sum |r - centroid|^2, F* = -dE*/dpos); absolute losses are not
comparable to real aspirin training — monotonic force-loss decay,
NaN-freeness, and step-time flatness are the validated properties.

Run: PYTHONPATH=. python scripts/soak_dens.py --steps 600 --out SOAK_r04_dens.md
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
    ap.add_argument("--out", type=str, default="SOAK_r04_dens.md")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument(
        "--recoverable", action="store_true",
        help="make the denoising target LEARNABLE: shrink the frames' thermal "
        "jitter around the fixed template to 0.005 (vs the DeNS noise std "
        "0.05), noise every batch (prob=1), and hold the dp weight constant. "
        "In the r4 recipe soak the jitter EQUALS the noise std, so thermal "
        "displacement and injected noise are statistically indistinguishable "
        "— the Bayes-optimal predictor recovers only sigma_n^2/(sigma_n^2+"
        "sigma_t^2) = half the noise, leaving an analytic L2MAE floor of "
        "sqrt(1/2)*1.596 = 1.13 vs 1.60 untrained; the observed ~1.4-2.3 "
        "hover is that floor plus batch-8 sampling noise.  At jitter 0.005 "
        "the floor drops to 0.159, so learning must show as decay.")
    args = ap.parse_args()

    from bench import tight_edge_cap
    from equiformer_tpu.core import Irreps
    from equiformer_tpu.data import GraphLoader, md17_like_dataset
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train import (
        TrainState,
        cosine_warmup_schedule,
        create_optimizer,
    )
    from equiformer_tpu.train.engine import make_dens_steps
    from equiformer_tpu.utils.config import load_config

    bs = args.batch
    slots = 21  # aspirin
    k_spring = 0.5
    data = md17_like_dataset(bs * 32, num_atoms=slots, seed=0)
    if args.recoverable:
        # re-jitter every frame around a common template at sigma_t = 0.005
        # << the DeNS noise std 0.05 (md17_like_dataset bakes sigma_t = 0.05,
        # which equals the noise std and makes the noise unrecoverable)
        rng_np = np.random.default_rng(1)
        template = data[0]["pos"].copy()
        for g in data:
            g["pos"] = (
                template
                + rng_np.normal(scale=0.005, size=template.shape)
            ).astype(np.float32)
    for g in data:
        pos = g["pos"]
        c = pos.mean(axis=0, keepdims=True)
        g["y"] = np.float32(0.5 * k_spring * float(np.sum((pos - c) ** 2)))
        g["forces"] = (-k_spring * (pos - c)).astype(np.float32)
    ys = [float(g["y"]) for g in data]
    mean, std = float(np.mean(ys)), float(np.std(ys))

    edge_cap = tight_edge_cap(data, bs, 5.0)
    ycfg = load_config("configs/md17_dens/equiformer_dens_l3.yml")["model"]
    kwargs = {
        k: (Irreps(v) if isinstance(v, str) and "x0e" in v else v)
        for k, v in ycfg.items()
    }
    kwargs["fc_neurons"] = tuple(kwargs["fc_neurons"])
    model = model_entrypoint("equiformer_md17_dens")(
        max_edges=edge_cap, nodes_per_graph=slots,
        compute_dtype=None if args.fp32 else "bfloat16",
        **kwargs,
    )
    loader = GraphLoader(
        data, batch_size=bs, shuffle=True, seed=0, dense_slots=slots,
        with_forces=True,
    )
    batches = [jax.tree_util.tree_map(jnp.asarray, b) for b in loader]

    params = model.init(jax.random.PRNGKey(0), batches[0], deterministic=True)
    opt = create_optimizer(
        cosine_warmup_schedule(2e-4, 100, args.steps), weight_decay=1e-6,
        grad_clip_norm=100.0,
    )
    train_step, _ = make_dens_steps(
        model, opt, mean, std, energy_weight=1.0, force_weight=80.0,
        denoising_pos_std=0.05,
        denoising_pos_prob=1.0 if args.recoverable else 0.25,
        corrupt_ratio=0.25,
    )
    state = TrainState.create(params, opt)
    step = jax.jit(train_step, donate_argnums=(0,))

    dp_w0 = 5.0
    rng = jax.random.PRNGKey(1)
    samples = []
    t_start = time.time()
    for chunk_start in range(0, args.steps, args.chunk):
        t0 = time.perf_counter()
        for i in range(chunk_start, min(chunk_start + args.chunk, args.steps)):
            rng, sub = jax.random.split(rng)
            # reference linear dp-weight decay over the run (main_md17_dens.py
            # epoch-fraction schedule, exercised per step here); the
            # recoverable-noise demonstration holds it constant so any decay
            # in loss_dp is attributable to learning, not the schedule
            dp_w = jnp.asarray(
                dp_w0 if args.recoverable
                else dp_w0 * (1.0 - i / args.steps),
                jnp.float32,
            )
            state, metrics = step(state, batches[i % len(batches)], sub, dp_w)
        loss_f = float(metrics["loss_f"])  # host materialization = true sync
        loss_e = float(metrics["loss_e"])
        loss_dp = float(metrics["loss_dp"])
        dt = time.perf_counter() - t0
        n = min(args.chunk, args.steps - chunk_start)
        samples.append({
            "step": chunk_start + n, "loss": round(float(metrics["loss"]), 4),
            "loss_e": round(loss_e, 4), "loss_f": round(loss_f, 4),
            "loss_dp": round(loss_dp, 4),
            "graphs_per_sec": round(bs * n / dt, 1),
        })
        print(json.dumps(samples[-1]), flush=True)
        assert all(np.isfinite(v) for v in (loss_e, loss_f, loss_dp)), samples[-1]

    total_s = time.time() - t_start
    rates = [s["graphs_per_sec"] for s in samples[1:]]
    flosses = [s["loss_f"] for s in samples]
    with open(args.out, "w") as fh:
        fh.write("# DeNS training soak report")
        fh.write(" (recoverable-noise variant)\n\n" if args.recoverable
                 else "\n\n")
        fh.write(
            f"- config: equiformer_dens_l3 (aspirin DeNS recipe), batch {bs}, "
            f"{'fp32' if args.fp32 else 'bf16'}, e:f:dp = 1:80:5.0 "
            + ("with CONSTANT dp weight, noise std 0.05 / prob 1.0 / "
               "corrupt 0.25, thermal jitter 0.005, "
               if args.recoverable else
               "with linear dp decay, noise std 0.05 / prob 0.25 / "
               "corrupt 0.25, ")
            + f"{args.steps} steps, {total_s/60:.1f} min wall; double backward "
            f"through the energy branch on the arbitrary-order fused "
            f"DTP+linear leg kernels\n"
        )
        if args.recoverable:
            dps = [s["loss_dp"] for s in samples if s["loss_dp"] > 0]
            fh.write(
                f"- denoising loss: start {dps[0]} -> final {dps[-1]} "
                f"(min {min(dps)}); analytic L2MAE bounds: 1.596 untrained "
                f"(predicting zero), 0.159 Bayes floor at jitter/noise = "
                f"0.005/0.05 (= sqrt(sigma_t^2/(sigma_t^2+sigma_n^2)) x "
                f"1.596)\n"
            )
        fh.write(
            f"- force loss (norm. units): start {flosses[0]} -> final "
            f"{flosses[-1]} (min {min(flosses)}); all 3 loss terms finite at "
            f"every sample\n"
        )
        if rates:
            fh.write(
                f"- step-time stability: {np.mean(rates):.1f} graphs/s mean, "
                f"min {min(rates)}, max {max(rates)} "
                f"({100*np.std(rates)/np.mean(rates):.1f}% rel std)\n\n"
            )
        fh.write("| step | loss | energy | force | denoising | graphs/s |\n")
        fh.write("|---|---|---|---|---|---|\n")
        for s in samples:
            fh.write(
                f"| {s['step']} | {s['loss']} | {s['loss_e']} | {s['loss_f']} "
                f"| {s['loss_dp']} | {s['graphs_per_sec']} |\n"
            )
        fh.write(
            "\nSynthetic harmonic-potential target (no MD17 files in the "
            "container): decay shape, NaN-freeness and step-time flatness "
            "are the validated properties.\n"
        )
        if args.recoverable:
            fh.write(
                "\nWhy the r4 recipe soak's denoising column was flat: the "
                "synthetic frames' thermal jitter around the template (0.05) "
                "EQUALS the DeNS noise std (0.05), so thermal displacement "
                "and injected noise are statistically indistinguishable; the "
                "Bayes-optimal predictor recovers only half the noise, "
                "leaving an L2MAE floor of sqrt(1/2) x 1.596 = 1.13 vs 1.60 "
                "for predicting zero — the observed 1.37-2.30 hover is that "
                "floor plus batch-8 prob-0.25 sampling noise.  This variant "
                "shrinks the jitter to 0.005 (like real MD17 aspirin, whose "
                "bonded geometry constrains atoms far more tightly than the "
                "0.05 noise), making the noise recoverable: the floor drops "
                "to 0.159 and learning must show as decay.\n"
            )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
