"""Decompose the MD17 energy+force train step cost on the current backend.

The round-3 bench measured 34.7 graphs/s (231ms/step, MFU 0.79%) for
nonlinear_exp_l3 aspirin at batch 8 — far below the QM9 path's efficiency.
Three multiplicative suspects, isolated here:

  (a) the L3 model itself (wider DTP plans, edge tile auto-shrunk to 64),
  (b) the higher_order_grads=True composed ops (no fused DTP+linear, no CSR
      scatters, no custom-VJP softmax/gather),
  (c) the double backward (grad-of-grad through the force computation),
  (d) batch-8 latency (168 nodes / ~3.1k edges cannot fill a v5e).

Run: PYTHONPATH=. python scripts/profile_md17.py [--batches 8,16,32] [--fp32]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


_RTT = None


def timeit(fn, *args, n=10, warmup=2):
    global _RTT
    if _RTT is None:
        x = jnp.zeros(())
        _sync(x + 1)
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(x + 1)
        _RTT = (time.perf_counter() - t0) / 5
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - _RTT) / n, 0.0) * 1000  # ms


def build(batch_size, higher_order, fp32):
    import dataclasses

    import jax.tree_util as jtu

    from equiformer_tpu.data import GraphLoader, md17_like_dataset
    from equiformer_tpu.models import model_entrypoint
    from bench import tight_edge_cap

    slots = 21
    data = md17_like_dataset(batch_size * 2, num_atoms=slots, seed=0)
    edge_cap = tight_edge_cap(data, batch_size, 5.0)
    model = model_entrypoint("graph_attention_transformer_nonlinear_exp_l3_md17")(
        radius=5.0, num_basis=128, max_edges=edge_cap, nodes_per_graph=slots,
        compute_dtype=None if fp32 else "bfloat16",
        higher_order_grads=higher_order,
    )
    loader = GraphLoader(
        data, batch_size=batch_size, node_capacity=batch_size * slots,
        shuffle=False, dense_slots=slots, with_forces=True,
    )
    batch = jtu.tree_map(jnp.asarray, next(iter(loader)))
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    return model, params, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import dataclasses

    from equiformer_tpu.models.md17_models import energy_and_forces

    for bs in [int(b) for b in args.batches.split(",")]:
        for ho in (False, True):
            model, params, batch = build(bs, ho, args.fp32)

            fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
            t_fwd = timeit(fwd, params, batch, n=args.n)

            def e_loss(p, b):
                e = model.apply(p, b, deterministic=True)
                return jnp.sum(jnp.abs(e))

            e_grad = jax.jit(jax.grad(e_loss))
            t_egrad = timeit(e_grad, params, batch, n=args.n)

            ef = jax.jit(lambda p, b: energy_and_forces(model, p, b)[1])
            t_ef = timeit(ef, params, batch, n=args.n)

            row = (f"batch {bs:3d} ho={int(ho)}: fwd {t_fwd:7.2f}ms  "
                   f"e-grad {t_egrad:7.2f}ms  forces(vjp) {t_ef:7.2f}ms")
            if ho:
                def ef_loss(p, b):
                    e, f = energy_and_forces(model, p, b)
                    return jnp.sum(jnp.abs(e)) + 80.0 * jnp.sum(jnp.abs(f))

                ef_grad = jax.jit(jax.grad(ef_loss))
                t_efgrad = timeit(ef_grad, params, batch, n=args.n)
                row += f"  e+f-grad(double-bwd) {t_efgrad:7.2f}ms"
            print(row, flush=True)


if __name__ == "__main__":
    main()
