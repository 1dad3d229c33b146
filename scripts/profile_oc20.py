"""Decompose the OC20 IS2RE train step on the current backend.

The round-3 bench reads 128.8 graphs/s (248ms/step, MFU 8.6%) for the
l1_256_nonlinear 6-block model at batch 32.  Suspects: (a) the PBC top-k
graph build (lattice-image enumeration + lax.top_k over 80 slots x images),
(b) the mul=256 multi-slot fused DTP kernels, (c) the attention tail,
(d) everything else (norms, FFN FCTPs, radial MLPs).

Run: PYTHONPATH=. python scripts/profile_oc20.py [--batch 32] [--fp32]
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


def timeit(fn, *args, n=20, warmup=3):
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
    return max((time.perf_counter() - t0 - _RTT) / n, 0.0) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import types

    import bench

    bargs = types.SimpleNamespace(smoke=False, fp32=args.fp32)
    train_step, state, batches = bench.build_oc20(bargs, args.batch)
    b = batches[0]

    from equiformer_tpu.graph.pbc import radius_graph_pbc
    from equiformer_tpu.models.oc20 import GraphAttentionTransformerOC20

    model = GraphAttentionTransformerOC20(
        max_radius=5.0, max_neighbors=50, nonlinear_message=True,
        compute_dtype=None if args.fp32 else "bfloat16",
    )
    params = state.params
    G = b.graph_mask.shape[0]

    # (a) PBC graph build alone
    graph_fn = jax.jit(lambda b: radius_graph_pbc(
        b.pos, b.extras["cell"], b.node_mask, G, 5.0, 50
    ).edges.dst)
    t_graph = timeit(graph_fn, b, n=args.n)

    # (b) model forward / (c) forward+grad
    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
    t_fwd = timeit(fwd, params, b, n=args.n)

    def loss(p, b):
        out = model.apply(p, b, deterministic=True)
        e = out[0] if isinstance(out, tuple) else out
        return jnp.sum(jnp.abs(e.astype(jnp.float32)))

    grad = jax.jit(jax.grad(loss))
    t_grad = timeit(grad, params, b, n=args.n)

    # (d) full train step (incl optimizer, EMA, aux loss, Noisy Nodes off)
    step = jax.jit(train_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    st = state
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        st, m = step(st, b, sub)
    _sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.n):
        rng, sub = jax.random.split(rng)
        st, m = step(st, b, sub)
    _sync(m["loss"])
    t_step = (time.perf_counter() - t0 - _RTT) / args.n * 1000

    print(f"batch {args.batch}: pbc-graph {t_graph:7.2f}ms  fwd {t_fwd:7.2f}ms  "
          f"fwd+grad {t_grad:7.2f}ms  train-step {t_step:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
