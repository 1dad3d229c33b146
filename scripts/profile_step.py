"""Piecewise timing of the QM9 training step on the current jax backend.

Times (steady-state, jitted): radius graph build, spherical harmonics, RBF,
one DTP, full forward, forward+grad, full train step — to localize where the
milliseconds go on TPU.  Run: python scripts/profile_step.py [--batch 128]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from equiformer_tpu.core import Irreps, depthwise_tp, spherical_harmonics
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.graph import radius_graph, edge_vectors
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train import (
        TrainState, cosine_warmup_schedule, create_optimizer, make_qm9_steps,
    )

    bs = args.batch
    node_cap = ((bs * 24 + 127) // 128) * 128
    edge_cap = ((node_cap * 17 + 127) // 128) * 128
    print(f"batch={bs} node_cap={node_cap} edge_cap={edge_cap}")

    data = qm9_like_dataset(bs, seed=0)
    loader = GraphLoader(data, bs, node_cap, shuffle=False)
    b = next(iter(loader))
    import jax.tree_util as jtu
    b = jtu.tree_map(jnp.asarray, b)

    # 1. radius graph
    rg = jax.jit(lambda pos: radius_graph(pos, b.batch, b.node_mask, 5.0, edge_cap))
    print(f"radius_graph      : {timeit(rg, b.pos):8.2f} ms")
    edges = rg(b.pos)

    # 2. SH on edges
    vec, length = edge_vectors(b.pos, edges)
    sh_fn = jax.jit(lambda v: spherical_harmonics([0, 1, 2], v))
    print(f"spherical harmonics: {timeit(sh_fn, vec):8.2f} ms")
    sh = sh_fn(vec)

    # 3. one DTP (128x0e+64x1e+32x2e depthwise with per-edge weights)
    irr = Irreps("128x0e+64x1e+32x2e")
    tp = depthwise_tp(irr, Irreps("1x0e+1x1e+1x2e"), irr)
    E = edge_cap
    x = jax.random.normal(jax.random.PRNGKey(0), (E, irr.dim))
    w = jax.random.normal(jax.random.PRNGKey(1), (E, tp.weight_numel))
    dtp_fn = jax.jit(lambda x, s, w: tp.apply(x, s, w, scale_weights=True))
    print(f"one DTP (E={E})   : {timeit(dtp_fn, x, sh, w):8.2f} ms")

    # 4. full model forward / grad / train step
    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=128, max_edges=edge_cap, remat=args.remat
    )
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
    print(f"forward           : {timeit(fwd, params, b):8.2f} ms")

    def loss(p, b):
        out = model.apply(p, b, deterministic=True)
        return jnp.sum(jnp.where(b.graph_mask, out, 0.0))

    grad = jax.jit(jax.grad(loss))
    print(f"forward+grad      : {timeit(grad, params, b):8.2f} ms")

    opt = create_optimizer(cosine_warmup_schedule(5e-4, 100, 10000))
    ts, _ = make_qm9_steps(model, opt)
    state = TrainState.create(params, opt)
    step = jax.jit(ts)
    rng = jax.random.PRNGKey(2)

    def run_step(state):
        return ts(state, b, rng)

    sfn = jax.jit(run_step)
    print(f"train step        : {timeit(sfn, state):8.2f} ms")


if __name__ == "__main__":
    main()
