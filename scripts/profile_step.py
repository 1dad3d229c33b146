"""Piecewise timing of the QM9 training step on the current jax backend.

Run: PYTHONPATH=. python scripts/profile_step.py [--batch 128] [--remat]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


_RTT = None


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def _measure_rtt():
    global _RTT
    if _RTT is None:
        x = jnp.zeros(())
        _sync(x + 1.0)
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(x + 1.0)
        _RTT = (time.perf_counter() - t0) / 5
    return _RTT


def timeit(fn, *args, n=20, warmup=2):
    """True-sync timing on the axon remote backend: block_until_ready does not
    imply completion there, so materialize a scalar on host and subtract the
    measured tunnel RTT (amortized over n calls)."""
    rtt = _measure_rtt()
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - rtt) / n, 0.0) * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bf16", action="store_true", help="model compute in bfloat16")
    ap.add_argument("--kernels-only", action="store_true",
                    help="skip the micro benches, profile only the model step")
    args = ap.parse_args()

    from equiformer_tpu.core import Irreps, depthwise_tp, spherical_harmonics
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.graph import edge_vectors, segment_softmax, segment_sum
    from equiformer_tpu.graph.radius_graph import radius_graph_dense
    from equiformer_tpu.kernels.dtp_pallas import PallasDTP
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.nn import IrrepsLinear, RadialProfile
    from equiformer_tpu.train import (
        TrainState, cosine_warmup_schedule, create_optimizer, make_qm9_steps,
    )

    bs = args.batch
    slots = 30
    node_cap = bs * slots
    edge_cap = ((int(bs * 18 * 15.6 * 1.3) + 127) // 128) * 128
    print(f"batch={bs} node_cap={node_cap} edge_cap={edge_cap}")

    data = qm9_like_dataset(bs, seed=0)
    loader = GraphLoader(data, bs, shuffle=False, dense_slots=slots)
    b = next(iter(loader))
    import jax.tree_util as jtu
    b = jtu.tree_map(jnp.asarray, b)

    if args.kernels_only:
        _model_section(args, b, bs, slots, edge_cap)
        return

    rg = jax.jit(lambda pos: radius_graph_dense(pos, b.node_mask, bs, 5.0, edge_cap))
    print(f"radius_graph_dense: {timeit(rg, b.pos):8.2f} ms")
    edges = rg(b.pos)

    vec, length = edge_vectors(b.pos, edges)
    sh_fn = jax.jit(lambda v: spherical_harmonics([0, 1, 2], v))
    sh = sh_fn(vec)

    irr = Irreps("128x0e+64x1e+32x2e")
    tp = depthwise_tp(irr, Irreps("1x0e+1x1e+1x2e"), irr)
    E = edge_cap
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, irr.dim))
    w = jax.random.normal(key, (E, tp.weight_numel))
    dtp_einsum = jax.jit(lambda x, s, w: tp.apply(x, s, w, scale_weights=True))
    print(f"DTP einsum fwd    : {timeit(dtp_einsum, x, sh, w):8.2f} ms")
    pk = PallasDTP(tp)
    dtp_pallas = jax.jit(lambda x, s, w: pk(x, s, w))
    print(f"DTP pallas fwd    : {timeit(dtp_pallas, x, sh, w):8.2f} ms")

    def dtp_grad(x, s, w):
        return jax.grad(lambda x: jnp.sum(pk(x, s, w) ** 2))(x)
    print(f"DTP pallas fwd+bwd: {timeit(jax.jit(dtp_grad), x, sh, w):8.2f} ms")

    rad = RadialProfile(features=(64, 64, tp.weight_numel))
    rbfv = jax.random.normal(key, (E, 128))
    rp = rad.init(key, rbfv)
    rad_fn = jax.jit(lambda p, r: rad.apply(p, r))
    print(f"radial MLP fwd    : {timeit(rad_fn, rp, rbfv):8.2f} ms")

    lin = IrrepsLinear(irr, irr)
    xn = jax.random.normal(key, (node_cap, irr.dim))
    lp = lin.init(key, xn)
    lin_fn = jax.jit(lambda p, x: lin.apply(p, x))
    print(f"node linear fwd   : {timeit(lin_fn, lp, xn):8.2f} ms")

    gather = jax.jit(lambda x: x[edges.src] + x[edges.dst])
    print(f"edge gather       : {timeit(gather, xn):8.2f} ms")
    msg = gather(xn)
    scat = jax.jit(lambda m: segment_sum(m, edges.dst, node_cap, mask=edges.mask))
    print(f"edge scatter-sum  : {timeit(scat, msg):8.2f} ms")
    alpha = jax.random.normal(key, (E, 4))
    smax = jax.jit(lambda a: segment_softmax(a, edges.dst, node_cap, mask=edges.mask))
    print(f"segment softmax   : {timeit(smax, alpha):8.2f} ms")

    _model_section(args, b, bs, slots, edge_cap)


def _model_section(args, b, bs, slots, edge_cap):
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train import (
        TrainState, cosine_warmup_schedule, create_optimizer, make_qm9_steps,
    )

    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=128, max_edges=edge_cap, remat=args.remat,
        nodes_per_graph=slots,
        compute_dtype="bfloat16" if args.bf16 else None,
    )
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
    print(f"model forward     : {timeit(fwd, params, b):8.2f} ms")

    def loss(p, b):
        out = model.apply(p, b, deterministic=True)
        return jnp.sum(jnp.where(b.graph_mask, out, 0.0))

    grad = jax.jit(jax.grad(loss))
    print(f"model fwd+grad    : {timeit(grad, params, b):8.2f} ms")

    opt = create_optimizer(cosine_warmup_schedule(5e-4, 100, 10000))
    ts, _ = make_qm9_steps(model, opt)
    state = TrainState.create(params, opt)
    rng = jax.random.PRNGKey(2)
    sfn = jax.jit(lambda state: ts(state, b, rng))
    print(f"train step        : {timeit(sfn, state):8.2f} ms")


if __name__ == "__main__":
    main()
