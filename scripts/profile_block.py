"""bf16 per-op profile of the flagship train step's components on the chip.

Run: PYTHONPATH=. python scripts/profile_block.py [--fp32]
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
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    from equiformer_tpu.core import Irreps, depthwise_tp, spherical_harmonics
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.graph import segment_softmax, segment_sum
    from equiformer_tpu.graph.radius_graph import radius_graph_dense
    from equiformer_tpu.kernels.dtp_lin_pallas import DTPLinPlan, make_fused_dtp_lin
    from equiformer_tpu.nn import IrrepsLinear, RadialProfile
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train import (
        TrainState, cosine_warmup_schedule, create_optimizer, make_qm9_steps,
    )

    bs = args.batch
    slots = 30
    node_cap = bs * slots
    E = ((int(bs * 18 * 15.6 * 1.3) + 127) // 128) * 128
    print(f"batch={bs} nodes={node_cap} edges={E} dtype={dtype.__name__}")

    data = qm9_like_dataset(bs, seed=0)
    b = next(iter(GraphLoader(data, bs, shuffle=False, dense_slots=slots)))
    b = jax.tree_util.tree_map(jnp.asarray, b)

    rg = jax.jit(lambda pos: radius_graph_dense(pos, b.node_mask, bs, 5.0, E))
    print(f"graph build      : {timeit(rg, b.pos):7.2f} ms")
    edges = rg(b.pos)

    irr = Irreps("128x0e+64x1e+32x2e")
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    tp = depthwise_tp(irr, sh_irr, irr)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, irr.dim), dtype)
    sh = jax.random.normal(key, (E, sh_irr.dim), dtype)
    w = jax.random.normal(key, (E, tp.weight_numel), dtype)

    # fused DTP+lin (two heads like sep_act)
    from equiformer_tpu.nn.activation import irreps2gate
    scal, gates, gated = irreps2gate(irr)
    lin_out = (scal + gates + gated).simplify()
    plan2 = DTPLinPlan(tp, [lin_out, Irreps("32x0e")])
    fused2 = make_fused_dtp_lin(plan2)
    Ws2 = [jax.random.normal(key, (g.fan_pad, g.cols), dtype) for g in plan2.groups]
    ffwd = jax.jit(lambda x, s, w: fused2(x, s, w, Ws2))
    print(f"fusedDTPlin fwd  : {timeit(ffwd, x, sh, w):7.2f} ms")
    fgrad = jax.jit(jax.grad(lambda x, s, w: jnp.sum(
        fused2(x, s, w, Ws2).astype(jnp.float32) ** 2), argnums=(0, 2)))
    print(f"fusedDTPlin f+b  : {timeit(fgrad, x, sh, w):7.2f} ms")

    rad = RadialProfile(features=(64, 64, tp.weight_numel))
    rbfv = jax.random.normal(key, (E, 128), dtype)
    rp = rad.init(key, rbfv)
    print(f"radial fwd       : {timeit(jax.jit(lambda p, r: rad.apply(p, r)), rp, rbfv):7.2f} ms")
    rgrd = jax.jit(jax.grad(lambda p, r: jnp.sum(rad.apply(p, r).astype(jnp.float32) ** 2)))
    print(f"radial f+b       : {timeit(rgrd, rp, rbfv):7.2f} ms")

    xn = jax.random.normal(key, (node_cap, irr.dim), dtype)
    lin = IrrepsLinear(irr, irr)
    lp = lin.init(key, xn)
    print(f"node linear fwd  : {timeit(jax.jit(lambda p, x: lin.apply(p, x)), lp, xn):7.2f} ms")

    # per-block glue: norms, gate, head reshapes, FFN
    from equiformer_tpu.nn import EquivariantLayerNorm
    from equiformer_tpu.nn.activation import Gate, irreps2gate
    from equiformer_tpu.nn.attention_utils import heads2vec, vec2heads

    norm = EquivariantLayerNorm(irr)
    npar = norm.init(key, xn)
    nf = jax.jit(lambda p, x: norm.apply(p, x))
    print(f"eq layernorm fwd : {timeit(nf, npar, xn):7.2f} ms")
    ng = jax.jit(jax.grad(lambda p, x: jnp.sum(norm.apply(p, x).astype(jnp.float32) ** 2), argnums=(0, 1)))
    print(f"eq layernorm f+b : {timeit(ng, npar, xn):7.2f} ms")

    scal, gates, gated = irreps2gate(irr)
    gate = Gate(scal, gates, gated)
    xe = jax.random.normal(key, (E, gate.irreps_in.dim), dtype)
    print(f"gate fwd         : {timeit(jax.jit(gate), xe):7.2f} ms")
    gg = jax.jit(jax.grad(lambda x: jnp.sum(gate(x).astype(jnp.float32) ** 2)))
    print(f"gate f+b         : {timeit(gg, xe):7.2f} ms")

    head = Irreps("32x0e+16x1e+8x2e")
    xh = jax.random.normal(key, (E, 4 * head.dim), dtype)
    v2h = jax.jit(lambda x: vec2heads(head, 4, x))
    print(f"vec2heads fwd    : {timeit(v2h, xh):7.2f} ms")
    h2v = jax.jit(jax.grad(lambda x: jnp.sum(heads2vec(head, vec2heads(head, 4, x)).astype(jnp.float32) ** 2)))
    print(f"v2h+h2v f+b      : {timeit(h2v, xh):7.2f} ms")

    from equiformer_tpu.models.equiformer import FeedForwardNetwork

    ffn = FeedForwardNetwork(irr, Irreps("1x0e"), irr,
                             irreps_mlp_mid=Irreps("384x0e+192x1e+96x2e"),
                             proj_drop=0.0)
    attr1 = jnp.ones((node_cap, 1), dtype)
    fp = ffn.init(key, xn, attr1)
    print(f"FFN fwd          : {timeit(jax.jit(lambda p, x: ffn.apply(p, x, attr1)), fp, xn):7.2f} ms")
    fg = jax.jit(jax.grad(lambda p, x: jnp.sum(ffn.apply(p, x, attr1).astype(jnp.float32) ** 2), argnums=(0, 1)))
    print(f"FFN f+b          : {timeit(fg, fp, xn):7.2f} ms")

    gather = jax.jit(lambda x: x[edges.src] + x[edges.dst])
    print(f"gather fwd       : {timeit(gather, xn):7.2f} ms")
    ggrad = jax.jit(jax.grad(lambda x: jnp.sum((x[edges.src] + x[edges.dst]).astype(jnp.float32) ** 2)))
    print(f"gather f+b       : {timeit(ggrad, xn):7.2f} ms")
    msg = gather(xn)
    scat = jax.jit(lambda m: segment_sum(m, edges.dst, node_cap, mask=edges.mask))
    print(f"scatter fwd      : {timeit(scat, msg):7.2f} ms")
    sgrad = jax.jit(jax.grad(lambda m: jnp.sum(
        segment_sum(m, edges.dst, node_cap, mask=edges.mask).astype(jnp.float32) ** 2)))
    print(f"scatter f+b      : {timeit(sgrad, msg):7.2f} ms")
    alpha = jax.random.normal(key, (E, 4), dtype)
    smax = jax.jit(lambda a: segment_softmax(a, edges.dst, node_cap, mask=edges.mask))
    print(f"softmax fwd      : {timeit(smax, alpha):7.2f} ms")
    smgrad = jax.jit(jax.grad(lambda a: jnp.sum(
        segment_softmax(a, edges.dst, node_cap, mask=edges.mask).astype(jnp.float32) ** 2)))
    print(f"softmax f+b      : {timeit(smgrad, alpha):7.2f} ms")

    # full model + step
    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=128, max_edges=E, nodes_per_graph=slots,
        compute_dtype=None if args.fp32 else "bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
    print(f"model fwd        : {timeit(fwd, params, b):7.2f} ms")

    def loss(p, b):
        out = model.apply(p, b, deterministic=True)
        return jnp.sum(jnp.where(b.graph_mask, out, 0.0))

    grad = jax.jit(jax.grad(loss))
    print(f"model fwd+grad   : {timeit(grad, params, b):7.2f} ms")

    opt = create_optimizer(cosine_warmup_schedule(5e-4, 100, 10000))
    ts, _ = make_qm9_steps(model, opt)
    state = TrainState.create(params, opt)
    rng = jax.random.PRNGKey(2)
    sfn = jax.jit(lambda state: ts(state, b, rng))
    print(f"train step       : {timeit(sfn, state):7.2f} ms")


if __name__ == "__main__":
    main()
