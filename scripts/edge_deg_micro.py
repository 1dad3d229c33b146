"""Investigate the edge_deg fused-plan forward anomaly (round-5 timeline):
the ext 1-head d480 plan (EdgeDegreeEmbedding) measured 2.21 ms fwd while
the LARGER ext 2-head d704 plan (sep_act) measured 1.01 ms at identical
x/sh/w shapes.  Sweeps tile and save_z for both plans and prints the chosen
auto-tile, per-variant times, and VMEM estimates.

Run: PYTHONPATH=.:scripts python scripts/edge_deg_micro.py [--n 30]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    x = jnp.zeros(())
    _sync(x + 1)
    t0 = time.perf_counter()
    for _ in range(3):
        _sync(x + 1)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - rtt) / n, 0.0) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--edges", type=int, default=36480)
    ap.add_argument("--tiles", type=str, default="64,128,256")
    ap.add_argument("--save-z", type=str, default="1,0")
    args = ap.parse_args()

    from equiformer_tpu.core import Irreps, depthwise_tp
    from equiformer_tpu.core.irreps import Irrep
    from equiformer_tpu.kernels.dtp_lin_ho import auto_tile
    from equiformer_tpu.kernels.dtp_lin_pallas import (
        DTPLinPlan, make_fused_dtp_lin,
    )

    def vmem_estimate(plan, tile):
        # auto_tile's estimator, inlined
        zw = sum(g.ir.dim * (g.fan_pad + g.cols) for g in plan.groups)
        width = (plan.d_x_al + plan.d_w_al + plan.d_out + plan.d_x
                 + plan.d_w + zw)
        return tile * width * 4
    from equiformer_tpu.nn.activation import irreps2gate

    E = args.edges
    dtype = jnp.bfloat16
    emb = Irreps("128x0e+64x1e+32x2e")
    sh = Irreps("1x0e+1x1e+1x2e")
    tp = depthwise_tp(emb, sh, emb)

    # sep_act's two heads: gate-structured lin output + the alpha scalars
    scalars, gates, gated = irreps2gate(emb)
    lin_out = (scalars + gates + gated).simplify()
    heads_2h = [lin_out, Irreps("128x0e")]
    heads_1h = [emb]  # edge_deg proj

    key = jax.random.PRNGKey(0)
    for label, heads in (("edge_deg[1h]", heads_1h), ("sep_act[2h]", heads_2h)):
        plan = DTPLinPlan(tp, heads, fold_rescale=True, shared_weights=False,
                          needs_dsh=False, tile=128)
        at = auto_tile(plan, 128, budget=9 * 2**20)
        print(f"\n== {label}: d_out={plan.d_out} auto_tile={at} "
              f"cols={[g.cols for g in plan.groups]}")
        for tile in [int(t) for t in args.tiles.split(",")]:
            for save_z in [s == "1" for s in args.save_z.split(",")]:
                try:
                    est = vmem_estimate(plan, tile)
                except Exception:
                    est = -1
                try:
                    fused = make_fused_dtp_lin(plan, tile=tile, save_z=save_z)
                    k1, k2, k3, k4 = jax.random.split(key, 4)
                    x = jax.random.normal(k1, (E, plan.d_x), dtype)
                    shv = jax.random.normal(k2, (E, plan.d_sh), dtype)
                    w = jax.random.normal(k3, (E, plan.d_w), dtype)
                    Ws = [0.05 * jax.random.normal(
                        jax.random.fold_in(k4, gi), (g.fan_pad, g.cols), dtype)
                        for gi, g in enumerate(plan.groups)]
                    nW = len(Ws)

                    def f(x, s, w, *W, _f=fused):
                        return _f(x, s, w, list(W))

                    jf = jax.jit(f)
                    t_f = timeit(jf, x, shv, w, *Ws, n=args.n)
                    jg = jax.jit(jax.grad(
                        lambda *a, _f=f: jnp.sum(_f(*a).astype(jnp.float32)),
                        argnums=tuple(range(3 + nW)),
                    ))
                    t_fb = timeit(jg, x, shv, w, *Ws, n=args.n)
                    print(f"  tile {tile:3d} save_z={int(save_z)}: "
                          f"fwd {t_f:7.3f}  fwd+grad {t_fb:7.3f}  "
                          f"(vmem est {est/2**20:.1f}M)")
                except Exception as exc:
                    print(f"  tile {tile:3d} save_z={int(save_z)}: "
                          f"FAILED {type(exc).__name__}: {str(exc)[:100]}")


if __name__ == "__main__":
    main()
