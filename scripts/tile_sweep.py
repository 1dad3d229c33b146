"""Fused DTP+linear kernel tile-size sweep (run on the TPU chip).

The kernel grid is E/tile; larger tiles amortize per-step scratch zeroing,
align copies of shared metadata, and pipeline bubbles at the cost of more
VMEM per step.  Production config: two heads (gate input + alpha scalars),
needs_dsh=False (QM9/OC20 first-order path).

Run: PYTHONPATH=/root/repo python scripts/tile_sweep.py [--fp32]
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
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--edges", type=int, default=46848)
    ap.add_argument("--tiles", type=int, nargs="+", default=[64, 128, 256, 512])
    ap.add_argument("--shared", action="store_true",
                    help="shared-weight (folded) kernel variant")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    from equiformer_tpu.core import Irreps, depthwise_tp
    from equiformer_tpu.kernels.dtp_lin_pallas import DTPLinPlan, make_fused_dtp_lin
    from equiformer_tpu.nn.activation import irreps2gate

    E = ((args.edges + 511) // 512) * 512
    irr = Irreps("128x0e+64x1e+32x2e")
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    tp = depthwise_tp(irr, sh_irr, irr)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, irr.dim), dtype)
    sh = jax.random.normal(key, (E, sh_irr.dim), dtype)
    w = jax.random.normal(key, (E, tp.weight_numel), dtype)

    scal, gates, gated = irreps2gate(irr)
    lin_out = (scal + gates + gated).simplify()
    print(f"edges={E} dtype={dtype.__name__}")
    if args.shared:
        w = w[:1]
    for T in args.tiles:
        plan = DTPLinPlan(
            tp, [lin_out] if args.shared else [lin_out, Irreps("32x0e")],
            needs_dsh=False, tile=T, shared_weights=args.shared,
        )
        fused = make_fused_dtp_lin(plan, tile=T)
        Ws = [
            jax.random.normal(key, (g.fan_pad, g.cols), dtype)
            for g in plan.groups
        ]
        try:
            ffwd = jax.jit(lambda x, s, w: fused(x, s, w, Ws))
            tf = timeit(ffwd, x, sh, w, n=args.reps)
            fgrad = jax.jit(
                jax.grad(
                    lambda x, s, w: jnp.sum(
                        fused(x, s, w, Ws).astype(jnp.float32) ** 2
                    ),
                    argnums=(0, 2),
                )
            )
            tb = timeit(fgrad, x, sh, w, n=args.reps)
            print(f"tile {T:4d}: fwd {tf:6.2f} ms   f+b {tb:6.2f} ms")
        except Exception as e:  # VMEM OOM etc.
            print(f"tile {T:4d}: FAILED ({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
