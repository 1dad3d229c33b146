"""Per-plan micro-attribution: kron-basis vs FMA fused DTP+linear on chip.

First on-chip A/B put the kron path at 1438.9 g/s vs 2327.8 for the FMA
path — this script finds where the time goes.  It captures the QM9
flagship's DTPLinPlan constructions at model init, dedups by shape
signature, and times, per distinct plan at the bench edge capacity:

  fma fwd / fwd+grad    - the shipped first-order custom-vjp kernels
  kron fwd / fwd+grad   - the kron-basis MXU cast (dtp_lin_kron.py)
  gbuild                - the XLA-side G build alone (kron's per-step
                          extra outside the kernel)

Totals are occurrence-weighted so they compare directly against the step
profile.  Run: PYTHONPATH=. python scripts/kron_micro.py [--fp32]
[--kron-tile N] [--n 30]
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
    ap.add_argument("--edges", type=int, default=0, help="0 = bench tight cap")
    ap.add_argument("--kron-tile", type=int, default=0)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from equiformer_tpu.kernels import dtp_lin_pallas as fo
    from equiformer_tpu.kernels.dtp_lin_ho import auto_tile
    from equiformer_tpu.kernels.dtp_lin_kron import (
        KronMeta,
        kron_auto_tile,
        make_fused_dtp_lin_kron,
    )
    from equiformer_tpu.kernels.dtp_lin_pallas import make_fused_dtp_lin

    recs = []
    orig = fo.DTPLinPlan.__init__

    def patched(self, tp, head_irreps, fold_rescale=True, shared_weights=False,
                needs_dsh=True, tile=128, radial_fold=None):
        orig(self, tp, head_irreps, fold_rescale, shared_weights, needs_dsh,
             tile, radial_fold)
        recs.append((tp, tuple(head_irreps), fold_rescale, shared_weights, tile))

    fo.DTPLinPlan.__init__ = patched
    import argparse as _ap

    from bench import build_qm9, tight_edge_cap
    from equiformer_tpu.data import qm9_like_dataset

    try:
        build_qm9(
            _ap.Namespace(loose_edges=0, smoke=False, fp32=False, remat=False),
            8,
        )
    finally:
        fo.DTPLinPlan.__init__ = orig

    E = args.edges or tight_edge_cap(qm9_like_dataset(512, seed=0), 128, 5.0)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    print(f"captured {len(recs)} plans, E={E}, dtype={dtype.__name__}")

    seen, order = {}, []
    for rec in recs:
        tp, heads, fr, shw, tile = rec
        s = (str(tp.irreps_in1), str(tp.irreps_in2), str(tp.irreps_out),
             tuple(str(h) for h in heads), fr, shw, tile)
        if s not in seen:
            seen[s] = [0, rec]
            order.append(s)
        seen[s][0] += 1

    key = jax.random.PRNGKey(0)
    tots = dict.fromkeys(
        ["fma_f", "fma_fb", "kron_f", "kron_fb", "gbuild"], 0.0
    )
    for s in order:
        cnt, (tp, heads, fr, shw, tile) = seen[s]
        plan = fo.DTPLinPlan(tp, heads, fr, shw, needs_dsh=False, tile=tile)
        fma_tile = auto_tile(plan, tile, budget=9 * 2**20)
        fma = make_fused_dtp_lin(plan, tile=fma_tile)
        meta = KronMeta(plan)
        ktile = args.kron_tile or kron_auto_tile(meta, tile)
        kron = make_fused_dtp_lin_kron(plan, tile=ktile)
        K_tot = sum(meta.g_rows)
        print(f"\nplan x={s[0]} -> out={s[2][:40]}.. heads={len(heads)} "
              f"shared={shw} n={cnt}")
        print(f"  tiles: fma {fma_tile}, kron {ktile}; K_tot={K_tot} "
              f"kop_lanes={meta.kop_lanes} d_out={plan.d_out}")

        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (E, plan.d_x), dtype)
        sh = jax.random.normal(k2, (E, plan.d_sh), dtype)
        w = (jax.random.normal(k3, (plan.d_w,), dtype) if shw
             else jax.random.normal(k3, (E, plan.d_w), dtype))
        Ws = [
            0.05 * jax.random.normal(
                jax.random.fold_in(k4, gi), (g.fan_pad, g.cols), dtype
            )
            for gi, g in enumerate(plan.groups)
        ]
        nW = len(Ws)

        def f_fma(x, sh, w, *Ws):
            return fma(x, sh, w, list(Ws))

        def f_kron(x, sh, w, *Ws):
            return kron(x, sh, w, list(Ws))

        argn = tuple(range(3 + nW))
        rows = {}
        for name, f in (("fma", f_fma), ("kron", f_kron)):
            jf = jax.jit(f)
            jg = jax.jit(jax.grad(
                lambda *a, _f=f: jnp.sum(_f(*a).astype(jnp.float32)),
                argnums=argn,
            ))
            t_f = timeit(jf, x, sh, w, *Ws, n=args.n)
            t_fb = timeit(jg, x, sh, w, *Ws, n=args.n)
            rows[name + "_f"] = t_f
            rows[name + "_fb"] = t_fb
            print(f"  {name:5s}: fwd {t_f:7.3f} ms   fwd+grad {t_fb:7.3f} ms")
        if shw:
            gb = jax.jit(lambda w, *Ws: meta.build_G(
                plan.scale_shared_weights(w.astype(dtype), list(Ws))
            ))
        else:
            gb = jax.jit(lambda w, *Ws: meta.build_G(
                [W.astype(dtype) for W in Ws]
            ))
        t_g = timeit(gb, w, *Ws, n=args.n)
        rows["gbuild"] = t_g
        print(f"  gbuild: {t_g:7.3f} ms (XLA, per fused call)")
        for k in tots:
            tots[k] += cnt * rows[k]

    print("\n== occurrence-weighted step totals (ms)")
    for k, v in tots.items():
        print(f"  {k:8s}: {v:8.2f}")


if __name__ == "__main__":
    main()
