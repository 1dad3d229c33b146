"""On-chip validation of the VPU roofline (VERDICT r4 item 2).

PERF_ANALYSIS.md's strategic claims (MD17 >=90% VPU-bound, QM9 ~4300 g/s
plateau) rest on ops-per-element factors read off the kernel bodies (fwd 3,
bwd_fused 8), never validated on chip.  This script makes them falsifiable:

1. **Term-count sweep.**  A family of shared-weight (folded) fused plans on
   the flagship x irreps whose SH degree grows 0e -> 0e+1e -> 0e+1e+2e ->
   +3e.  Folded+no-save-z kernels read ONLY (x, sh) and write out: across
   the sweep the HBM traffic is near-constant while the analytic FMA-phase
   element count grows ~5x.  If the kernel is VPU-bound, the time increments
   between consecutive plans must equal d(VPU flops) / measured VPU rate
   (~2.0 TF/s, scripts/chip_peaks.py).  The implied rate from each increment
   is the validation: within ~25% of 2.0 TF/s confirms the factor*rate
   model; a flat slope would refute it.

2. **Edge-count linearity.**  The full plan at E/2 and E: a VPU-bound
   kernel is linear in E with a small intercept (launch + grid overhead).

3. **Absolute check at the flagship point.**  Predicted fwd / fwd+grad time
   from (VPU/2.0TF, HBM/751GB, MXU/200TF) floors vs measured, for both the
   shipped save-z config and the recompute (save_z=False) variant.

Run: PYTHONPATH=.:scripts python scripts/vpu_validate.py [--n 30]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

R_VPU = 2.0e12   # measured: scripts/chip_peaks.py, VPU fma bf16
R_HBM = 751e9    # measured: HBM stream r+w
R_MXU = 200.6e12  # measured: bf16 8192^3 matmul


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


# ops per FMA-phase element for the SHARED-FOLDED kernel family this sweep
# uses, read off the kernel branches (dtp_lin_pallas.py _fma_z w_al=None and
# _bwd_body fold_shared branch): forward = coeff*cp mult + x mult + acc = 3;
# recompute backward = z rebuild (3) + cdz/dx-acc transpose (3) = 6;
# save-z backward = transpose only = 3.  (The general external-weight
# factors in PERF_ANALYSIS.md are fwd 3 / bwd_fused 8.)
FWD_OPS = 3
BWD_OPS = 3       # save-z folded backward
BWD_REC_OPS = 6   # recompute folded backward


def plan_point(plan, E, save_z):
    """Analytic per-call resource totals (mirrors roofline.plan_costs)."""
    from roofline import plan_costs

    c = plan_costs(plan)
    zbytes = 2 * 2 * c["z_width"] * E if save_z else 0  # bf16 write+read
    return {
        "vpu_fwd": E * c["fma_elems"] * FWD_OPS,
        "vpu_bwd": E * c["fma_elems"] * (BWD_OPS if save_z else BWD_REC_OPS),
        "mxu": E * c["mxu_flops"],  # one dot phase; bwd runs two
        "hbm_fwd": E * 2 * (plan.d_x + plan.d_sh + plan.d_out) + zbytes // 2,
        "hbm_bwd": E * 2 * (plan.d_x + plan.d_sh + 2 * plan.d_out)
        + zbytes // 2,
        "fma_elems": c["fma_elems"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--edges", type=int, default=36480)
    args = ap.parse_args()

    from equiformer_tpu.core import Irreps, depthwise_tp
    from equiformer_tpu.kernels.dtp_lin_ho import auto_tile
    from equiformer_tpu.kernels.dtp_lin_pallas import (
        DTPLinPlan, make_fused_dtp_lin,
    )

    E = args.edges
    dtype = jnp.bfloat16
    x_irr = Irreps("128x0e+64x1e+32x2e")
    head = [x_irr]  # sep_value-like single head
    sh_family = ["1x0e", "1x0e+1x1e", "1x0e+1x1e+1x2e", "1x0e+1x1e+1x2e+1x3e"]

    key = jax.random.PRNGKey(0)
    print(f"E={E}, x={x_irr}, shared-folded, save_z=False  (n={args.n})")
    print(f"{'sh':26s} {'elems':>6s} {'VPUf G':>7s} {'pred f':>7s} "
          f"{'meas f':>7s} {'VPUb G':>7s} {'pred fb':>8s} {'meas fb':>8s}")

    rows = []
    for sh_s in sh_family:
        sh_irr = Irreps(sh_s)
        tp = depthwise_tp(x_irr, sh_irr, x_irr)
        plan = DTPLinPlan(tp, head, fold_rescale=False, shared_weights=True,
                          needs_dsh=False, tile=256)
        tile = auto_tile(plan, 256, budget=9 * 2**20)
        fused = make_fused_dtp_lin(plan, tile=tile, save_z=False)
        pt = plan_point(plan, E, save_z=False)

        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (E, plan.d_x), dtype)
        shv = jax.random.normal(k2, (E, plan.d_sh), dtype)
        w = jax.random.normal(k3, (plan.d_w,), dtype)
        Ws = [0.05 * jax.random.normal(jax.random.fold_in(k4, gi),
                                       (g.fan_pad, g.cols), dtype)
              for gi, g in enumerate(plan.groups)]
        nW = len(Ws)

        def f(x, s, w, *W, _fused=fused):
            return _fused(x, s, w, list(W))

        jf = jax.jit(f)
        jg = jax.jit(jax.grad(
            lambda *a, _f=f: jnp.sum(_f(*a).astype(jnp.float32)),
            argnums=tuple(range(3 + nW)),
        ))
        t_f = timeit(jf, x, shv, w, *Ws, n=args.n)
        t_fb = timeit(jg, x, shv, w, *Ws, n=args.n)

        pred_f = max(pt["vpu_fwd"] / R_VPU, pt["hbm_fwd"] / R_HBM,
                     pt["mxu"] / R_MXU) * 1e3
        pred_fb = pred_f + max(pt["vpu_bwd"] / R_VPU, pt["hbm_bwd"] / R_HBM,
                               2 * pt["mxu"] / R_MXU) * 1e3
        print(f"{sh_s:26s} {pt['fma_elems']:6d} {pt['vpu_fwd']/1e9:7.2f} "
              f"{pred_f:7.3f} {t_f:7.3f} {pt['vpu_bwd']/1e9:7.2f} "
              f"{pred_fb:8.3f} {t_fb:8.3f}")
        rows.append((sh_s, pt, t_f, t_fb))

    print("\n== implied VPU rate from consecutive increments "
          "(time deltas are ~pure FMA-phase growth; HBM/out constant)")
    for (s0, p0, f0, fb0), (s1, p1, f1, fb1) in zip(rows, rows[1:]):
        dv_f = p1["vpu_fwd"] - p0["vpu_fwd"]
        dv_b = (p1["vpu_fwd"] + p1["vpu_bwd"]) - (p0["vpu_fwd"] + p0["vpu_bwd"])
        r_f = dv_f / ((f1 - f0) / 1e3) / 1e12 if f1 > f0 else float("nan")
        r_fb = dv_b / ((fb1 - fb0) / 1e3) / 1e12 if fb1 > fb0 else float("nan")
        print(f"  {s0} -> {s1}: fwd {r_f:5.2f} TF/s   fwd+grad {r_fb:5.2f} "
              f"TF/s   (chip VPU peak ~2.0)")

    # E-linearity on the full flagship plan
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    tp = depthwise_tp(x_irr, sh_irr, x_irr)
    plan = DTPLinPlan(tp, head, fold_rescale=False, shared_weights=True,
                      needs_dsh=False, tile=256)
    tile = auto_tile(plan, 256, budget=9 * 2**20)
    fused = make_fused_dtp_lin(plan, tile=tile, save_z=False)
    print("\n== edge linearity (full plan, fwd)")
    ts = {}
    for Ei in (E // 2, E):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (Ei, plan.d_x), dtype)
        shv = jax.random.normal(k2, (Ei, plan.d_sh), dtype)
        w = jax.random.normal(k3, (plan.d_w,), dtype)
        Ws = [0.05 * jax.random.normal(jax.random.fold_in(k4, gi),
                                       (g.fan_pad, g.cols), dtype)
              for gi, g in enumerate(plan.groups)]
        jf = jax.jit(lambda x, s, w, *W, _f=fused: _f(x, s, w, list(W)))
        ts[Ei] = timeit(jf, x, shv, w, *Ws, n=args.n)
        print(f"  E={Ei:6d}: {ts[Ei]:7.3f} ms")
    slope = (ts[E] - ts[E // 2]) / (E / 2)
    intercept = ts[E] - slope * E
    print(f"  per-edge slope {slope*1e6:.1f} ns, intercept {intercept:.3f} ms"
          f" ({100*intercept/ts[E]:.0f}% of the full-E call)")

    # shipped save-z config, absolute floors vs measured
    print("\n== flagship point, shipped save-z config")
    fused_sz = make_fused_dtp_lin(plan, tile=tile, save_z=True)
    pt = plan_point(plan, E, save_z=True)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (E, plan.d_x), dtype)
    shv = jax.random.normal(k2, (E, plan.d_sh), dtype)
    w = jax.random.normal(k3, (plan.d_w,), dtype)
    Ws = [0.05 * jax.random.normal(jax.random.fold_in(k4, gi),
                                   (g.fan_pad, g.cols), dtype)
          for gi, g in enumerate(plan.groups)]
    nW = len(Ws)

    def fz(x, s, w, *W):
        return fused_sz(x, s, w, list(W))

    jf = jax.jit(fz)
    jg = jax.jit(jax.grad(
        lambda *a: jnp.sum(fz(*a).astype(jnp.float32)),
        argnums=tuple(range(3 + nW)),
    ))
    t_f = timeit(jf, x, shv, w, *Ws, n=args.n)
    t_fb = timeit(jg, x, shv, w, *Ws, n=args.n)
    pred_f = max(pt["vpu_fwd"] / R_VPU, pt["hbm_fwd"] / R_HBM,
                 pt["mxu"] / R_MXU) * 1e3
    pred_fb = pred_f + max(pt["vpu_bwd"] / R_VPU, pt["hbm_bwd"] / R_HBM,
                           2 * pt["mxu"] / R_MXU) * 1e3
    print(f"  fwd: pred {pred_f:.3f} / meas {t_f:.3f} ms    "
          f"fwd+grad: pred {pred_fb:.3f} / meas {t_fb:.3f} ms")


if __name__ == "__main__":
    main()
