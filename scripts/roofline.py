"""Analytic roofline for the fused DTP+linear kernels: per-edge VPU elemwise
work (the lane-packed FMA phase), MXU FLOPs (the z@W dots), and HBM bytes per
bind, multiplied by the per-step bind census of the real train steps.

Purpose (VERDICT r3 item 2): decide whether single-digit *MXU* MFU is
headroom or the op's speed of light — the CG-sparse contraction phase is VPU
work, so MXU-peak MFU undercounts what the chip is actually doing.

Trace-only; runs on CPU.  Pair with on-chip microbenches (scripts/kbench.py)
for measured VPU/HBM rates.

Run: PYTHONPATH=.:scripts python scripts/roofline.py [--task qm9|md17]
"""

import argparse
import collections

import jax

LANE = 128


def plan_costs(plan):
    """Per-edge cost components of one fused-kernel bind of this plan."""
    # FMA phase: per term, the packed operand is [T/p, lanes]; per edge that
    # is lanes/p elements (p>1 packs p edge row-groups side by side)
    fma_elems = 0
    for t, _ in plan._terms:
        xs, mul, p = plan.x_slots[t.a_off]
        lanes = LANE if p == 1 else p * mul
        fma_elems += lanes // p
    # z@W MXU dots: z [dim*T, fan_pad] x W [fan_pad, cols] per group
    mxu = sum(2 * g.ir.dim * g.fan_pad * g.cols for g in plan.groups)
    d_w = plan.rad_hp if plan.radial_fold is not None else plan.d_w
    return {
        "fma_elems": fma_elems,          # per-edge elements touched per pass
        "mxu_flops": mxu,                # per-edge MXU flops of one dot phase
        "bytes_ops": 2 * (plan.d_x + plan.d_sh + d_w + plan.d_out),  # bf16
        "align_elems": plan.d_x_al + plan.d_w_al,
        "z_width": sum(g.ir.dim * g.fan_pad for g in plan.groups),
    }


# ops-per-element factors of the FMA phase per bind type (mults+adds per term
# touched element, from the kernel bodies)
BIND_FMA_OPS = {
    "out": 3,        # coeff*cp, *wv, += into z
    "leg[out]": 3,
    "leg[x]": 4,     # cdz (2) + *wv + acc
    "leg[sh]": 4,
    "leg[w]": 4,
    "leg[W]": 3,     # z rebuild
    "legW": 3,
    "bwd3": 10,      # cdz + dx/dw/dsh accumulators
    "fwd": 3,
    "bwd_fused": 8,  # first-order save-z backward (dx/dw + dW path)
}
# how many MXU dot phases the bind runs (dz and/or zW)
BIND_MXU = {"out": 1, "leg[out]": 1, "leg[x]": 1, "leg[sh]": 1, "leg[w]": 1,
            "leg[W]": 2, "legW": 2, "bwd3": 1, "fwd": 1, "bwd_fused": 2}


def census_by_plan(jaxpr):
    from equiformer_tpu.kernels import dtp_lin_ho as ho

    counter = collections.Counter()
    seen = set()

    def walk(obj):
        if id(obj) in seen:
            return
        seen.add(id(obj))
        if hasattr(obj, "eqns"):
            for eqn in obj.eqns:
                name = str(eqn.primitive)
                if name.startswith("equiformer_dtplin"):
                    pid = eqn.params.get("plan_id")
                    key = name.replace("equiformer_dtplin_", "")
                    if key == "leg":
                        key += f"[{eqn.params['out_leg']}]"
                    E = eqn.invars[1].aval.shape[0]
                    counter[(key, pid, E)] += 1
                for v in eqn.params.values():
                    walk(v)
        elif hasattr(obj, "jaxpr"):
            walk(obj.jaxpr)
        elif isinstance(obj, (list, tuple)):
            for x in obj:
                walk(x)
        elif isinstance(obj, dict):
            for x in obj.values():
                walk(x)

    walk(jaxpr)
    return counter, {pid: ho._PLANS[pid][0] for (_, pid, _) in counter}


def report(counter, plans, label):
    tot = collections.Counter()
    rows = collections.Counter()
    for (kind, pid, E), n in counter.items():
        c = plan_costs(plans[pid])
        base = kind.replace("leg[out]", "out") if kind == "leg[out]" else kind
        fma = n * E * c["fma_elems"] * BIND_FMA_OPS.get(kind, 4)
        mxu = n * E * c["mxu_flops"] * BIND_MXU.get(kind, 1)
        byt = n * E * c["bytes_ops"]
        tot["vpu_flops"] += fma
        tot["mxu_flops"] += mxu
        tot["hbm_bytes"] += byt
        rows[kind] += n
    print(f"== {label}")
    print("  binds:", dict(sorted(rows.items(), key=lambda kv: -kv[1])))
    print(f"  VPU elemwise flops : {tot['vpu_flops']/1e9:8.2f} G")
    print(f"  MXU flops          : {tot['mxu_flops']/1e9:8.2f} G")
    print(f"  HBM operand bytes  : {tot['hbm_bytes']/1e9:8.3f} GB")
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="md17", choices=["md17", "qm9"])
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")
    import os

    os.environ.setdefault("EQUIFORMER_TPU_PALLAS", "1")
    import jax.numpy as jnp

    if args.task == "md17":
        bs = args.batch or 8
        from equiformer_tpu.models.md17_models import energy_and_forces
        from profile_md17 import build

        model, params, batch = build(bs, True, False)

        def ef_loss(p, b):
            e, f = energy_and_forces(model, p, b)
            return jnp.sum(jnp.abs(e)) + 80.0 * jnp.sum(jnp.abs(f))

        for label, fn in (
            ("md17 fwd", lambda p, b: model.apply(p, b, deterministic=True)),
            ("md17 e+f-grad (per step)", jax.grad(ef_loss)),
        ):
            jaxpr = jax.make_jaxpr(fn)(params, batch)
            counter, plans = census_by_plan(jaxpr.jaxpr)
            tot = report(counter, plans, label)
        bs_label, step_tot = bs, tot
    else:
        # QM9 rides the first-order custom_vjp kernels (no leg primitives in
        # the jaxpr): capture the DTPLinPlan instances built at model init
        # and cost the known per-step structure — every fused op runs ONE
        # fwd (save_z) + ONE fused backward kernel per train step.
        bs = args.batch or 128
        import argparse as _ap

        import equiformer_tpu.kernels.dtp_lin_pallas as fo
        from bench import build_qm9

        plans = []
        orig = fo.DTPLinPlan.__init__

        def patched(self, *a, **k):
            orig(self, *a, **k)
            plans.append(self)

        fo.DTPLinPlan.__init__ = patched
        try:
            # plans are batch-independent: init at batch 8 (fast on 1 CPU
            # core), cost at the requested batch's tight edge capacity
            ns = _ap.Namespace(loose_edges=0, smoke=False, fp32=False, remat=False)
            train_step, state, batches = build_qm9(ns, 8)
        finally:
            fo.DTPLinPlan.__init__ = orig
        # edges are built inside the model at the tight per-batch capacity
        from bench import tight_edge_cap
        from equiformer_tpu.data import qm9_like_dataset

        E = tight_edge_cap(qm9_like_dataset(bs * 4, seed=0), bs, 5.0)
        tot = collections.Counter()
        for p in plans:
            c = plan_costs(p)
            fma = E * c["fma_elems"] * (BIND_FMA_OPS["fwd"] + BIND_FMA_OPS["bwd_fused"])
            mxu = E * c["mxu_flops"] * (BIND_MXU["fwd"] + BIND_MXU["bwd_fused"])
            byt = E * (2 * c["bytes_ops"] + 2 * 2 * c["z_width"])  # +save-z rt
            tot["vpu_flops"] += fma
            tot["mxu_flops"] += mxu
            tot["hbm_bytes"] += byt
        print(f"== qm9 train step ({len(plans)} fused plans, E={E}, "
              f"1 fwd + 1 fused bwd each)")
        print(f"  VPU elemwise flops : {tot['vpu_flops']/1e9:8.2f} G")
        print(f"  MXU flops          : {tot['mxu_flops']/1e9:8.2f} G")
        print(f"  HBM operand bytes  : {tot['hbm_bytes']/1e9:8.3f} GB")
        bs_label, step_tot = bs, tot

    print(f"\nper-graph (batch {bs_label}): "
          f"VPU {step_tot['vpu_flops']/1e9/bs_label:.2f} G, "
          f"MXU {step_tot['mxu_flops']/1e9/bs_label:.2f} G, "
          f"HBM {step_tot['hbm_bytes']/1e6/bs_label:.1f} MB")


if __name__ == "__main__":
    main()
