"""Audit the fused-plan fan layouts: how much of each group's fan_pad (the
MXU K dim and the save-z width) is real vs padding, per QM9 flagship plan.

Run: PYTHONPATH=.:scripts python scripts/fan_audit.py [--task qm9|md17]
"""

import argparse
import collections

import jax

LANE = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="qm9", choices=["qm9", "md17"])
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")
    import os

    os.environ.setdefault("EQUIFORMER_TPU_PALLAS", "1")
    import argparse as _ap

    import equiformer_tpu.kernels.dtp_lin_pallas as fo

    plans = []
    orig = fo.DTPLinPlan.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        plans.append(self)

    fo.DTPLinPlan.__init__ = patched
    try:
        if args.task == "qm9":
            from bench import build_qm9

            ns = _ap.Namespace(loose_edges=0, smoke=False, fp32=False, remat=False)
            build_qm9(ns, 8)
        else:
            from profile_md17 import build

            build(8, True, False)
    finally:
        fo.DTPLinPlan.__init__ = orig

    seen = collections.Counter()
    tot_now = tot_real = tot_real128 = 0
    mxu_now = mxu_real = 0
    for p in plans:
        key = tuple(
            (str(g.ir), g.fan_pad, g.cols, tuple(p.tp.irreps_out[bo].mul for bo in g.blocks))
        for g in p.groups)
        seen[key] += 1
        if seen[key] > 1:
            # identical plan structure repeated: still counts toward totals
            pass
        zw_now = sum(g.ir.dim * g.fan_pad for g in p.groups)
        zw_real = sum(
            g.ir.dim * sum(p.tp.irreps_out[bo].mul for bo in g.blocks)
            for g in p.groups
        )
        zw_real128 = sum(
            g.ir.dim
            * (
                (sum(p.tp.irreps_out[bo].mul for bo in g.blocks) + LANE - 1)
                // LANE
                * LANE
            )
            for g in p.groups
        )
        tot_now += zw_now
        tot_real += zw_real
        tot_real128 += zw_real128
        mxu_now += sum(2 * g.ir.dim * g.fan_pad * g.cols for g in p.groups)
        mxu_real += sum(
            2
            * g.ir.dim
            * (
                (sum(p.tp.irreps_out[bo].mul for bo in g.blocks) + LANE - 1)
                // LANE
                * LANE
            )
            * g.cols
            for g in p.groups
        )
        if seen[key] == 1:
            print(f"plan d_out={p.d_out} shared={p.fold_shared} "
                  f"zw_now={zw_now} zw_real={zw_real} zw_real128={zw_real128}")
            for g in p.groups:
                muls = [p.tp.irreps_out[bo].mul for bo in g.blocks]
                packs = []
                for bo in g.blocks:
                    m = p.tp.irreps_out[bo].mul
                    # reconstruct _fan_width decomposition
                    full, tail = divmod(m, LANE)
                    packs.append((m,))
                print(
                    f"  ir={g.ir} blocks_mul={muls} fan_slots="
                    f"{[g.fan_slot[bo] for bo in g.blocks]} fan_pad={g.fan_pad} "
                    f"real={sum(muls)} cols={g.cols}"
                )
    print(f"\n{len(plans)} plans; z width now {tot_now}, real {tot_real} "
          f"({100*tot_real/tot_now:.0f}%), real-group-128pad {tot_real128} "
          f"({100*tot_real128/tot_now:.0f}%)")
    print(f"MXU per-edge flops now {mxu_now}, at group-128pad {mxu_real} "
          f"({100*mxu_real/mxu_now:.0f}%)")


if __name__ == "__main__":
    main()
