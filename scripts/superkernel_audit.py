"""Feasibility audit for the last architectural perf lever: merging each
TransBlock's TWO fused-DTP call sites (sep_act ext 2-head + gate +
sep_value shared) into ONE Pallas superkernel, so the gated message never
leaves VMEM and 6 per-call constants (~0.3 ms each) disappear.

The question is pure VMEM arithmetic: both plans' packed operands, z
scratches, and save-z output blocks must be resident in the SAME kernel
invocation.  This script rebuilds the QM9 flagship plans (same capture
trick as fan_audit.py), applies the exact auto_tile calibration
(dtp_lin_ho.auto_tile: est = tile x width x 4 bytes against the 9M
first-order budget, anchored on two observed on-chip OOMs), and reports
the merged estimate per tile.

Run: PYTHONPATH=.:scripts python scripts/superkernel_audit.py
"""

import jax


def width(p):
    """Per-edge VMEM width of a plan — the exact auto_tile accounting
    (kernels/dtp_lin_ho.py:1140-1150, radial_fold is None on these plans)."""
    zw = sum(g.ir.dim * (g.fan_pad + g.cols) for g in p.groups)
    return p.d_x_al + p.d_w_al + p.d_out + p.d_x + p.d_w + zw


def main():
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
        from bench import build_qm9

        ns = _ap.Namespace(loose_edges=0, smoke=False, fp32=False, remat=False)
        build_qm9(ns, 8)
    finally:
        fo.DTPLinPlan.__init__ = orig

    # the per-block pair: sep_act = external-weight 2-head plan (d_out ~704),
    # sep_value = shared-weight plan (d_out ~480).  Identify by weight mode +
    # output width; ignore the single edge_deg plan (external, 1-head).
    ext = [p for p in plans if not p.shared_weights]
    sh = [p for p in plans if p.shared_weights]
    act = max(ext, key=lambda p: p.d_out)  # the 2-head sep_act plan
    val = max(sh, key=lambda p: p.d_out)
    budget = 9 * 2**20
    print(f"captured {len(plans)} plans: {len(ext)} external, {len(sh)} shared")
    print(f"sep_act  (ext):    d_out={act.d_out:5d} width={width(act):6d}")
    print(f"sep_value(shared): d_out={val.d_out:5d} width={width(val):6d}")
    # merged kernel: both resident.  Lower bound subtracts the handoff (the
    # value plan's x input IS the act plan's output scratch) and the value
    # plan's aligned-x relayout of that same buffer; sh is shared but its
    # width sits inside d_x_al on both, so we leave one copy in (the gate
    # scratch and saved-gate-input for the merged backward offset it).
    upper = width(act) + width(val)
    lower = upper - val.d_x - val.d_x_al
    print(f"\nmerged width: {lower}..{upper} (lower bound credits the VMEM handoff)")
    for t in (256, 128, 64, 32):
        lo, hi = t * lower * 4, t * upper * 4
        verdict = (
            "fits" if hi <= budget else
            "marginal" if lo <= budget else "OOM"
        )
        print(f"tile {t:3d}: est {lo/2**20:6.2f}..{hi/2**20:6.2f} MiB vs 9 MiB budget -> {verdict}")
    # for scale: the two plans' own tiles today
    print(f"\ntoday: sep_act rides tile 128 ({128*width(act)*4/2**20:.2f} MiB), "
          f"sep_value tile 256 ({256*width(val)*4/2**20:.2f} MiB)")


if __name__ == "__main__":
    main()
