"""Attribute the fused DTP+linear *backward* kernel's time to its phases.

Builds stripped variants of the backward kernel (same inputs/outputs, later
phases elided) and times each on the chip:

  align      - _align_inputs only; outputs zero-filled
  +fma       - ... + recompute z via the FMA phase
  +gfill     - ... + copy g into the per-group [dim*T, cols] scratch
  +dW        - ... + the dW = z^T g MXU dot (grid-accumulated)
  +dz        - ... + the dz = g W^T MXU dot
  +trans     - ... + trilinear transposes and dx/dw unpack (= full kernel)

Run: PYTHONPATH=/root/repo python scripts/bwd_attr.py [--fp32] [--tile N]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--edges", type=int, default=46848)
    args = ap.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    T = args.tile

    from equiformer_tpu.core import Irreps, depthwise_tp
    from equiformer_tpu.kernels import dtp_lin_pallas as K
    from equiformer_tpu.kernels.dtp_lin_pallas import (
        DTPLinPlan,
        LANE,
        _align_inputs,
        _fma_z,
        _packed_col,
        _shared_spec,
    )
    from equiformer_tpu.nn.activation import irreps2gate

    E = ((args.edges + 4 * T - 1) // (4 * T)) * (4 * T)
    irr = Irreps("128x0e+64x1e+32x2e")
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    tp = depthwise_tp(irr, sh_irr, irr)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, irr.dim), dtype)
    sh = jax.random.normal(key, (E, sh_irr.dim), dtype)
    w = jax.random.normal(key, (E, tp.weight_numel), dtype)

    scal, gates, gated = irreps2gate(irr)
    lin_out = (scal + gates + gated).simplify()
    plan = DTPLinPlan(tp, [lin_out, Irreps("32x0e")], needs_dsh=False, tile=T)
    Ws = [jax.random.normal(key, (g.fan_pad, g.cols), dtype) for g in plan.groups]
    g_in = jax.random.normal(key, (E, plan.d_out), dtype)
    nG = len(plan.groups)

    def bwd_variant_kernel(stage, x_ref, sh_ref, w_ref, *rest):
        W_refs = rest[:nG]
        g_ref = rest[nG]
        dx_ref, dsh_ref, dw_ref = rest[nG + 1 : nG + 4]
        dW_refs = rest[nG + 4 : nG + 4 + nG]
        x_al, w_al = rest[nG + 4 + nG], rest[nG + 5 + nG]
        scr = rest[nG + 6 + nG :]
        z_scr = scr[:nG]
        dz_scr = scr[nG : 2 * nG]
        g_scr = scr[2 * nG : 3 * nG]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for zs in z_scr:
                zs[:] = jnp.zeros_like(zs)
            dsh_ref[:] = jnp.zeros_like(dsh_ref)

        _align_inputs(plan, x_ref, w_ref, x_al, w_al, T)
        cols = sh_ref[:]
        if stage >= 1:
            _fma_z(plan, cols, x_al, w_al, z_scr, T)
        if stage >= 2:
            for gi, g in enumerate(plan.groups):
                gm = g_scr[gi]
                for k in range(g.ir.dim):
                    gm[k * T : (k + 1) * T, :] = g_ref[
                        :, g.out_off + k * g.cols : g.out_off + (k + 1) * g.cols
                    ]
        if stage >= 3:
            for gi, g in enumerate(plan.groups):
                dW_c = jax.lax.dot_general(
                    z_scr[gi][:],
                    g_scr[gi][:],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(i == 0)
                def _():
                    dW_refs[gi][:] = dW_c

                @pl.when(i > 0)
                def _():
                    dW_refs[gi][:] += dW_c

        if stage >= 4:
            for gi, g in enumerate(plan.groups):
                dz_scr[gi][:] = jax.lax.dot_general(
                    g_scr[gi][:],
                    W_refs[gi][:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dz_scr[gi].dtype)
        if stage >= 5:
            dx_acc, dw_acc = {}, {}
            colcache, dzcache = {}, {}
            for t, (gi, k, fc) in plan._terms:
                xs, mul, p = plan.x_slots[t.a_off]
                ws, _, _ = plan.w_slots[t.b_off]
                r = T // p
                zkey = (gi, k, fc, p)
                if zkey not in dzcache:
                    if p == 1:
                        dzcache[zkey] = dz_scr[gi][k * T : (k + 1) * T, fc : fc + LANE]
                    else:
                        dzcache[zkey] = jnp.concatenate(
                            [
                                dz_scr[gi][
                                    k * T + g * r : k * T + (g + 1) * r, fc : fc + mul
                                ]
                                for g in range(p)
                            ],
                            axis=1,
                        )
                dz = dzcache[zkey]
                cp = _packed_col(plan, cols, colcache, t.col_off, p, mul, T)
                xv = x_al[:r, xs : xs + (LANE if p == 1 else p * mul)]
                wv = w_al[:r, ws : ws + (LANE if p == 1 else p * mul)]
                cdz = (t.coeff * cp) * dz
                dx_acc[xs] = dx_acc.get(xs, 0.0) + cdz * wv
                dw_acc[ws] = dw_acc.get(ws, 0.0) + cdz * xv
            dx_ref[:] = jnp.zeros_like(dx_ref)
            for off, (slot, mul, p) in plan.x_slots.items():
                if slot not in dx_acc:
                    continue
                acc = dx_acc[slot]
                if p == 1:
                    dx_ref[:, off : off + mul] = acc[:, :mul].astype(dx_ref.dtype)
                else:
                    r = T // p
                    for g in range(p):
                        dx_ref[g * r : (g + 1) * r, off : off + mul] = acc[
                            :, g * mul : (g + 1) * mul
                        ].astype(dx_ref.dtype)
            dw_ref[:] = jnp.zeros_like(dw_ref)
            for off, (slot, mul, p) in plan.w_slots.items():
                if slot not in dw_acc:
                    continue
                acc = dw_acc[slot]
                if p == 1:
                    dw_ref[:, off : off + mul] = acc[:, :mul].astype(dw_ref.dtype)
                else:
                    r = T // p
                    for g in range(p):
                        dw_ref[g * r : (g + 1) * r, off : off + mul] = acc[
                            :, g * mul : (g + 1) * mul
                        ].astype(dw_ref.dtype)
        else:
            dx_ref[:] = jnp.zeros_like(dx_ref)
            dw_ref[:] = jnp.zeros_like(dw_ref)

    def build(stage):
        def call(x, sh, w, g):
            return pl.pallas_call(
                functools.partial(bwd_variant_kernel, stage),
                out_shape=(
                    jax.ShapeDtypeStruct((E, plan.d_x), x.dtype),
                    jax.ShapeDtypeStruct((E, plan.d_sh), sh.dtype),
                    jax.ShapeDtypeStruct((E, plan.d_w), w.dtype),
                )
                + tuple(
                    jax.ShapeDtypeStruct((gr.fan_pad, gr.cols), jnp.float32)
                    for gr in plan.groups
                ),
                grid=(E // T,),
                in_specs=[
                    pl.BlockSpec((T, plan.d_x), lambda i: (i, 0)),
                    pl.BlockSpec((T, plan.d_sh), lambda i: (i, 0)),
                    pl.BlockSpec((T, plan.d_w), lambda i: (i, 0)),
                ]
                + [_shared_spec(W.shape) for W in Ws]
                + [pl.BlockSpec((T, plan.d_out), lambda i: (i, 0))],
                out_specs=(
                    pl.BlockSpec((T, plan.d_x), lambda i: (i, 0)),
                    _shared_spec((1, plan.d_sh)) if False else pl.BlockSpec((T, plan.d_sh), lambda i: (i, 0)),
                    pl.BlockSpec((T, plan.d_w), lambda i: (i, 0)),
                )
                + tuple(_shared_spec((gr.fan_pad, gr.cols)) for gr in plan.groups),
                scratch_shapes=[
                    pltpu.VMEM((T, plan.d_x_al), x.dtype),
                    pltpu.VMEM((T, plan.d_w_al), x.dtype),
                ]
                + [
                    pltpu.VMEM((gr.ir.dim * T, gr.fan_pad), x.dtype)
                    for gr in plan.groups
                ]
                + [
                    pltpu.VMEM((gr.ir.dim * T, gr.fan_pad), x.dtype)
                    for gr in plan.groups
                ]
                + [
                    pltpu.VMEM((gr.ir.dim * T, gr.cols), x.dtype)
                    for gr in plan.groups
                ],
                interpret=jax.default_backend() != "tpu",
            )(x, sh, w, *Ws, g)

        return jax.jit(call)

    names = ["align", "+fma", "+gfill", "+dW", "+dz", "+trans(full)"]
    print(f"edges={E} tile={T} dtype={dtype.__name__}")
    prev = 0.0
    for stage, name in enumerate(names):
        fn = build(stage)
        t = timeit(fn, x, sh, w, g_in)
        print(f"{name:13s}: {t:6.2f} ms  (delta {t - prev:+6.2f})")
        prev = t


if __name__ == "__main__":
    main()
