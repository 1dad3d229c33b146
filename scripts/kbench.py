"""DTP kernel variant microbenchmark (run on the TPU chip).

Measures the forward T kernel at flagship shapes against design variants to
attribute the gap to speed-of-light:

  current   - PallasDTP as shipped (unaligned lane slices per FMA term)
  dmafloor  - kernel that only moves the same bytes (no compute): DMA bound
  aligned   - align-copy x/w into 128-lane-padded VMEM scratch once per tile,
              FMAs on aligned slices, unaligned out writes
  aligned+z - FMAs write a 128-aligned z scratch; out written via align copies
  fusedlin  - aligned z scratch + per-irrep-group MXU matmul epilogue writing
              the *linear* output (the fused DTP+lin forward prototype)

Run: PYTHONPATH=. python scripts/kbench.py [--fp32] [--tile 128]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from equiformer_tpu.core import Irreps, depthwise_tp
from equiformer_tpu.kernels.dtp_pallas import PallasDTP, Term, _group, _plan_terms


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


def _ceil128(n):
    return ((n + 127) // 128) * 128


def make_layouts(tp):
    """128-aligned per-component layouts for x, w, z."""
    # x: one 128-lane slot per (block, component)
    x_slots = {}  # flat offset -> slot index
    acc = 0
    for bi, (mul, ir) in enumerate(tp.irreps_in1):
        start = tp.irreps_in1.slices()[bi].start
        for c in range(ir.dim):
            x_slots[start + c * mul] = (acc, mul)
            acc += 128
    d_x_al = acc
    w_slots = {}
    acc = 0
    for ii, ins in enumerate(tp.instructions):
        mul = tp.irreps_in1[ins.i_in1].mul
        w_slots[tp._offsets[ii]] = (acc, mul)
        acc += 128
    d_w_al = acc
    z_slots = {}
    acc = 0
    for bo, (mul, ir) in enumerate(tp.irreps_out):
        start = tp.irreps_out.slices()[bo].start
        for c in range(ir.dim):
            z_slots[start + c * mul] = (acc, mul)
            acc += 128
    d_z_al = acc
    return x_slots, d_x_al, w_slots, d_w_al, z_slots, d_z_al


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--edges", type=int, default=40960)
    ap.add_argument("--interpret", action="store_true", help="CPU validation run")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    INTERP = args.interpret
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    T = args.tile
    E = args.edges

    irr = Irreps("128x0e+64x1e+32x2e")
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    tp = depthwise_tp(irr, sh_irr, irr)
    terms = _plan_terms(tp, fold_rescale=True)
    d_x, d_sh, d_w, d_z = irr.dim, sh_irr.dim, tp.weight_numel, tp.irreps_out.dim
    print(f"dims: x={d_x} sh={d_sh} w={d_w} z={d_z} terms={len(terms)} "
          f"E={E} tile={T} dtype={dtype.__name__}")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (E, d_x), dtype)
    sh = jax.random.normal(key, (E, d_sh), dtype)
    w = jax.random.normal(key, (E, d_w), dtype)

    # ---- current kernel
    pk = PallasDTP(tp, tile=T, interpret=INTERP or None)
    cur = jax.jit(lambda x, s, w: pk(x, s, w))
    t_cur = timeit(cur, x, sh, w)
    bytes_moved = E * (d_x + d_sh + d_w + d_z) * x.dtype.itemsize
    print(f"current     : {t_cur:7.2f} ms   ({bytes_moved/1e6:.0f} MB moved, "
          f"{bytes_moved/t_cur/1e6:.0f} GB/s)")

    # ---- DMA floor: same blockspecs, trivial compute
    def dma_kernel(x_ref, sh_ref, w_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:, 0:128] = x_ref[:, 0:128] + sh_ref[:, 0:1] + w_ref[:, 0:128]

    def dma_call(x, sh, w):
        return pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((E, d_z), x.dtype),
            grid=(E // T,),
            in_specs=[
                pl.BlockSpec((T, d_x), lambda i: (i, 0)),
                pl.BlockSpec((T, d_sh), lambda i: (i, 0)),
                pl.BlockSpec((T, d_w), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((T, d_z), lambda i: (i, 0)),
            interpret=INTERP,
        )(x, sh, w)

    t_dma = timeit(jax.jit(dma_call), x, sh, w)
    print(f"dmafloor    : {t_dma:7.2f} ms   ({bytes_moved/t_dma/1e6:.0f} GB/s)")

    x_slots, d_x_al, w_slots, d_w_al, z_slots, d_z_al = make_layouts(tp)

    # ---- aligned inputs, unaligned out writes
    import jax.experimental.pallas.tpu as pltpu

    def aligned_kernel(write_aligned_z, x_ref, sh_ref, w_ref, out_ref, x_al, w_al):
        for off, (slot, mul) in x_slots.items():
            x_al[:, slot : slot + mul] = x_ref[:, off : off + mul]
        for off, (slot, mul) in w_slots.items():
            w_al[:, slot : slot + mul] = w_ref[:, off : off + mul]
        cols = sh_ref[:]
        out_acc = {}
        for (out_off, b_off, mul), ts in _group(terms).items():
            acc = None
            for t in ts:
                col = cols[:, t.col_off : t.col_off + 1]
                slot, _ = x_slots[t.a_off]
                a = x_al[:, slot : slot + 128]
                v = (t.coeff * col) * a
                acc = v if acc is None else acc + v
            wslot, _ = w_slots[b_off]
            val = acc * w_al[:, wslot : wslot + 128]
            key_ = (out_off, mul)
            out_acc[key_] = out_acc.get(key_, 0.0) + val
        out_ref[:] = jnp.zeros_like(out_ref)
        for (out_off, mul), val in out_acc.items():
            if write_aligned_z:
                zslot, _ = z_slots[out_off]
                out_ref[:, zslot : zslot + 128] = val
            else:
                out_ref[:, out_off : out_off + mul] = val[:, :mul]

    def aligned_call(write_aligned_z, x, sh, w):
        d_out = d_z_al if write_aligned_z else d_z
        return pl.pallas_call(
            functools.partial(aligned_kernel, write_aligned_z),
            out_shape=jax.ShapeDtypeStruct((E, d_out), x.dtype),
            grid=(E // T,),
            in_specs=[
                pl.BlockSpec((T, d_x), lambda i: (i, 0)),
                pl.BlockSpec((T, d_sh), lambda i: (i, 0)),
                pl.BlockSpec((T, d_w), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((T, d_out), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((T, d_x_al), x.dtype),
                pltpu.VMEM((T, d_w_al), x.dtype),
            ],
            interpret=INTERP,
        )(x, sh, w)

    t_al = timeit(jax.jit(functools.partial(aligned_call, False)), x, sh, w)
    print(f"aligned-in  : {t_al:7.2f} ms")
    t_alz = timeit(jax.jit(functools.partial(aligned_call, True)), x, sh, w)
    print(f"aligned-i/o : {t_alz:7.2f} ms   (out {E*d_z_al*x.dtype.itemsize/1e6:.0f} MB)")

    # ---- fused lin prototype: aligned z scratch + per-group matmul epilogue
    # groups: distinct irreps of tp.irreps_out; fan = 128 per contributing block
    groups = {}
    out_slices = tp.irreps_out.slices()
    for bo, (mul, ir) in enumerate(tp.irreps_out):
        groups.setdefault(ir, []).append(bo)
    ginfo = []
    for ir, bos in sorted(groups.items(), key=lambda kv: (kv[0].l, kv[0].p)):
        fan_pad = 128 * len(bos)
        # z slot of (block, component k) -> row range k*T, col 128*pos(bo)
        colmap = {bo: 128 * i for i, bo in enumerate(bos)}
        mul_out = {0: 224, 1: 64, 2: 32}[ir.l]  # flagship lin widths (approx)
        ginfo.append((ir, bos, colmap, fan_pad, mul_out))
    Ws = [
        jax.random.normal(key, (fan_pad, mul_out), dtype)
        for (_, _, _, fan_pad, mul_out) in ginfo
    ]
    d_fused = sum((ir.dim) * mo for (ir, _, _, _, mo) in ginfo)

    def fused_kernel(x_ref, sh_ref, w_ref, *rest):
        W_refs = rest[: len(ginfo)]
        out_ref = rest[len(ginfo)]
        scr = rest[len(ginfo) + 1 :]
        x_al, w_al = scr[0], scr[1]
        z_scr = scr[2:]
        for off, (slot, mul) in x_slots.items():
            x_al[:, slot : slot + mul] = x_ref[:, off : off + mul]
        for off, (slot, mul) in w_slots.items():
            w_al[:, slot : slot + mul] = w_ref[:, off : off + mul]
        cols = sh_ref[:]
        # block -> (group index, k, col)
        zmap = {}
        for gi, (ir, bos, colmap, fan_pad, mo) in enumerate(ginfo):
            for bo in bos:
                start = out_slices[bo].start
                mul = tp.irreps_out[bo].mul
                for c in range(ir.dim):
                    zmap[start + c * mul] = (gi, c, colmap[bo])
        out_acc = {}
        for (out_off, b_off, mul), ts in _group(terms).items():
            acc = None
            for t in ts:
                col = cols[:, t.col_off : t.col_off + 1]
                slot, _ = x_slots[t.a_off]
                a = x_al[:, slot : slot + 128]
                v = (t.coeff * col) * a
                acc = v if acc is None else acc + v
            wslot, _ = w_slots[b_off]
            out_acc[out_off] = acc * w_al[:, wslot : wslot + 128]
        # every (group, k, col) slot is written exactly once below (asserted
        # at build time), so no zero-init of the z scratch is needed
        for out_off, val in out_acc.items():
            gi, k, colp = zmap[out_off]
            z_scr[gi][k * T : (k + 1) * T, colp : colp + 128] = val
        o = 0
        for gi, (ir, bos, colmap, fan_pad, mo) in enumerate(ginfo):
            res = jnp.dot(
                z_scr[gi][:], W_refs[gi][:], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)
            for k in range(ir.dim):
                out_ref[:, o + k * mo : o + (k + 1) * mo] = res[k * T : (k + 1) * T, :]
            o += ir.dim * mo

    def fused_call(x, sh, w, *Ws):
        return pl.pallas_call(
            fused_kernel,
            out_shape=jax.ShapeDtypeStruct((E, d_fused), x.dtype),
            grid=(E // T,),
            in_specs=[
                pl.BlockSpec((T, d_x), lambda i: (i, 0)),
                pl.BlockSpec((T, d_sh), lambda i: (i, 0)),
                pl.BlockSpec((T, d_w), lambda i: (i, 0)),
            ]
            + [
                pl.BlockSpec(W.shape, lambda i: (0, 0))
                for W in Ws
            ],
            out_specs=pl.BlockSpec((T, d_fused), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((T, d_x_al), x.dtype),
                pltpu.VMEM((T, d_w_al), x.dtype),
            ]
            + [
                pltpu.VMEM((ir.dim * T, fan_pad), x.dtype)
                for (ir, _, _, fan_pad, _) in ginfo
            ],
            interpret=INTERP,
        )(x, sh, w, *Ws)

    t_f = timeit(jax.jit(fused_call), x, sh, w, *Ws)
    fused_bytes = E * (d_x + d_sh + d_w + d_fused) * x.dtype.itemsize
    print(f"fusedlin    : {t_f:7.2f} ms   (out dim {d_fused}, {fused_bytes/1e6:.0f} MB, "
          f"{fused_bytes/t_f/1e6:.0f} GB/s)")
    # reference composition cost for the fused op: current + XLA lin
    from equiformer_tpu.nn import IrrepsLinear
    lin_ir_out = Irreps("224x0e+64x1e+32x2e")
    lin = IrrepsLinear(tp.irreps_out, lin_ir_out, use_bias=False)
    lp = lin.init(key, jnp.zeros((1, d_z), dtype))
    comp = jax.jit(lambda x, s, w: lin.apply(lp, pk(x, s, w)))
    t_c = timeit(comp, x, sh, w)
    print(f"cur+xla-lin : {t_c:7.2f} ms   (the op the fused kernel replaces)")


if __name__ == "__main__":
    main()
