"""Kron-basis MXU cast of the fused DTP+linear (first-order path).

MEASURED NEGATIVE (round 4) — kept as a default-OFF A/B record.  On chip
this path runs QM9 at 1438.9 g/s vs 2327.8 for the FMA kernels; per-call
micro-attribution and the aligned/128-padded variant that measured even
worse are in PERF_ANALYSIS.md ("the kron-basis MXU cast, measured") and
scripts/kron_micro.py.  Root cause: the kron operand must be lane-aligned
(per-triple stores at unaligned offsets lower to Mosaic shift/mask
sequences) and compact (G + fp32 dG are tile-independent VMEM residents)
at the same time, and at mul<128 those are mutually exclusive.

The round-3 roofline (PERF_ANALYSIS.md) showed both flagship steps are
VPU-bound: the CG contraction in dtp_lin_pallas.py runs ~3 VPU ops per
term element forward and ~8 backward, while the MXU sits <4ms/step.  This
variant moves the contraction onto the MXU by substituting z's definition
into the output matmul:

  out[e, k*cols+c] = sum_q  Kop[e, q, u] * G[(q, u), c]

where q runs over the distinct (x component, sh component, weight path)
triples feeding output component k, the *kron operand*

  Kop[e, (q, u)] = sh[e, j_q] * x[e, i_q, u] * w[e, p_q, u]

costs ONE broadcast-multiply per triple (the x*w product is cached per
(x slot, w slot) pair), and the constant

  G[(q, u), c] = C_{i_q j_q k} * W[fan(q) + u, c]

folds the CG coefficient into the packed linear weight.  G is built OUTSIDE
the kernel in plain XLA (differentiable: dW and — for shared weights — dw
chain through the build), so the kernel sees only (x, sh, w, G).

Everything runs in the *edge-major* layout of the raw operands — the flat
x/w refs already hold each component's mul lanes contiguously, so the kron
operand is assembled with unaligned lane-slice reads and lane-offset stores
into one VMEM scratch, and dx/dw are written back by direct lane-offset
stores.  (A first draft packed small muls like the FMA kernels and
unstacked them with sublane ``jnp.concatenate`` — Mosaic rejects that
concat on real TPU: "result/input offset mismatch on non-concat dim".)

Gains over the FMA formulation (kernels/dtp_lin_pallas.py):
  * forward VPU ~2.7x fewer elemwise ops (no z scratch accumulation, no
    per-slot w multiply, no align-copy phase);
  * backward VPU ~3.3x fewer (the dz trilinear transposes collapse to one
    cp*dkop accumulate per triple plus two ops per (x,w) pair);
  * NO saved-z residual at all — the backward rebuilds Kop from x (the
    save-z round trip was 6656 B/edge on the QM9 flagship, ~13.6ms/step of
    HBM);
  * the out assembly is one contiguous write per (group, k) and the
    backward reads the cotangent by direct slices (no g scratch).
Cost: the MXU dots contract K = sum of triple widths instead of the fan
(~3-6x more MXU flops — noise at the 1:100 VPU:MXU rate ratio) and G/dG
are tile-independent VMEM residents (~3x the packed W).

Precision caveat: the backward casts its fp32 in-kernel dG accumulator to
G.dtype (bf16 on chip) before chaining to dW through build_G's transpose,
so the final weight gradient is rounded to bf16 — slightly lower precision
than the FMA path, whose kernel emits fp32 dW directly.  Acceptable for a
default-OFF A/B path; revisit before ever training through this path.

Semantics == make_fused_dtp_lin(plan)(x, sh, w, Ws) for needs_dsh=False
plans (QM9/OC20 never differentiate wrt the SH of edge vectors; the force
path keeps the leg-primitive family in dtp_lin_ho.py).  Select with
EQUIFORMER_TPU_KRON_G=1.  Reference op: DepthwiseTensorProduct + LinearRS
in SeparableFCTP (/root/reference/nets/graph_attention_transformer.py:
186-248).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dtp_lin_pallas import (
    LANE,
    DTPLinPlan,
    _n_scalar,
    _shared_spec,
)

SUBL = 16  # sublane quantum (bf16): G row blocks are padded to multiples


class _QCol(NamedTuple):
    a_off: int      # x flat offset (x_slots key)
    col_off: int    # sh column
    b_off: int      # w flat offset (w_slots key)
    coeff: float    # CG coefficient (folded into G)
    fc: int         # fan row base in the group's packed W
    mul: int
    width: int      # K columns this triple occupies (mul, sublane-padded)


class KronMeta:
    """Kron-column layout + G build for a DTPLinPlan.

    ``qcols[(gi, k)]`` lists the triples feeding output component k of group
    gi, in plan-term order; their K blocks are contiguous per (gi, k) so the
    MXU dot reads one lane range of the kron scratch and one row slice of
    the per-group G.
    """

    def __init__(self, plan: DTPLinPlan):
        assert plan.radial_fold is None, "kron path: no radial folding"
        self.plan = plan
        qcols = {}
        seen = set()
        for t, (gi, k, fc) in plan._terms:
            key = (gi, k, t.a_off, t.col_off, t.b_off)
            assert key not in seen, "duplicate CG entry"
            seen.add(key)
            _, mul, _ = plan.x_slots[t.a_off]
            width = ((mul + SUBL - 1) // SUBL) * SUBL
            qcols.setdefault((gi, k), []).append(
                _QCol(t.a_off, t.col_off, t.b_off, t.coeff, fc, mul, width)
            )
        # per (gi, k): contiguous K/G row ranges, ordered (group, k)
        self.qcols = {}
        self.k_ranges = {}  # (gi, k) -> (row start in G_g, row end)
        self.g_rows: List[int] = [0] * len(plan.groups)
        self.max_k = 0
        for gi, g in enumerate(plan.groups):
            acc = 0
            for k in range(g.ir.dim):
                qs = qcols.get((gi, k), [])
                assert qs, "output component with no CG terms"
                self.qcols[(gi, k)] = tuple(qs)
                w = sum(q.width for q in qs)
                self.k_ranges[(gi, k)] = (acc, acc + w)
                self.max_k = max(self.max_k, w)
                acc += w
            self.g_rows[gi] = acc
        # kron scratch width: one lane range per (gi, k), 128-padded
        self.kop_lanes = ((self.max_k + LANE - 1) // LANE) * LANE

    # ------------------------------------------------------------- G build
    def build_G(self, Ws: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Per-group G [K_g, cols]: for each (k, triple) row block, the
        coefficient-scaled fan rows of the packed W.  Plain XLA — dW (and,
        via scale_shared_weights upstream, the shared dw) chain through.
        Pad rows are zero, so garbage in the kron scratch's pad lanes
        contributes nothing to the dot."""
        out = []
        for gi, g in enumerate(self.plan.groups):
            blocks = []
            for k in range(g.ir.dim):
                for q in self.qcols[(gi, k)]:
                    rows = q.coeff * jax.lax.slice_in_dim(
                        Ws[gi], q.fc, q.fc + q.mul, axis=0
                    )
                    if q.width > q.mul:
                        rows = jnp.pad(rows, ((0, q.width - q.mul), (0, 0)))
                    blocks.append(rows)
            out.append(jnp.concatenate(blocks, axis=0))
        return out


# ------------------------------------------------------------------ kernels


def _pair_val(plan, x_ref, w_ref, cache, q):
    """x*w product for one (x slot, w slot) pair, edge-major [T, mul];
    w folded into G -> x alone."""
    key = (q.a_off, None if plan.fold_shared else q.b_off)
    if key not in cache:
        v = x_ref[:, q.a_off : q.a_off + q.mul]
        if w_ref is not None:
            v = v * w_ref[:, q.b_off : q.b_off + q.mul]
        cache[key] = v
    return cache[key]


def _fill_kop(meta, kop_ref, cols, x_ref, w_ref, cache, gi, k):
    """Assemble the [T, K_k] kron operand for output component (gi, k) in
    the scratch: one broadcast-multiply + lane-offset store per triple.
    Pad lanes keep whatever was there — G's pad rows are zero."""
    off = 0
    for q in meta.qcols[(gi, k)]:
        src = _pair_val(meta.plan, x_ref, w_ref, cache, q)
        val = cols[:, q.col_off : q.col_off + 1] * src
        kop_ref[:, off : off + q.mul] = val
        off += q.width


def _fwd_kernel(meta: KronMeta, T: int, n_ref, *refs):
    plan = meta.plan
    nG = len(plan.groups)
    if plan.fold_shared:
        x_ref, sh_ref, w_ref = refs[0], refs[1], None
        rest = refs[2:]
    else:
        x_ref, sh_ref, w_ref = refs[:3]
        rest = refs[3:]
    G_refs = rest[:nG]
    out_ref = rest[nG]
    kop_ref = rest[nG + 1]

    active = pl.program_id(0) * T < n_ref[0]

    @pl.when(active)
    def _():
        # pad lanes between triples must be finite: G's pad rows are zero,
        # but uninitialized VMEM could hold NaN patterns and NaN*0 = NaN
        kop_ref[:] = jnp.zeros_like(kop_ref)
        cols = sh_ref[:]
        cache = {}
        for gi, g in enumerate(plan.groups):
            for k in range(g.ir.dim):
                _fill_kop(meta, kop_ref, cols, x_ref, w_ref, cache, gi, k)
                rs, re = meta.k_ranges[(gi, k)]
                res = jax.lax.dot_general(
                    kop_ref[:, : re - rs],
                    G_refs[gi][rs:re, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o0 = g.out_off + k * g.cols
                out_ref[:, o0 : o0 + g.cols] = res.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _bwd_kernel(meta: KronMeta, T: int, n_ref, *refs):
    plan = meta.plan
    nG = len(plan.groups)
    it = iter(refs)
    x_ref = next(it)
    sh_ref = next(it)
    w_ref = None if plan.fold_shared else next(it)
    G_refs = [next(it) for _ in range(nG)]
    g_ref = next(it)
    dx_ref = next(it)
    dsh_ref = next(it)
    dw_ref = None if plan.fold_shared else next(it)
    dG_refs = [next(it) for _ in range(nG)]
    kop_ref = next(it)
    assert next(it, None) is None

    i = pl.program_id(0)
    active = i * T < n_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dsh_ref[:] = jnp.zeros_like(dsh_ref)
        if dw_ref is not None:
            dw_ref[:] = jnp.zeros_like(dw_ref)

        @pl.when(i == 0)
        def _():
            for gi in range(nG):
                dG_refs[gi][:] = jnp.zeros_like(dG_refs[gi])

    @pl.when(active)
    def _():
        kop_ref[:] = jnp.zeros_like(kop_ref)  # see _fwd_kernel
        cols = sh_ref[:]
        cache = {}
        dxw_acc = {}  # (a_off, b_off) -> edge-major [T, mul] cotangent
        for gi, g in enumerate(plan.groups):
            for k in range(g.ir.dim):
                _fill_kop(meta, kop_ref, cols, x_ref, w_ref, cache, gi, k)
                rs, re = meta.k_ranges[(gi, k)]
                o0 = g.out_off + k * g.cols
                gblk = g_ref[:, o0 : o0 + g.cols]
                # dG += Kop^T gblk ; dkop = gblk G^T (both carry coeff & W)
                dG_c = jax.lax.dot_general(
                    kop_ref[:, : re - rs],
                    gblk,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(i == 0)
                def _(gi=gi, rs=rs, re=re, dG_c=dG_c):
                    dG_refs[gi][rs:re, :] = dG_c

                @pl.when(i > 0)
                def _(gi=gi, rs=rs, re=re, dG_c=dG_c):
                    dG_refs[gi][rs:re, :] += dG_c

                dkop = jax.lax.dot_general(
                    gblk,
                    G_refs[gi][rs:re, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cols.dtype)  # [T, K_k]
                off = 0
                for q in meta.qcols[(gi, k)]:
                    dval = dkop[:, off : off + q.mul]
                    off += q.width
                    cp = cols[:, q.col_off : q.col_off + 1]
                    key = (q.a_off, None if plan.fold_shared else q.b_off)
                    dxw_acc[key] = dxw_acc.get(key, 0.0) + cp * dval
        # pair transposes: dx = dxw*w, dw = dxw*x (w folded: dx = dxw)
        dx_acc, dw_acc = {}, {}
        for (a_off, b_off), dxw in dxw_acc.items():
            _, mul, _ = plan.x_slots[a_off]
            if plan.fold_shared:
                dx_acc[a_off] = dx_acc.get(a_off, 0.0) + dxw
                continue
            dx_acc[a_off] = dx_acc.get(a_off, 0.0) + dxw * w_ref[
                :, b_off : b_off + mul
            ]
            dw_acc[b_off] = dw_acc.get(b_off, 0.0) + dxw * x_ref[
                :, a_off : a_off + mul
            ]
        dx_ref[:] = jnp.zeros_like(dx_ref)
        for a_off, acc in dx_acc.items():
            _, mul, _ = plan.x_slots[a_off]
            dx_ref[:, a_off : a_off + mul] = acc.astype(dx_ref.dtype)
        dsh_ref[:] = jnp.zeros_like(dsh_ref)  # needs_dsh=False path only
        if dw_ref is not None:
            dw_ref[:] = jnp.zeros_like(dw_ref)
            for b_off, acc in dw_acc.items():
                dw_ref[:, b_off : b_off + acc.shape[1]] = acc.astype(
                    dw_ref.dtype
                )


# ------------------------------------------------------------ callable op


def kron_auto_tile(meta: KronMeta, start: int = 128,
                   budget: int = 11 * 2**20) -> int:
    """Edge-tile heuristic, same x4 calibration as dtp_lin_ho.auto_tile:
    per-tile operand/scratch width plus the tile-independent G (operand) and
    dG (fp32 output block) residents."""
    plan = meta.plan
    d_w = 0 if plan.fold_shared else plan.d_w
    # per-tile: in/out blocks + the kron scratch + the transient dkop/dxw
    # values the compiler keeps live (~2x max_k worst case in the backward)
    width = (2 * plan.d_x + plan.d_sh + 2 * d_w + 2 * plan.d_out
             + 3 * meta.kop_lanes)
    fixed = 2 * sum(
        meta.g_rows[gi] * g.cols for gi, g in enumerate(plan.groups)
    )
    tile = start
    while tile > 32 and (tile * width + fixed) * 4 > budget:
        tile //= 2
    return tile


def make_fused_dtp_lin_kron(plan: DTPLinPlan, tile: Optional[int] = None,
                            interpret: Optional[bool] = None):
    """Kron-basis fused op with the make_fused_dtp_lin call signature:
    ``call(x, sh, w, Ws, n_edges=None) -> out_flat``.  Ws are the
    plan.pack_weights arrays; the G build runs in XLA inside the call so
    dWs (and the shared dw) come from autodiff, and the custom_vjp kernel
    returns dGs."""
    assert not plan.needs_dsh, "kron path has no dsh transpose (force models keep dtp_lin_ho)"
    meta = KronMeta(plan)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile is None:
        tile = kron_auto_tile(meta, plan.tile)
    nG = len(plan.groups)

    def _t_eff(dtype):
        if jnp.dtype(dtype) == jnp.bfloat16:
            return tile
        return max(32, tile // 2)

    def fwd_call(x, sh, w, Gs, n):
        E = x.shape[0]
        T = _t_eff(x.dtype)
        in_specs = [
            pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
            pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
        ]
        operands = [x, sh]
        if not plan.fold_shared:
            in_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
            operands.append(w)
        in_specs += [_shared_spec(G.shape) for G in Gs]
        operands += list(Gs)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, meta, T),
            out_shape=jax.ShapeDtypeStruct((E, plan.d_out), x.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(E // T,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((T, plan.d_out), lambda i, *_: (i, 0)),
                scratch_shapes=[pltpu.VMEM((T, meta.kop_lanes), x.dtype)],
            ),
            interpret=interpret,
        )(n, *operands)

    def bwd_call(x, sh, w, Gs, g, n):
        E = g.shape[0]
        dtype = g.dtype
        T = _t_eff(dtype)
        in_specs = [
            pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
            pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
        ]
        operands = [x, sh]
        if not plan.fold_shared:
            in_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
            operands.append(w)
        in_specs += [_shared_spec(G.shape) for G in Gs]
        operands += list(Gs)
        in_specs.append(pl.BlockSpec((T, plan.d_out), lambda i, *_: (i, 0)))
        operands.append(g)

        out_shape = [
            jax.ShapeDtypeStruct((E, plan.d_x), dtype),
            jax.ShapeDtypeStruct((E, plan.d_sh), sh.dtype),
        ]
        out_specs = [
            pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
            pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
        ]
        if not plan.fold_shared:
            out_shape.append(jax.ShapeDtypeStruct((E, plan.d_w), w.dtype))
            out_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
        for gi, g_ in enumerate(plan.groups):
            out_shape.append(
                jax.ShapeDtypeStruct((meta.g_rows[gi], g_.cols), jnp.float32)
            )
            out_specs.append(_shared_spec((meta.g_rows[gi], g_.cols)))
        return pl.pallas_call(
            functools.partial(_bwd_kernel, meta, T),
            out_shape=tuple(out_shape),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(E // T,),
                in_specs=in_specs,
                out_specs=tuple(out_specs),
                scratch_shapes=[pltpu.VMEM((T, meta.kop_lanes), dtype)],
            ),
            interpret=interpret,
        )(n, *operands)

    if plan.fold_shared:

        @jax.custom_vjp
        def fused_nw(n, x, sh, *Gs):
            return fwd_call(x, sh, None, Gs, n)

        def fnw_fwd(n, x, sh, *Gs):
            return fwd_call(x, sh, None, Gs, n), (n, x, sh, Gs)

        def fnw_bwd(res, g):
            n, x, sh, Gs = res
            outs = bwd_call(x, sh, None, Gs, g, n)
            dGs = tuple(d.astype(G.dtype) for d, G in zip(outs[2:], Gs))
            return (None, outs[0], outs[1]) + dGs

        fused_nw.defvjp(fnw_fwd, fnw_bwd)

        def call(x, sh, w, Ws, n_edges=None):
            E = x.shape[0]
            pad = (-E) % _t_eff(x.dtype)
            Ws = plan.scale_shared_weights(w.astype(x.dtype), Ws)
            Gs = meta.build_G(Ws)
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
                sh = jnp.pad(sh, ((0, pad), (0, 0)))
            n = _n_scalar(n_edges, E)
            out = fused_nw(n, x, sh, *Gs)
            return out[:E] if pad else out

        return call

    @jax.custom_vjp
    def fused(n, x, sh, w, *Gs):
        return fwd_call(x, sh, w, Gs, n)

    def f_fwd(n, x, sh, w, *Gs):
        return fwd_call(x, sh, w, Gs, n), (n, x, sh, w, Gs)

    def f_bwd(res, g):
        n, x, sh, w, Gs = res
        outs = bwd_call(x, sh, w, Gs, g, n)
        dGs = tuple(d.astype(G.dtype) for d, G in zip(outs[3:], Gs))
        return (None, outs[0], outs[1], outs[2]) + dGs

    fused.defvjp(f_fwd, f_bwd)

    def call(x, sh, w, Ws, n_edges=None):
        E = x.shape[0]
        pad = (-E) % _t_eff(x.dtype)
        Gs = meta.build_G([W.astype(x.dtype) for W in Ws])
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            sh = jnp.pad(sh, ((0, pad), (0, 0)))
            w = jnp.pad(w, ((0, pad), (0, 0)))
        n = _n_scalar(n_edges, E)
        out = fused(n, x, sh, w, *Gs)
        return out[:E] if pad else out

    return call
