"""Kron-basis MXU cast of the fused DTP+linear (first-order path).

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

Gains over the FMA formulation (kernels/dtp_lin_pallas.py):
  * forward VPU ~2.7x fewer elemwise ops (no z scratch writes, no slot
    accumulation, no per-slot w multiply);
  * backward VPU ~3.3x fewer (the dz trilinear transposes collapse to one
    cp*dKop accumulate per triple plus two ops per (x,w) pair);
  * NO saved-z residual at all — the backward rebuilds Kop from x (the
    save-z round trip was 6656 B/edge on the QM9 flagship, ~13.6ms/step of
    HBM);
  * the out assembly is one contiguous write per (group, k) and the
    backward reads the cotangent by direct slices (no g scratch).
Cost: the MXU dots contract K = sum of triple widths instead of the fan
(~3-6x more MXU flops — noise at the 1:100 VPU:MXU rate ratio) and G/dG
are tile-independent VMEM residents (~3x the packed W).

Semantics == make_fused_dtp_lin(plan)(x, sh, w, Ws) for needs_dsh=False
plans (QM9/OC20 never differentiate wrt the SH of edge vectors; the force
path keeps the leg-primitive family in dtp_lin_ho.py).  Select with
EQUIFORMER_TPU_KRON_G=1.  Reference op: DepthwiseTensorProduct + LinearRS
in SeparableFCTP (/root/reference/nets/graph_attention_transformer.py:
186-248).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dtp_lin_pallas import (
    LANE,
    DTPLinPlan,
    _align_inputs,
    _n_scalar,
    _packed_col,
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
    p: int          # lane pack factor of the x/w slots
    width: int      # K columns this triple occupies (>= mul, sublane-padded)


class KronMeta:
    """Kron-column layout + G build for a DTPLinPlan.

    ``qcols[(gi, k)]`` lists the triples feeding output component k of group
    gi, in plan-term order; their K blocks are contiguous per (gi, k) so the
    MXU dot reads one column slice of the kron operand and one row slice of
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
            _, mul, p = plan.x_slots[t.a_off]
            if p == 1:
                width = LANE  # the kron write covers the whole (zero-padded) slot
            else:
                width = ((mul + SUBL - 1) // SUBL) * SUBL
            qcols.setdefault((gi, k), []).append(
                _QCol(t.a_off, t.col_off, t.b_off, t.coeff, fc, mul, p, width)
            )
        # per (gi, k): contiguous K/G row ranges, ordered (group, k)
        self.qcols = {}
        self.k_ranges = {}  # (gi, k) -> (row start in G_g, row end)
        self.g_rows: List[int] = [0] * len(plan.groups)
        for gi, g in enumerate(plan.groups):
            acc = 0
            for k in range(g.ir.dim):
                qs = qcols.get((gi, k), [])
                assert qs, "output component with no CG terms"
                self.qcols[(gi, k)] = tuple(qs)
                w = sum(q.width for q in qs)
                self.k_ranges[(gi, k)] = (acc, acc + w)
                acc += w
            self.g_rows[gi] = acc
        # x*w pair cache keys (collapse to the x slot when w is folded into G)
        self.pairs = sorted(
            {(q.a_off, None if plan.fold_shared else q.b_off)
             for qs in self.qcols.values() for q in qs}
        )

    # ------------------------------------------------------------- G build
    def build_G(self, Ws: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Per-group G [K_g, cols]: for each (k, triple) row block, the
        coefficient-scaled fan rows of the packed W.  Plain XLA — dW (and,
        via scale_shared_weights upstream, the shared dw) chain through."""
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


def _xw_val(meta, x_al, w_al, cache, a_off, b_off, T):
    """x*w product for one (x slot, w slot) pair, in the slot's packed
    layout ([T, LANE] or [T//p, p*mul]); w_al None -> x alone."""
    plan = meta.plan
    key = (a_off, b_off)
    if key not in cache:
        xs, mul, p = plan.x_slots[a_off]
        lanes = LANE if p == 1 else p * mul
        r = T // p
        v = x_al[:r, xs : xs + lanes]
        if w_al is not None:
            ws, _, _ = plan.w_slots[b_off]
            v = v * w_al[:r, ws : ws + lanes]
        cache[key] = v
    return cache[key]


def _kron_block(meta, cols, x_al, w_al, xwcache, colcache, gi, k, T):
    """The [T, K_k] kron operand for output component (gi, k): one
    broadcast-multiply per triple, packed row-groups unstacked to edge-major
    rows, width-padded with zeros to the sublane quantum."""
    plan = meta.plan
    ops = []
    for q in meta.qcols[(gi, k)]:
        b = None if plan.fold_shared else q.b_off
        src = _xw_val(meta, x_al, w_al, xwcache, q.a_off, b, T)
        cp = _packed_col(plan, cols, colcache, q.col_off, q.p, q.mul, T)
        val = cp * src
        if q.p > 1:
            r = T // q.p
            val = jnp.concatenate(
                [val[:, g * q.mul : (g + 1) * q.mul] for g in range(q.p)],
                axis=0,
            )  # [T, mul]
            if q.width > q.mul:
                val = jnp.pad(val, ((0, 0), (0, q.width - q.mul)))
        ops.append(val)
    return jnp.concatenate(ops, axis=1) if len(ops) > 1 else ops[0]


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
    x_al = rest[nG + 1]
    w_al = rest[nG + 2] if not plan.fold_shared else None

    active = pl.program_id(0) * T < n_ref[0]

    @pl.when(active)
    def _():
        _align_inputs(plan, x_ref, w_ref, x_al, w_al, T)
        cols = sh_ref[:]
        xwcache, colcache = {}, {}
        for gi, g in enumerate(plan.groups):
            for k in range(g.ir.dim):
                Kk = _kron_block(meta, cols, x_al, w_al, xwcache, colcache,
                                 gi, k, T)
                rs, re = meta.k_ranges[(gi, k)]
                res = jax.lax.dot_general(
                    Kk,
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
    x_al = next(it)
    w_al = None if plan.fold_shared else next(it)
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
        _align_inputs(plan, x_ref, w_ref, x_al, w_al, T)
        cols = sh_ref[:]
        xwcache, colcache = {}, {}
        dxw_acc = {}
        for gi, g in enumerate(plan.groups):
            for k in range(g.ir.dim):
                Kk = _kron_block(meta, cols, x_al, w_al, xwcache, colcache,
                                 gi, k, T)
                rs, re = meta.k_ranges[(gi, k)]
                o0 = g.out_off + k * g.cols
                gblk = g_ref[:, o0 : o0 + g.cols]
                # dG += Kk^T gblk ; dKop = gblk G^T (both carry coeff & W)
                dG_c = jax.lax.dot_general(
                    Kk,
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
                ).astype(x_al.dtype)  # [T, K_k]
                off = 0
                for q in meta.qcols[(gi, k)]:
                    dval = dkop[:, off : off + q.width]
                    off += q.width
                    if q.p > 1:
                        r = T // q.p
                        dval = jnp.concatenate(
                            [dval[g * r : (g + 1) * r, : q.mul]
                             for g in range(q.p)],
                            axis=1,
                        )  # [r, p*mul]
                    cp = _packed_col(plan, cols, colcache, q.col_off, q.p,
                                     q.mul, T)
                    key = (q.a_off,
                           None if plan.fold_shared else q.b_off)
                    dxw_acc[key] = dxw_acc.get(key, 0.0) + cp * dval
        # pair transposes: dx = dxw*w, dw = dxw*x (w folded: dx = dxw)
        dx_acc, dw_acc = {}, {}
        for (a_off, b_off), dxw in dxw_acc.items():
            xs, mul, p = plan.x_slots[a_off]
            if plan.fold_shared:
                dx_acc[xs] = dx_acc.get(xs, 0.0) + dxw
                continue
            ws, _, _ = plan.w_slots[b_off]
            r = T // p
            lanes = LANE if p == 1 else p * mul
            dx_acc[xs] = dx_acc.get(xs, 0.0) + dxw * w_al[:r, ws : ws + lanes]
            dw_acc[ws] = dw_acc.get(ws, 0.0) + dxw * x_al[:r, xs : xs + lanes]
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
        dsh_ref[:] = jnp.zeros_like(dsh_ref)  # needs_dsh=False path only
        if dw_ref is not None:
            dw_ref[:] = jnp.zeros_like(dw_ref)
            for off, (slot, mul, p) in plan.w_slots.items():
                if slot not in dw_acc:
                    continue
                acc = dw_acc[slot]
                if p == 1:
                    dw_ref[:, off : off + mul] = acc[:, :mul].astype(
                        dw_ref.dtype
                    )
                else:
                    r = T // p
                    for g in range(p):
                        dw_ref[g * r : (g + 1) * r, off : off + mul] = acc[
                            :, g * mul : (g + 1) * mul
                        ].astype(dw_ref.dtype)


# ------------------------------------------------------------ callable op


def kron_auto_tile(meta: KronMeta, start: int = 128,
                   budget: int = 11 * 2**20) -> int:
    """Edge-tile heuristic, same x4 calibration as dtp_lin_ho.auto_tile:
    per-tile operand/scratch width plus the tile-independent G (operand) and
    dG (fp32 output block) residents."""
    plan = meta.plan
    K_tot = sum(meta.g_rows)
    d_w = 0 if plan.fold_shared else plan.d_w
    d_w_al = 0 if plan.fold_shared else plan.d_w_al
    # per-tile: in/out blocks + aligned scratches + the transient kron/dkop
    # values the compiler keeps live (~2x K_tot worst case in the backward)
    width = (2 * plan.d_x + plan.d_sh + 2 * d_w + plan.d_x_al + d_w_al
             + 2 * plan.d_out + 2 * K_tot)
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
        scratch = [pltpu.VMEM((T, plan.d_x_al), x.dtype)]
        if not plan.fold_shared:
            in_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
            operands.append(w)
            scratch.append(pltpu.VMEM((T, plan.d_w_al), x.dtype))
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
                scratch_shapes=scratch,
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
        scratch = [pltpu.VMEM((T, plan.d_x_al), dtype)]
        if not plan.fold_shared:
            in_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
            operands.append(w)
            scratch.append(pltpu.VMEM((T, plan.d_w_al), dtype))
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
                scratch_shapes=scratch,
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
