"""Arbitrary-order-differentiable fused DTP+linear (the force-model hot op).

The first-order fused kernel (dtp_lin_pallas.py) is a ``jax.custom_vjp`` — it
cannot be linearized, so MD17/DeNS force training (grad-of-grad through
``forces = -dE/dpos``, reference graph_attention_transformer_md17.py:318-325)
previously fell back to the primitive-composed PallasDTP + XLA linear, which
materializes the unsimplified DTP output ``z`` (9408 columns for the L3
models) in HBM on every pass of every AD order.

This module keeps the fusion at arbitrary order with the same trick the DTP
T/R primitives use: the op ``out = Linear_W(DTP(x, sh, w))`` is one
multilinear contraction of a fixed 5-tensor with legs (out, x, sh, w, W).
**Transposing a multilinear map just swaps which leg is the output**, so the
five single-output "leg variants"

  out = F_out(x, sh, w, W)      dx  = F_x(g, sh, w, W)
  dsh = F_sh(g, x, w, W)        dw  = F_w(g, x, sh, W)
  dW  = F_W(g, x, sh, w)        (g = cotangent on the out leg)

form a family closed under JVP (multilinearity: substitute one tangent) and
transpose (swap legs) — autodiff of any order composes by induction, and
every member is a fused Pallas kernel in which z / dz never leave VMEM.
Shared-weight plans fold w into W outside the kernel
(DTPLinPlan.scale_shared_weights, plain differentiable XLA), leaving a
4-tensor with legs (out, x, sh, W).

Kernel bodies reuse the dtp_lin_pallas building blocks (slot alignment, the
lane-packed FMA phase, per-irrep-group MXU matmuls, scalar-prefetch tile
skipping over the padded edge tail).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.extend import core as jex_core
from jax.interpreters import ad, mlir

from .dtp_lin_pallas import (
    DTPLinPlan,
    _align_inputs,
    _fwd_kernel,
    _n_scalar,
    _packed_col,
    _radial_dh,
    _radial_h_packed,
    _radial_w_fill,
    _radial_write_dw,
    _shared_spec,
)

LANE = 128

# Canonical leg order of the contraction tensor; a variant's operands are the
# legs in this order with its output leg removed ('w' absent for fold_shared
# plans, 'W' expands to one operand per irrep group).
_LEGS = ("out", "x", "sh", "w", "W")
# Radial-folded plans: w = h @ Wr (+offset via h's ones column) is itself a
# leg pair — the 6-tensor (out, x, sh, h, Wr, W) stays multilinear, so the
# same JVP/transpose closure holds.  'h' is per-edge ([E, rad_hp]); 'Wr'
# expands to one packed block matrix per pack group (plan.pack_radial).
_LEGS_RAD = ("out", "x", "sh", "h", "Wr", "W")


# --------------------------------------------------------------- plan registry
# Primitive params must be hashable and *structurally stable* across traces
# (flax setup() rebuilds modules every apply; a fresh object id per trace
# would bust the jit cache), so plans are interned by a structural key.
_PLAN_IDS = {}
_PLANS = {}


def _intern_plan(plan: DTPLinPlan, tile: int) -> int:
    tp = plan.tp
    key = (
        str(tp.irreps_in1), str(tp.irreps_in2), str(tp.irreps_out),
        tuple(str(h) for h in plan.head_irreps),
        plan.fold_shared, plan.needs_dsh, tile, plan.radial_fold,
    )
    if key not in _PLAN_IDS:
        pid = len(_PLAN_IDS)
        _PLAN_IDS[key] = pid
        _PLANS[pid] = (plan, tile)
    return _PLAN_IDS[key]


def _legs_of(plan: DTPLinPlan, out_leg: str) -> Tuple[str, ...]:
    base = _LEGS_RAD if plan.radial_fold is not None else _LEGS
    legs = [l for l in base if l != out_leg]
    if plan.fold_shared and "w" in legs:
        legs.remove("w")
    return tuple(legs)


def _edge_legs(plan: DTPLinPlan) -> Tuple[str, ...]:
    """The per-edge legs (everything that can carry a position tangent)."""
    if plan.radial_fold is not None:
        return ("x", "sh", "h")
    return ("x", "sh") if plan.fold_shared else ("x", "sh", "w")


# ------------------------------------------------------------- kernel helpers
def _gm_fill(plan, T, g_ref, g_scr):
    """Stage the out-leg operand into per-group [ir.dim*T, cols] scratches."""
    for gi, g in enumerate(plan.groups):
        gm = g_scr[gi]
        for k in range(g.ir.dim):
            gm[k * T : (k + 1) * T, :] = g_ref[
                :, g.out_off + k * g.cols : g.out_off + (k + 1) * g.cols
            ]


def _dz_phase(plan, T, W_refs, g_scr, dz_scr):
    """dz = g @ W^T per group (MXU)."""
    for gi in range(len(plan.groups)):
        dz_scr[gi][:] = lax.dot_general(
            g_scr[gi][:], W_refs[gi][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dz_scr[gi].dtype)


def _dz_slice(plan, dz_scr, cache, gi, k, fc, p, mul, T):
    key = (gi, k, fc, p)
    if key not in cache:
        if p == 1:
            cache[key] = dz_scr[gi][k * T : (k + 1) * T, fc : fc + LANE]
        else:
            r = T // p
            cache[key] = jnp.concatenate(
                [
                    dz_scr[gi][k * T + g * r : k * T + (g + 1) * r, fc : fc + mul]
                    for g in range(p)
                ],
                axis=1,
            )
    return cache[key]


def _write_sloted(plan, slots, acc_by_slot, out_ref, T):
    """Unpack slot-keyed accumulators into the flat (unaligned) output ref."""
    out_ref[:] = jnp.zeros_like(out_ref)
    for off, (slot, mul, p) in slots.items():
        if slot not in acc_by_slot:
            continue
        acc = acc_by_slot[slot]
        if p == 1:
            out_ref[:, off : off + mul] = acc[:, :mul].astype(out_ref.dtype)
        else:
            r = T // p
            for g in range(p):
                out_ref[g * r : (g + 1) * r, off : off + mul] = acc[
                    :, g * mul : (g + 1) * mul
                ].astype(out_ref.dtype)


def _edge_leg_kernel(plan: DTPLinPlan, T: int, out_leg: str, n_ref, *refs):
    """Kernel for out_leg in ('x', 'sh', 'w'): dz off the MXU, then the
    requested trilinear transpose of the FMA phase.

    Operands arrive in canonical leg order minus the output leg:
      'x'  -> (g, sh, [w], W*)   'sh' -> (g, x, [w], W*)   'w' -> (g, x, sh, W*)
    (the 'sh' variant never reads sh; w is absent for fold_shared plans)."""
    nG = len(plan.groups)
    it = iter(refs)
    g_ref = next(it)  # the 'out' leg operand (cotangent)
    x_ref = sh_ref = w_ref = None
    if out_leg == "x":
        sh_ref = next(it)
        if not plan.fold_shared:
            w_ref = next(it)
    elif out_leg == "sh":
        x_ref = next(it)
        if not plan.fold_shared:
            w_ref = next(it)
    else:  # 'w' (never fold_shared)
        x_ref = next(it)
        sh_ref = next(it)
    W_refs = [next(it) for _ in range(nG)]
    out_ref = next(it)
    x_al = next(it) if x_ref is not None else None
    w_al = next(it) if w_ref is not None else None
    dz_scr = [next(it) for _ in range(nG)]
    g_scr = [next(it) for _ in range(nG)]
    assert next(it, None) is None

    active = pl.program_id(0) * T < n_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(active)
    def _():
        _align_inputs(plan, x_ref, w_ref, x_al, w_al, T)
        _gm_fill(plan, T, g_ref, g_scr)
        _dz_phase(plan, T, W_refs, g_scr, dz_scr)
        cols = sh_ref[:] if sh_ref is not None else None

        acc = {}
        colcache, dzcache = {}, {}
        for t, (gi, k, fc) in plan._terms:
            xs, mul, p = plan.x_slots[t.a_off]
            r = T // p
            lanes = LANE if p == 1 else p * mul
            dz = _dz_slice(plan, dz_scr, dzcache, gi, k, fc, p, mul, T)
            if out_leg == "sh":
                xv = x_al[:r, xs : xs + lanes]
                if plan.fold_shared:
                    v = t.coeff * (xv * dz)
                else:
                    ws, _, _ = plan.w_slots[t.b_off]
                    v = t.coeff * (xv * (w_al[:r, ws : ws + lanes] * dz))
                key = (t.col_off, p, mul)
                acc[key] = acc.get(key, 0.0) + v
                continue
            cp = _packed_col(plan, cols, colcache, t.col_off, p, mul, T)
            cdz = (t.coeff * cp) * dz
            if out_leg == "x":
                if plan.fold_shared:
                    v = cdz
                else:
                    ws, _, _ = plan.w_slots[t.b_off]
                    v = cdz * w_al[:r, ws : ws + lanes]
                acc[xs] = acc.get(xs, 0.0) + v
            else:  # 'w' (never fold_shared)
                ws, _, _ = plan.w_slots[t.b_off]
                xv = x_al[:r, xs : xs + lanes]
                acc[ws] = acc.get(ws, 0.0) + cdz * xv
        if out_leg == "x":
            _write_sloted(plan, plan.x_slots, acc, out_ref, T)
        elif out_leg == "w":
            _write_sloted(plan, plan.w_slots, acc, out_ref, T)
        else:  # 'sh': column sums
            out_ref[:] = jnp.zeros_like(out_ref)
            for (j, p, mul), a in acc.items():
                if p == 1:
                    out_ref[:, j : j + 1] += jnp.sum(
                        a, axis=1, keepdims=True
                    ).astype(out_ref.dtype)
                else:
                    r = T // p
                    for g in range(p):
                        out_ref[g * r : (g + 1) * r, j : j + 1] += jnp.sum(
                            a[:, g * mul : (g + 1) * mul], axis=1, keepdims=True
                        ).astype(out_ref.dtype)


def _edge_leg_kernel_rad(plan: DTPLinPlan, T: int, out_leg: str, n_ref, *refs):
    """Radial-folded edge-leg variants (out_leg in 'x'/'sh'/'h').

    Operands in canonical leg order minus the output leg:
      'x'  -> (g, sh, h, Wr*, W*)   'sh' -> (g, x, h, Wr*, W*)
      'h'  -> (g, x, sh, Wr*, W*)
    The x/sh variants rebuild w in VMEM from (h, Wr); the h variant instead
    accumulates dw and contracts it against Wr (dh = dw Wr^T per pack group),
    reusing the w_al scratch for dw."""
    nG = len(plan.groups)
    nP = len(plan.rad_ranges)
    it = iter(refs)
    g_ref = next(it)
    x_ref = sh_ref = h_ref = None
    if out_leg == "x":
        sh_ref = next(it)
        h_ref = next(it)
    elif out_leg == "sh":
        x_ref = next(it)
        h_ref = next(it)
    else:  # 'h'
        x_ref = next(it)
        sh_ref = next(it)
    Wr_refs = [next(it) for _ in range(nP)]
    W_refs = [next(it) for _ in range(nG)]
    out_ref = next(it)
    x_al = next(it) if x_ref is not None else None
    w_al = next(it)
    dz_scr = [next(it) for _ in range(nG)]
    g_scr = [next(it) for _ in range(nG)]
    assert next(it, None) is None

    active = pl.program_id(0) * T < n_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(active)
    def _():
        if x_ref is not None:
            _align_inputs(plan, x_ref, None, x_al, None, T)
        if out_leg in ("x", "sh"):
            _radial_w_fill(plan, T, h_ref, Wr_refs, w_al)
        _gm_fill(plan, T, g_ref, g_scr)
        _dz_phase(plan, T, W_refs, g_scr, dz_scr)
        cols = sh_ref[:] if sh_ref is not None else None

        acc = {}
        colcache, dzcache = {}, {}
        for t, (gi, k, fc) in plan._terms:
            xs, mul, p = plan.x_slots[t.a_off]
            r = T // p
            lanes = LANE if p == 1 else p * mul
            dz = _dz_slice(plan, dz_scr, dzcache, gi, k, fc, p, mul, T)
            ws, _, _ = plan.w_slots[t.b_off]
            if out_leg == "sh":
                xv = x_al[:r, xs : xs + lanes]
                wv = w_al[:r, ws : ws + lanes]
                v = t.coeff * (xv * (wv * dz))
                key = (t.col_off, p, mul)
                acc[key] = acc.get(key, 0.0) + v
                continue
            cp = _packed_col(plan, cols, colcache, t.col_off, p, mul, T)
            cdz = (t.coeff * cp) * dz
            if out_leg == "x":
                acc[xs] = acc.get(xs, 0.0) + cdz * w_al[:r, ws : ws + lanes]
            else:  # 'h': accumulate dw, contract below
                acc[ws] = acc.get(ws, 0.0) + cdz * x_al[:r, xs : xs + lanes]
        if out_leg == "x":
            _write_sloted(plan, plan.x_slots, acc, out_ref, T)
        elif out_leg == "h":
            _radial_write_dw(plan, acc, w_al, T)
            _radial_dh(plan, T, w_al, Wr_refs, out_ref)
        else:  # 'sh': column sums
            out_ref[:] = jnp.zeros_like(out_ref)
            for (j, p, mul), a in acc.items():
                if p == 1:
                    out_ref[:, j : j + 1] += jnp.sum(
                        a, axis=1, keepdims=True
                    ).astype(out_ref.dtype)
                else:
                    r = T // p
                    for g in range(p):
                        out_ref[g * r : (g + 1) * r, j : j + 1] += jnp.sum(
                            a[:, g * mul : (g + 1) * mul], axis=1, keepdims=True
                        ).astype(out_ref.dtype)


def _Wr_leg_kernel(plan: DTPLinPlan, T: int, n_ref, *refs):
    """out_leg == 'Wr': dw via the dz phase + FMA transpose, then
    dWr_p = h_packed^T @ dw accumulated across the edge grid (fp32 blocks);
    the XLA-side pack_radial transpose extracts the real (Wr, offset) rows."""
    nG = len(plan.groups)
    nP = len(plan.rad_ranges)
    it = iter(refs)
    g_ref = next(it)
    x_ref = next(it)
    sh_ref = next(it)
    h_ref = next(it)
    W_refs = [next(it) for _ in range(nG)]
    dWr_refs = [next(it) for _ in range(nP)]
    x_al = next(it)
    w_al = next(it)
    dz_scr = [next(it) for _ in range(nG)]
    g_scr = [next(it) for _ in range(nG)]
    assert next(it, None) is None

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for d in dWr_refs:
            d[:] = jnp.zeros_like(d)

    active = i * T < n_ref[0]

    @pl.when(active)
    def _():
        _align_inputs(plan, x_ref, None, x_al, None, T)
        _gm_fill(plan, T, g_ref, g_scr)
        _dz_phase(plan, T, W_refs, g_scr, dz_scr)
        cols = sh_ref[:]
        dw_acc = {}
        colcache, dzcache = {}, {}
        for t, (gi, k, fc) in plan._terms:
            xs, mul, p = plan.x_slots[t.a_off]
            r = T // p
            lanes = LANE if p == 1 else p * mul
            dz = _dz_slice(plan, dz_scr, dzcache, gi, k, fc, p, mul, T)
            cp = _packed_col(plan, cols, colcache, t.col_off, p, mul, T)
            ws, _, _ = plan.w_slots[t.b_off]
            dw_acc[ws] = dw_acc.get(ws, 0.0) + ((t.coeff * cp) * dz) * x_al[
                :r, xs : xs + lanes
            ]
        _radial_write_dw(plan, dw_acc, w_al, T)
        for pi, (p, start, width) in enumerate(plan.rad_ranges):
            r = T // p
            hp_op = _radial_h_packed(plan, h_ref, p, T)
            dWr_refs[pi][:] += lax.dot_general(
                hp_op,
                w_al[:r, start : start + width],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _W_leg_kernel(plan: DTPLinPlan, T: int, n_ref, *refs):
    """out_leg == 'W': z via the FMA phase, dW_g = z^T @ g accumulated across
    the edge grid in fp32 output blocks.  Radial plans rebuild w from (h, Wr)
    first."""
    from .dtp_lin_pallas import _fma_z

    nG = len(plan.groups)
    rad = plan.radial_fold is not None
    nP = len(plan.rad_ranges) if rad else 0
    it = iter(refs)
    g_ref = next(it)
    x_ref = next(it)
    sh_ref = next(it)
    h_ref = next(it) if rad else None
    w_ref = None if (plan.fold_shared or rad) else next(it)
    Wr_refs = [next(it) for _ in range(nP)]
    dW_refs = [next(it) for _ in range(nG)]
    x_al = next(it)
    w_al = next(it) if rad else (None if plan.fold_shared else next(it))
    z_scr = [next(it) for _ in range(nG)]
    g_scr = [next(it) for _ in range(nG)]
    assert next(it, None) is None

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for zs in z_scr:
            zs[:] = jnp.zeros_like(zs)
        for gi in range(nG):
            dW_refs[gi][:] = jnp.zeros_like(dW_refs[gi])

    active = i * T < n_ref[0]

    @pl.when(active)
    def _():
        _align_inputs(plan, x_ref, w_ref, x_al, w_al if not rad else None, T)
        if rad:
            _radial_w_fill(plan, T, h_ref, Wr_refs, w_al)
        _fma_z(plan, sh_ref[:], x_al, w_al, z_scr, T)
        _gm_fill(plan, T, g_ref, g_scr)
        for gi in range(nG):
            dW_refs[gi][:] += lax.dot_general(
                z_scr[gi][:], g_scr[gi][:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _bwd3_kernel(plan: DTPLinPlan, T: int, n_ref, *refs):
    """Combined edge-leg backward: (dx, dsh[, dw|dh]) in ONE pass — one dz
    MXU phase instead of three (the x/sh/w leg kernels each recompute
    ``dz = g @ W^T``).  Same math as three leg kernels; used by the
    consolidated F_edge3 transpose.  Radial plans rebuild w from (h, Wr) and
    emit dh instead of dw (dw stays in VMEM, contracted against Wr)."""
    nG = len(plan.groups)
    rad = plan.radial_fold is not None
    nP = len(plan.rad_ranges) if rad else 0
    it = iter(refs)
    g_ref = next(it)
    x_ref = next(it)
    sh_ref = next(it)
    h_ref = next(it) if rad else None
    w_ref = None if (plan.fold_shared or rad) else next(it)
    Wr_refs = [next(it) for _ in range(nP)]
    W_refs = [next(it) for _ in range(nG)]
    dx_ref = next(it)
    dsh_ref = next(it)
    dh_ref = next(it) if rad else None
    dw_ref = None if (plan.fold_shared or rad) else next(it)
    x_al = next(it)
    w_al = next(it) if rad else (None if plan.fold_shared else next(it))
    dz_scr = [next(it) for _ in range(nG)]
    g_scr = [next(it) for _ in range(nG)]
    assert next(it, None) is None

    active = pl.program_id(0) * T < n_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dsh_ref[:] = jnp.zeros_like(dsh_ref)
        if dw_ref is not None:
            dw_ref[:] = jnp.zeros_like(dw_ref)
        if dh_ref is not None:
            dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when(active)
    def _():
        _align_inputs(plan, x_ref, w_ref, x_al, None if rad else w_al, T)
        if rad:
            _radial_w_fill(plan, T, h_ref, Wr_refs, w_al)
        _gm_fill(plan, T, g_ref, g_scr)
        _dz_phase(plan, T, W_refs, g_scr, dz_scr)
        cols = sh_ref[:]
        dx_acc, dw_acc, dsh_acc = {}, {}, {}
        colcache, dzcache = {}, {}
        for t, (gi, k, fc) in plan._terms:
            xs, mul, p = plan.x_slots[t.a_off]
            r = T // p
            lanes = LANE if p == 1 else p * mul
            dz = _dz_slice(plan, dz_scr, dzcache, gi, k, fc, p, mul, T)
            cp = _packed_col(plan, cols, colcache, t.col_off, p, mul, T)
            xv = x_al[:r, xs : xs + lanes]
            cdz = (t.coeff * cp) * dz
            if plan.fold_shared:
                dx_acc[xs] = dx_acc.get(xs, 0.0) + cdz
                dsh_acc[(t.col_off, p, mul)] = (
                    dsh_acc.get((t.col_off, p, mul), 0.0) + t.coeff * (xv * dz)
                )
            else:
                ws, _, _ = plan.w_slots[t.b_off]
                wv = w_al[:r, ws : ws + lanes]
                dx_acc[xs] = dx_acc.get(xs, 0.0) + cdz * wv
                dw_acc[ws] = dw_acc.get(ws, 0.0) + cdz * xv
                dsh_acc[(t.col_off, p, mul)] = (
                    dsh_acc.get((t.col_off, p, mul), 0.0)
                    + t.coeff * (xv * (wv * dz))
                )
        _write_sloted(plan, plan.x_slots, dx_acc, dx_ref, T)
        if rad:
            # dw never leaves VMEM: overwrite the (now consumed) w scratch
            # with it and contract against Wr per pack group
            _radial_write_dw(plan, dw_acc, w_al, T)
            _radial_dh(plan, T, w_al, Wr_refs, dh_ref)
        dsh_ref[:] = jnp.zeros_like(dsh_ref)
        for (j, p, mul), a in dsh_acc.items():
            if p == 1:
                dsh_ref[:, j : j + 1] += jnp.sum(
                    a, axis=1, keepdims=True
                ).astype(dsh_ref.dtype)
            else:
                r = T // p
                for g in range(p):
                    dsh_ref[g * r : (g + 1) * r, j : j + 1] += jnp.sum(
                        a[:, g * mul : (g + 1) * mul], axis=1, keepdims=True
                    ).astype(dsh_ref.dtype)
        if dw_ref is not None:
            _write_sloted(plan, plan.w_slots, dw_acc, dw_ref, T)


# ---------------------------------------------------------------- pallas calls
def _edge_spec(T, d):
    return pl.BlockSpec((T, d), lambda i, *_: (i, 0))


def _leg_dim(plan: DTPLinPlan, leg: str) -> int:
    if leg == "h":
        return plan.rad_hp
    return {"out": plan.d_out, "x": plan.d_x, "sh": plan.d_sh, "w": plan.d_w}[leg]


def _t_eff(tile: int, dtype) -> int:
    """VMEM scratch scales with bytes-per-element: tiles are calibrated for
    bf16 (see nn/tp_modules._make_fused_plan); wider dtypes halve the tile."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return tile
    return max(32, tile // 2)


def _leg_call(plan: DTPLinPlan, tile: int, out_leg: str, interpret: bool,
              n, *operands):
    nG = len(plan.groups)
    rad = plan.radial_fold is not None
    T = _t_eff(tile, operands[0].dtype)
    E = operands[0].shape[0]
    dtype = operands[0].dtype
    slots, width = _op_slots(plan, out_leg)
    assert width == len(operands), (out_leg, width, len(operands))
    in_specs = []
    for leg, s, e in slots:
        if leg in ("W", "Wr"):
            in_specs += [_shared_spec(op.shape) for op in operands[s:e]]
        else:
            in_specs.append(_edge_spec(T, _leg_dim(plan, leg)))

    z_group_scr = [pltpu.VMEM((g.ir.dim * T, g.fan_pad), dtype) for g in plan.groups]
    g_group_scr = [pltpu.VMEM((g.ir.dim * T, g.cols), dtype) for g in plan.groups]
    x_al_scr = pltpu.VMEM((T, plan.d_x_al), dtype)
    w_al_scr = pltpu.VMEM((T, plan.d_w_al), dtype)

    if out_leg == "W":
        out_shape = tuple(
            jax.ShapeDtypeStruct((g.fan_pad, g.cols), jnp.float32)
            for g in plan.groups
        )
        out_specs = tuple(_shared_spec((g.fan_pad, g.cols)) for g in plan.groups)
        scratch = [x_al_scr]
        if rad or not plan.fold_shared:
            scratch.append(w_al_scr)
        scratch += z_group_scr + g_group_scr
        kernel = functools.partial(_W_leg_kernel, plan, T)
    elif out_leg == "Wr":
        out_shape = tuple(
            jax.ShapeDtypeStruct((p * plan.rad_hp, w), jnp.float32)
            for p, _, w in plan.rad_ranges
        )
        out_specs = tuple(
            _shared_spec((p * plan.rad_hp, w)) for p, _, w in plan.rad_ranges
        )
        scratch = [x_al_scr, w_al_scr] + z_group_scr + g_group_scr
        kernel = functools.partial(_Wr_leg_kernel, plan, T)
    elif out_leg == "out":
        out_shape = jax.ShapeDtypeStruct((E, plan.d_out), dtype)
        out_specs = _edge_spec(T, plan.d_out)
        scratch = [x_al_scr]
        if rad or not plan.fold_shared:
            scratch.append(w_al_scr)
        scratch += z_group_scr
        # reuse the first-order forward kernel body (save_z=False)
        kernel = functools.partial(_fwd_kernel, plan, T, False)
    elif rad:  # 'x' / 'sh' / 'h'
        out_shape = jax.ShapeDtypeStruct((E, _leg_dim(plan, out_leg)), dtype)
        out_specs = _edge_spec(T, _leg_dim(plan, out_leg))
        scratch = []
        if out_leg != "x":
            scratch.append(x_al_scr)
        scratch.append(w_al_scr)  # w fill (x/sh) or the dw buffer (h)
        scratch += z_group_scr + g_group_scr
        kernel = functools.partial(_edge_leg_kernel_rad, plan, T, out_leg)
    else:
        out_shape = jax.ShapeDtypeStruct((E, _leg_dim(plan, out_leg)), dtype)
        out_specs = _edge_spec(T, _leg_dim(plan, out_leg))
        scratch = []
        if out_leg != "x":
            scratch.append(x_al_scr)
        if not plan.fold_shared and out_leg != "w":
            scratch.append(w_al_scr)
        scratch += z_group_scr + g_group_scr
        kernel = functools.partial(_edge_leg_kernel, plan, T, out_leg)

    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // T,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(n, *operands)


def _bwd3_pallas(plan: DTPLinPlan, tile: int, interpret: bool, n, *operands):
    """(g, x, sh, [w|h], [Wr*], W*) -> (dx, dsh[, dw|dh]) via the combined
    kernel.

    Carries THREE edge outputs plus both align scratches, so its footprint
    exceeds any single-leg kernel: shrink the tile by its own width estimate
    (L3 at tile 128 measured an 18.52M scoped-vmem OOM; 64 fits)."""
    nG = len(plan.groups)
    rad = plan.radial_fold is not None
    nP = len(plan.rad_ranges) if rad else 0
    T = _t_eff(tile, operands[0].dtype)
    zw = sum(g.ir.dim * g.fan_pad for g in plan.groups)
    zc = sum(g.ir.dim * g.cols for g in plan.groups)
    d_we = plan.rad_hp if rad else plan.d_w  # per-edge w-side operand width
    width3 = (plan.d_x_al + plan.d_w_al + plan.d_out
              + 2 * (plan.d_x + plan.d_sh + d_we) + zw + zc)
    while T > 32 and T * width3 * 4 > 11 * 2**20:
        T //= 2
    E = operands[0].shape[0]
    dtype = operands[0].dtype
    in_specs = [
        _edge_spec(T, plan.d_out),
        _edge_spec(T, plan.d_x),
        _edge_spec(T, plan.d_sh),
    ]
    n_edge_in = 3
    if rad:
        in_specs.append(_edge_spec(T, plan.rad_hp))
        n_edge_in = 4
    elif not plan.fold_shared:
        in_specs.append(_edge_spec(T, plan.d_w))
        n_edge_in = 4
    in_specs += [_shared_spec(W.shape) for W in operands[n_edge_in:]]
    out_shape = [
        jax.ShapeDtypeStruct((E, plan.d_x), dtype),
        jax.ShapeDtypeStruct((E, plan.d_sh), dtype),
    ]
    out_specs = [_edge_spec(T, plan.d_x), _edge_spec(T, plan.d_sh)]
    if rad:
        out_shape.append(jax.ShapeDtypeStruct((E, plan.rad_hp), dtype))
        out_specs.append(_edge_spec(T, plan.rad_hp))
    elif not plan.fold_shared:
        out_shape.append(jax.ShapeDtypeStruct((E, plan.d_w), dtype))
        out_specs.append(_edge_spec(T, plan.d_w))
    scratch = [pltpu.VMEM((T, plan.d_x_al), dtype)]
    if rad or not plan.fold_shared:
        scratch.append(pltpu.VMEM((T, plan.d_w_al), dtype))
    scratch += [pltpu.VMEM((g.ir.dim * T, g.fan_pad), dtype) for g in plan.groups]
    scratch += [pltpu.VMEM((g.ir.dim * T, g.cols), dtype) for g in plan.groups]
    return pl.pallas_call(
        functools.partial(_bwd3_kernel, plan, T),
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


# ------------------------------------------------------------------ primitives
_leg_p = jex_core.Primitive("equiformer_dtplin_leg")  # out/x/sh/w/h variants
_legW_p = jex_core.Primitive("equiformer_dtplin_legW")
_legW_p.multiple_results = True
_legWr_p = jex_core.Primitive("equiformer_dtplin_legWr")  # radial-fold dWr
_legWr_p.multiple_results = True
# consolidated edge-tangent pair:
#   F_edge3(x0, sh0, [w0], W0*, dx, dsh, [dw]) =
#     F(dx, sh0, [w0], W0) + F(x0, dsh, [w0], W0) [+ F(x0, sh0, dw, W0)]
#   (jointly multilinear — every operand appears linearly in the sum), and
#   its transpose wrt the tangent block, one fused kernel instead of three:
#   F_bwd3(g, x0, sh0, [w0], W0*) -> (dx_ct, dsh_ct[, dw_ct])
_edge3_p = jex_core.Primitive("equiformer_dtplin_edge3")
_bwd3_p = jex_core.Primitive("equiformer_dtplin_bwd3")
_bwd3_p.multiple_results = True


def _leg_abstract(n, *ops, plan_id, out_leg, interpret):
    plan, _ = _PLANS[plan_id]
    E = ops[0].shape[0]
    return jax.core.ShapedArray((E, _leg_dim(plan, out_leg)), ops[0].dtype)


def _legW_abstract(n, *ops, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    return tuple(
        jax.core.ShapedArray((g.fan_pad, g.cols), jnp.float32)
        for g in plan.groups
    )


def _legWr_abstract(n, *ops, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    return tuple(
        jax.core.ShapedArray((p * plan.rad_hp, w), jnp.float32)
        for p, _, w in plan.rad_ranges
    )


_leg_p.def_abstract_eval(_leg_abstract)
_legW_p.def_abstract_eval(_legW_abstract)
_legWr_p.def_abstract_eval(_legWr_abstract)


def _leg_impl(n, *ops, plan_id, out_leg, interpret):
    plan, tile = _PLANS[plan_id]
    return _leg_call(plan, tile, out_leg, interpret, n, *ops)


def _legW_impl(n, *ops, plan_id, interpret):
    plan, tile = _PLANS[plan_id]
    return _leg_call(plan, tile, "W", interpret, n, *ops)


def _legWr_impl(n, *ops, plan_id, interpret):
    plan, tile = _PLANS[plan_id]
    return _leg_call(plan, tile, "Wr", interpret, n, *ops)


_leg_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _leg_p))
_legW_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _legW_p))
_legWr_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _legWr_p))
mlir.register_lowering(_leg_p, mlir.lower_fun(_leg_impl, multiple_results=False))
mlir.register_lowering(_legW_p, mlir.lower_fun(_legW_impl, multiple_results=True))
mlir.register_lowering(_legWr_p, mlir.lower_fun(_legWr_impl, multiple_results=True))


def _bind(plan_id, out_leg, interpret, n, *ops):
    if out_leg == "W":
        return _legW_p.bind(n, *ops, plan_id=plan_id, interpret=interpret)
    if out_leg == "Wr":
        return _legWr_p.bind(n, *ops, plan_id=plan_id, interpret=interpret)
    return _leg_p.bind(n, *ops, plan_id=plan_id, out_leg=out_leg,
                       interpret=interpret)


# F_edge3 operand layout (past n): primal legs in canonical order (x0, sh0,
# [w0], W0*), then tangent legs (dx, dsh[, dw]).
def _edge3_abstract(n, *ops, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    return jax.core.ShapedArray((ops[0].shape[0], plan.d_out), ops[0].dtype)


def _edge3_split(plan, ops):
    nG = len(plan.groups)
    nP = len(plan.rad_ranges) if plan.radial_fold is not None else 0
    ne = len(_edge_legs(plan))  # edge primals / tangents
    prim_edge = ops[:ne]
    shared = ops[ne : ne + nP + nG]  # Wr* then W*
    tans = ops[ne + nP + nG :]
    assert len(tans) == ne
    return prim_edge, shared, tans


def _edge3_impl(n, *ops, plan_id, interpret):
    plan, tile = _PLANS[plan_id]
    prim, Ws, tans = _edge3_split(plan, ops)
    out = None
    for i, t in enumerate(tans):
        sub = list(prim)
        sub[i] = t
        o = _leg_call(plan, tile, "out", interpret, n, *sub, *Ws)
        out = o if out is None else out + o
    return out


_edge3_p.def_abstract_eval(_edge3_abstract)
_edge3_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _edge3_p))
mlir.register_lowering(_edge3_p, mlir.lower_fun(_edge3_impl, multiple_results=False))


def _bwd3_abstract(n, *ops, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    E = ops[0].shape[0]
    dt = ops[0].dtype
    shapes = [
        jax.core.ShapedArray((E, plan.d_x), dt),
        jax.core.ShapedArray((E, plan.d_sh), dt),
    ]
    if plan.radial_fold is not None:
        shapes.append(jax.core.ShapedArray((E, plan.rad_hp), dt))
    elif not plan.fold_shared:
        shapes.append(jax.core.ShapedArray((E, plan.d_w), dt))
    return tuple(shapes)


def _bwd3_impl(n, *ops, plan_id, interpret):
    plan, tile = _PLANS[plan_id]
    return _bwd3_pallas(plan, tile, interpret, n, *ops)


_bwd3_p.def_abstract_eval(_bwd3_abstract)
_bwd3_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _bwd3_p))
mlir.register_lowering(_bwd3_p, mlir.lower_fun(_bwd3_impl, multiple_results=True))


# --------------------------------------------------------------------- AD: JVP
def _op_slots(plan, out_leg):
    """Operand index ranges (past n) per leg: [(leg, start, stop)]."""
    nG = len(plan.groups)
    legs = _legs_of(plan, out_leg)
    slots, i = [], 0
    for leg in legs:
        if leg == "W":
            width = nG
        elif leg == "Wr":
            width = len(plan.rad_ranges)
        else:
            width = 1
        slots.append((leg, i, i + width))
        i += width
    return slots, i


def _edge3_enabled() -> bool:
    """Grouped edge-tangent transpose (one F_bwd3 kernel instead of 2-3 leg
    kernels); on by default, EQUIFORMER_TPU_EDGE3=0 for A/B benchmarking."""
    import os

    return os.environ.get("EQUIFORMER_TPU_EDGE3", "1") not in ("0", "false")


def _jvp_common(out_leg, primals, tangents, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    n, ops = primals[0], list(primals[1:])
    tans = list(tangents[1:])
    out = _bind(plan_id, out_leg, interpret, n, *ops)
    slots, width = _op_slots(plan, out_leg)
    assert width == len(ops)
    tan_out = None

    def add(a, b):
        if a is None:
            return b
        if out_leg in ("W", "Wr"):
            return tuple(x + y for x, y in zip(a, b))
        return a + b

    handled = set()
    if out_leg == "out" and _edge3_enabled():
        # group the edge-leg tangents (x, sh, w|h) into ONE F_edge3 bind when
        # at least two are live: its transpose is a single fused kernel (one
        # dz MXU phase) instead of 2-3 separate leg kernels — the dominant
        # saving in the force pass, where x, sh AND w all carry pos tangents
        edge_slots = [(leg, s, e) for leg, s, e in slots
                      if leg not in ("W", "Wr")]
        live = [
            (leg, s) for leg, s, e in edge_slots
            if type(tans[s]) is not ad.Zero
        ]
        if len(live) >= 2:
            ne = len(edge_slots)
            shared = ops[ne:]  # Wr* then W* in canonical order
            edge_prims = [ops[s] for _, s, _ in edge_slots]
            edge_tans = [
                jnp.zeros(ops[s].shape, ops[s].dtype)
                if type(tans[s]) is ad.Zero else tans[s]
                for _, s, _ in edge_slots
            ]
            tan_out = add(
                tan_out,
                _edge3_p.bind(n, *edge_prims, *shared, *edge_tans,
                              plan_id=plan_id, interpret=interpret),
            )
            handled = {leg for leg, _, _ in edge_slots}

    for leg, s, e in slots:
        if leg in handled:
            continue
        ts = tans[s:e]
        if all(type(t) is ad.Zero for t in ts):
            continue
        sub = list(ops)
        sub[s:e] = [
            jnp.zeros(op.shape, op.dtype) if type(t) is ad.Zero else t
            for t, op in zip(ts, ops[s:e])
        ]
        tan_out = add(tan_out, _bind(plan_id, out_leg, interpret, n, *sub))
    if tan_out is None:
        if out_leg in ("W", "Wr"):
            tan_out = tuple(ad.Zero.from_primal_value(o) for o in out)
        else:
            tan_out = ad.Zero.from_primal_value(out)
    return out, tan_out


def _leg_jvp(primals, tangents, *, plan_id, out_leg, interpret):
    return _jvp_common(out_leg, primals, tangents, plan_id, interpret)


def _legW_jvp(primals, tangents, *, plan_id, interpret):
    return _jvp_common("W", primals, tangents, plan_id, interpret)


def _legWr_jvp(primals, tangents, *, plan_id, interpret):
    return _jvp_common("Wr", primals, tangents, plan_id, interpret)


ad.primitive_jvps[_leg_p] = _leg_jvp
ad.primitive_jvps[_legW_p] = _legW_jvp
ad.primitive_jvps[_legWr_p] = _legWr_jvp


def _edge3_jvp(primals, tangents, *, plan_id, interpret):
    # F_edge3 is jointly multilinear: every operand appears linearly in the
    # sum, so the tangent is the same bind with one slot substituted per term
    n, ops = primals[0], list(primals[1:])
    tans = list(tangents[1:])
    out = _edge3_p.bind(n, *ops, plan_id=plan_id, interpret=interpret)
    tan_out = None
    for i, t in enumerate(tans):
        if type(t) is ad.Zero:
            continue
        sub = list(ops)
        sub[i] = t
        term = _edge3_p.bind(n, *sub, plan_id=plan_id, interpret=interpret)
        tan_out = term if tan_out is None else tan_out + term
    if tan_out is None:
        tan_out = ad.Zero.from_primal_value(out)
    return out, tan_out


def _edge3_transpose(ct, n, *ops, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    prim, shared, tans = _edge3_split(plan, ops)
    assert not any(ad.is_undefined_primal(o) for o in (*prim, *shared)), (
        "F_edge3 primal legs are residuals; only the tangent block transposes"
    )
    if type(ct) is ad.Zero:
        return [None] * (1 + len(ops))
    outs = _bwd3_p.bind(n, ct, *prim, *shared, plan_id=plan_id,
                        interpret=interpret)
    res = [None] * (1 + len(prim) + len(shared))
    for i, t in enumerate(tans):
        res.append(outs[i] if ad.is_undefined_primal(t) else None)
    return res


def _bwd3_jvp(primals, tangents, *, plan_id, interpret):
    """Per-output tangents via leg binds: dx = F_x(g, sh, [w], W) etc. — each
    output is multilinear in its own dependency set (dx is degree-0 in x, so
    whole-primitive substitution would be wrong)."""
    plan, _ = _PLANS[plan_id]
    n, ops = primals[0], list(primals[1:])
    tans = list(tangents[1:])
    outs = _bwd3_p.bind(n, *ops, plan_id=plan_id, interpret=interpret)
    nG = len(plan.groups)
    if plan.fold_shared:
        g, x, sh = ops[:3]
        Ws = ops[3:]
        tg, tx, tsh = tans[:3]
        tWs = tans[3:]
        deps = {  # output -> (leg, operand list, tangent list)
            0: ("x", [g, sh, *Ws], [tg, tsh] + tWs, [0, 1]),
            1: ("sh", [g, x, *Ws], [tg, tx] + tWs, [0, 1]),
        }
    elif plan.radial_fold is not None:
        g, x, sh, h = ops[:4]
        shared = ops[4:]  # Wr* + W* in canonical order
        tg, tx, tsh, th = tans[:4]
        tshared = tans[4:]
        deps = {
            0: ("x", [g, sh, h, *shared], [tg, tsh, th] + tshared, None),
            1: ("sh", [g, x, h, *shared], [tg, tx, th] + tshared, None),
            2: ("h", [g, x, sh, *shared], [tg, tx, tsh] + tshared, None),
        }
    else:
        g, x, sh, w = ops[:4]
        Ws = ops[4:]
        tg, tx, tsh, tw = tans[:4]
        tWs = tans[4:]
        deps = {
            0: ("x", [g, sh, w, *Ws], [tg, tsh, tw] + tWs, [0, 1, 2]),
            1: ("sh", [g, x, w, *Ws], [tg, tx, tw] + tWs, [0, 1, 2]),
            2: ("w", [g, x, sh, *Ws], [tg, tx, tsh] + tWs, [0, 1, 2]),
        }
    tan_outs = []
    for oi, (leg, lops, ltans, _) in deps.items():
        acc = None
        for i, t in enumerate(ltans):
            if type(t) is ad.Zero:
                continue
            sub = list(lops)
            sub[i] = t
            term = _bind(plan_id, leg, interpret, n, *sub)
            acc = term if acc is None else acc + term
        tan_outs.append(
            acc if acc is not None else ad.Zero.from_primal_value(outs[oi])
        )
    return outs, tuple(tan_outs)


def _bwd3_transpose(ct, n, *ops, plan_id, interpret):
    raise NotImplementedError(
        "F_bwd3 appears only as a primal (residual) computation; reverse "
        "passes differentiate it through its JVP (leg binds), which have "
        "their own transposes.  Hitting this means a >2nd-order reverse "
        "composed it linearly — use the per-leg primitives instead."
    )


ad.primitive_jvps[_edge3_p] = _edge3_jvp
ad.primitive_jvps[_bwd3_p] = _bwd3_jvp
ad.primitive_transposes[_edge3_p] = _edge3_transpose
ad.primitive_transposes[_bwd3_p] = _bwd3_transpose


# --------------------------------------------------------------- AD: transpose
def _transpose_common(out_leg, ct, n, ops, plan_id, interpret):
    plan, _ = _PLANS[plan_id]
    slots, _ = _op_slots(plan, out_leg)
    undef = [
        (leg, s, e) for leg, s, e in slots
        if any(ad.is_undefined_primal(o) for o in ops[s:e])
    ]
    assert len(undef) == 1, f"one undefined leg expected, got {undef}"
    t_leg, us, ue = undef[0]

    # instantiate the output cotangent (the old out leg's operand value)
    if out_leg == "W":
        ct_ops = [
            jnp.zeros((g.fan_pad, g.cols), jnp.float32)
            if type(c) is ad.Zero else c
            for c, g in zip(ct, plan.groups)
        ]
    elif out_leg == "Wr":
        ct_ops = [
            jnp.zeros((p * plan.rad_hp, w), jnp.float32)
            if type(c) is ad.Zero else c
            for c, (p, _, w) in zip(ct, plan.rad_ranges)
        ]
    else:
        if type(ct) is ad.Zero:
            return [None] * (1 + len(ops))
        ct_ops = [ct]

    # assemble the t_leg-variant's operands in canonical order
    values = {out_leg: ct_ops}
    for leg, s, e in slots:
        if leg != t_leg:
            values[leg] = list(ops[s:e])
    new_ops = []
    for leg in _legs_of(plan, t_leg):
        new_ops += values[leg]
    res = _bind(plan_id, t_leg, interpret, n, *new_ops)

    # dW/dWr come back fp32; cast to the undefined primal's dtype
    if t_leg in ("W", "Wr"):
        res = [
            r.astype(o.aval.dtype) for r, o in zip(res, ops[us:ue])
        ]
    else:
        res = [res.astype(ops[us].aval.dtype)]
    out = [None]  # n
    for leg, s, e in slots:
        if leg == t_leg:
            out += res
        else:
            out += [None] * (e - s)
    return out


def _leg_transpose(ct, n, *ops, plan_id, out_leg, interpret):
    return _transpose_common(out_leg, ct, n, ops, plan_id, interpret)


def _legW_transpose(ct, n, *ops, plan_id, interpret):
    return _transpose_common("W", ct, n, ops, plan_id, interpret)


def _legWr_transpose(ct, n, *ops, plan_id, interpret):
    return _transpose_common("Wr", ct, n, ops, plan_id, interpret)


ad.primitive_transposes[_leg_p] = _leg_transpose
ad.primitive_transposes[_legW_p] = _legW_transpose
ad.primitive_transposes[_legWr_p] = _legWr_transpose


# ------------------------------------------------------------------ public op
def auto_tile(plan: DTPLinPlan, start: int = 128,
              budget: int = 8 * 2**20) -> int:
    """Shrink the edge tile until the VMEM scratch estimate fits (the L3
    plans' z is ~9408 wide; same calibration as PallasDTP's auto-tile).

    ``budget`` anchors: the HO kernels use the 8M default; the first-order
    kernel passes 9M, calibrated so the measured-good QM9 tiles survive
    (folded-shared L2 at 256 = 8.15M estimate, on-chip OK) while the L3
    external plan at 128 (10.7M estimate; observed 16.43M scoped-vmem OOM)
    shrinks to 64."""
    tile = start
    zw = sum(g.ir.dim * (g.fan_pad + g.cols) for g in plan.groups)
    d_we = plan.rad_hp if plan.radial_fold is not None else plan.d_w
    width = plan.d_x_al + plan.d_w_al + plan.d_out + plan.d_x + d_we + zw
    # tile-independent VMEM: the packed radial Wr blocks ride along as whole-
    # array operands (double-buffered bf16 = the same x4 calibration factor).
    # Anchor: the folded L3 plan at tile 128 measured a 22.47M scoped-vmem
    # OOM — est 9.64M + 5.25M fixed must push it past an 11M budget to 64.
    fixed = 0
    if plan.radial_fold is not None:
        fixed = sum(p * plan.rad_hp * w for (p, _, w) in plan.rad_ranges)
    while tile > 32 and tile * width * 4 + fixed * 4 > budget:
        tile //= 2
    return tile


def make_fused_dtp_lin_ho(plan: DTPLinPlan, tile: Optional[int] = None,
                          interpret: Optional[bool] = None):
    """Arbitrary-order fused op with the make_fused_dtp_lin call signature:
    ``call(x, sh, w, Ws, n_edges=None) -> out_flat``.

    For radial-folded plans, ``w`` is the tuple ``(h, Wrs)``: the radial
    MLP's last hidden activation ``h [E, rad_hd]`` and the packed final
    weights from ``plan.pack_radial(Wr, offset)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile is None:
        tile = auto_tile(plan, plan.tile)
    T = tile
    pid = _intern_plan(plan, T)

    def call(x, sh, w, Ws, n_edges=None):
        E = x.shape[0]
        pad = (-E) % _t_eff(T, x.dtype)
        if plan.fold_shared:
            Ws = plan.scale_shared_weights(w.astype(x.dtype), Ws)
        rad = plan.radial_fold is not None
        if rad:
            h, Wrs = w
            h = plan.pad_h(h.astype(x.dtype))
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            sh = jnp.pad(sh, ((0, pad), (0, 0)))
            if rad:
                h = jnp.pad(h, ((0, pad), (0, 0)))
            elif not plan.fold_shared:
                w = jnp.pad(w, ((0, pad), (0, 0)))
        n = _n_scalar(n_edges, E)
        if rad:
            ops = (x, sh, h) + tuple(Wrs)
        elif plan.fold_shared:
            ops = (x, sh)
        else:
            ops = (x, sh, w)
        out = _bind(pid, "out", interpret, n, *ops, *Ws)
        return out[:E] if pad else out

    return call
