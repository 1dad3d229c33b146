"""Fused depthwise-TP + per-irrep linear Pallas kernel (the round-2 hot op).

Replaces the composition ``lin(dtp(x, sh, w))`` — the reference's
DepthwiseTensorProduct followed by LinearRS inside SeparableFCTP
(/root/reference/nets/graph_attention_transformer.py:186-248) — with one
kernel in which the DTP's *unsimplified* output ``z`` (3136 wide for the
flagship) never leaves VMEM:

  1. FMA phase (VPU): the sparse Clebsch-Gordan contraction is unrolled into
     lane FMAs exactly as in dtp_pallas.py, but every operand slice lives in a
     **128-lane-aligned scratch layout** (one 128-lane slot per (block,
     component)); the unaligned->aligned relayout happens once per tile
     instead of once per term.  Measured on v5e: alignment alone takes the
     forward from 3.7ms to 1.4ms at flagship shapes (scripts/kbench.py).
  2. Matmul phase (MXU): z is accumulated in per-irrep-group scratch
     ``[(2l+1)*T, fan_pad]`` whose fan columns are the (zero-padded) per-path
     slots; one ``jnp.dot`` per group against the packed linear weight
     ``[fan_pad, cols]`` applies every linear head reading z (SeparableFCTP's
     ``lin`` and, in the nonlinear-message path, ``sep_alpha``) in one pass.

The backward is a single fused kernel with the same structure: ``dz`` comes
off the MXU as ``g @ W^T``, ``dW = z^T @ g`` accumulates across the edge grid
in an fp32 output block, and dx/dw/dsh are the trilinear transposes of the
FMA phase.  z is either *saved* from the forward (``save_z=True``, the
default: the forward emits each group's z block as an extra output and the
backward reads it back — round-2 attribution showed the backward was
align/recompute-bound, and the HBM round trip is cheaper on v5e) or
*recomputed* in VMEM (``save_z=False``, lower memory).  With saved z the
folded shared-weight backward with ``needs_dsh=False`` needs no x operand at
all — no align phase, no FMA phase, just the two MXU dots plus the dx
transpose.  First-order AD only (custom_vjp); the arbitrary-order
primitive-composed path in dtp_pallas.py remains for force models.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.irreps import Irreps
from ..core.tensor_product import TensorProduct
from .dtp_pallas import _plan_terms

LANE = 128


def _lane_pack_enabled() -> bool:
    import os

    return os.environ.get("EQUIFORMER_TPU_LANE_PACK", "1") not in ("0", "false")


class _Group(NamedTuple):
    ir: object  # Irrep
    blocks: Tuple[int, ...]  # plan.irreps_out block indices
    fan_slot: dict  # block index -> fan column offset (multiple of 128)
    fan_pad: int
    cols: int  # total output columns (all heads)
    out_off: int  # offset of this group in the fused flat output


class DTPLinPlan:
    """Static metadata for the fused DTP+linear.

    ``tp`` must be a depthwise 'uvu' plan with mul-1 second input (the SH).
    ``head_irreps`` lists, per linear head, the head's output irreps; every
    head reads the full unsimplified ``tp.irreps_out`` exactly like
    ``IrrepsLinear(tp.irreps_out, head_irreps[h])`` (nn/linear.py).
    """

    def __init__(
        self,
        tp: TensorProduct,
        head_irreps: Sequence[Irreps],
        fold_rescale: bool = True,
        shared_weights: bool = False,
        needs_dsh: bool = True,
        tile: int = 128,
        radial_fold: Optional[int] = None,
    ):
        """``radial_fold`` (the radial MLP's last hidden width, e.g. 64) folds
        the radial profile's FINAL LINEAR LAYER into the kernel: the per-edge
        operand becomes the hidden activation ``h`` (``rad_hp``-wide, vs
        ``weight_numel``-wide ``w``) and the kernel computes the aligned
        weight scratch as MXU dots ``h_packed @ Wr_block`` against packed
        radial weights (``pack_radial``) — replacing both the XLA-side
        ``[E, weight_numel]`` materialization (reference radial_func.py:9-50
        applied per edge, nets/graph_attention_transformer.py:490) and the
        per-slot w align copies.  w slots are grouped by pack factor so each
        group fills with ONE dot."""
        self.tp = tp
        self.shared_weights = shared_weights
        # the slot layout gives each (block, component, 128-lane sub-slot) one
        # slot; blocks with mul > 128 (OC20's 256x0e,
        # /root/reference/nets/graph_attention_transformer_oc20.py:84) are
        # split into ceil(mul/128) sub-slots whose x/w offsets and z fan
        # columns shift together — for uvu the in1/weight/out muls agree, so
        # every FMA term splits uniformly across the sub-slots
        # sh is pure geometry (edge vectors); models that never differentiate
        # wrt positions (QM9/OC20 - exactly the users of this first-order
        # path) can skip the dsh transpose entirely and take a zero cotangent
        self.needs_dsh = needs_dsh
        self.tile = tile
        self.head_irreps = [Irreps(h) for h in head_irreps]
        terms = _plan_terms(tp, fold_rescale)

        # ---- lane packing: a block with mul < 128 occupies only mul of a
        # slot's 128 lanes; pack p = 128//mul row-groups of edges side by
        # side so every FMA runs with full lanes (p capped so each packed
        # row-group keeps >= 16 sublanes for bf16 tiling)
        def _pack(mul):
            if not _lane_pack_enabled():
                return 1
            if mul >= LANE or LANE % mul != 0:
                return 1
            p = LANE // mul
            while p > 1 and tile // p < 16:
                p //= 2
            return p

        # ---- 128-aligned slot layouts for x and w: (lane offset, mul, pack);
        # mul > 128 blocks contribute one entry per 128-lane sub-slot, keyed
        # at the sub-slot's absolute offset in the flat operand
        self.x_slots = {}
        acc = 0
        in_slices = tp.irreps_in1.slices()
        for bi, (mul, ir) in enumerate(tp.irreps_in1):
            for c in range(ir.dim):
                base = in_slices[bi].start + c * mul
                for s in range(0, mul, LANE):
                    m = min(LANE, mul - s)
                    self.x_slots[base + s] = (acc, m, _pack(m))
                    acc += LANE
        self.d_x_al = acc
        self.radial_fold = radial_fold if not shared_weights else None
        sub_slots = []  # (weight offset, mul, pack)
        for ii, ins in enumerate(tp.instructions):
            mul = tp.irreps_in1[ins.i_in1].mul
            base = tp._offsets[ii]
            for s in range(0, mul, LANE):
                m = min(LANE, mul - s)
                sub_slots.append((base + s, m, _pack(m)))
        if self.radial_fold is not None:
            # group w slots by pack factor: each group's aligned weights then
            # fill with a single MXU dot in _radial_w_fill
            sub_slots.sort(key=lambda t: t[2])
        self.w_slots = {}
        acc = 0
        for off, m, p in sub_slots:
            self.w_slots[off] = (acc, m, p)
            acc += LANE
        self.d_w_al = acc
        if self.radial_fold is not None:
            self.rad_hd = int(radial_fold)
            assert self.rad_hd < LANE, "radial hidden must fit one lane slot"
            self.rad_hp = LANE  # padded per-edge h width ([h, 1, 0...])
            self.rad_ranges = []  # (pack, lane start, lane width)
            for off, m, p in sub_slots:
                slot = self.w_slots[off][0]
                if not self.rad_ranges or self.rad_ranges[-1][0] != p:
                    self.rad_ranges.append((p, slot, LANE))
                else:
                    pp, s0, w0 = self.rad_ranges[-1]
                    self.rad_ranges[-1] = (pp, s0, w0 + LANE)
        self.d_x = tp.irreps_in1.dim
        self.d_sh = tp.irreps_in2.dim
        self.d_w = tp.weight_numel

        # ---- irrep groups of the unsimplified z
        out_slices = tp.irreps_out.slices()
        order: List = []
        by_ir = {}
        for bo, (mul, ir) in enumerate(tp.irreps_out):
            if ir not in by_ir:
                by_ir[ir] = []
                order.append(ir)
            by_ir[ir].append(bo)

        # per head, per target block of matching irrep: column segments
        # head_cols[h] = list of (target_block_index, ir, col_start_in_group, mul_out)
        self.head_cols: List[List[Tuple[int, object, int, int]]] = [
            [] for _ in self.head_irreps
        ]
        group_cols = {ir: 0 for ir in order}
        for h, hirr in enumerate(self.head_irreps):
            for ti, (mul_out, ir_out) in enumerate(hirr):
                if ir_out not in group_cols:
                    # a head output irrep absent from z: IrrepsLinear emits
                    # zeros for it; handled at assembly time
                    self.head_cols[h].append((ti, ir_out, -1, mul_out))
                    continue
                self.head_cols[h].append((ti, ir_out, group_cols[ir_out], mul_out))
                group_cols[ir_out] += mul_out

        self.groups: List[_Group] = []
        out_off = 0
        for ir in order:
            cols = group_cols[ir]
            if cols == 0:
                continue  # dead z irrep: no head consumes it -> skip its FMAs
            bos = tuple(by_ir[ir])
            # compact fan layout: lane-packed blocks (whose z writes are
            # exact [fc:fc+mul] sub-slices) sit back-to-back at their real
            # mul instead of one 128-lane slot each — halves the MXU K dim
            # and the W VMEM; unpacked blocks with mul<128 still get a full
            # LANE slot because their z write covers LANE lanes (zero pad).
            # mul > 128 blocks span contiguous full-LANE sub-slots (only a
            # packed tail shrinks), so sub s writes fan cols fan_slot[bo]+s
            # and pack_weights' single contiguous row update stays valid.
            def _fan_width(m):
                full, tail = divmod(m, LANE)
                w = full * LANE
                if tail:
                    w += tail if _pack(tail) > 1 else LANE
                return w

            fan_slot = {}
            acc = 0
            for bo in bos:
                fan_slot[bo] = acc
                acc += _fan_width(tp.irreps_out[bo].mul)
            fan_pad = ((acc + LANE - 1) // LANE) * LANE
            g = _Group(ir, bos, fan_slot, fan_pad, cols, out_off)
            self.groups.append(g)
            out_off += ir.dim * cols
        self.d_out = out_off

        # ---- map each FMA term's z offset -> (group idx, k, fan col)
        live_blocks = {}
        for gi, g in enumerate(self.groups):
            for bo in g.blocks:
                live_blocks[bo] = gi
        zmap = {}
        for bo, (mul, ir) in enumerate(tp.irreps_out):
            if bo not in live_blocks:
                continue
            gi = live_blocks[bo]
            start = out_slices[bo].start
            for c in range(ir.dim):
                for s in range(0, mul, LANE):
                    zmap[start + c * mul + s] = (
                        gi, c, self.groups[gi].fan_slot[bo] + s
                    )

        # split terms whose block mul exceeds a lane: for uvu the x, w, and z
        # offsets all shift by the same sub-slot stride
        split_terms = []
        for t in terms:
            if t.mul <= LANE:
                split_terms.append(t)
                continue
            for s in range(0, t.mul, LANE):
                split_terms.append(
                    t._replace(
                        a_off=t.a_off + s,
                        b_off=t.b_off + s,
                        out_off=t.out_off + s,
                        mul=min(LANE, t.mul - s),
                    )
                )
        kept = []
        for t in split_terms:
            if t.out_off in zmap:
                kept.append((t, zmap[t.out_off]))
        self._terms = tuple(kept)  # [(Term, (gi, k, fan_col))]

        # w slots whose instruction only feeds dead z irreps never appear in
        # a term: radial-folded backwards must zero the dw scratch for them
        # (their packed Wr columns are NOT zero, so garbage would leak into dh)
        covered_w = {t.b_off for t, _ in kept}
        self.rad_has_dead_w = any(off not in covered_w for off in self.w_slots)

        # assert full coverage: every (gi, k, fan_col) slot written >= once
        written = {(gi, k, fc) for _, (gi, k, fc) in self._terms}
        for gi, g in enumerate(self.groups):
            for bo in g.blocks:
                mul = tp.irreps_out[bo].mul
                for c in range(g.ir.dim):
                    for s in range(0, mul, LANE):
                        assert (gi, c, g.fan_slot[bo] + s) in written, (
                            "z slot never written; zero-init would be required"
                        )

        # ---- shared-weight folding: when weights are shared across edges the
        # per-path weight is a per-fan-column constant, so z@(diag(w_rows) W)
        # == (z*w_cols)@W — fold w into the packed linear weight OUTSIDE the
        # kernel (differentiable XLA row-scaling).  The kernel then never
        # sees w: no w aligns, no per-slot FMA in fwd, no dw transpose in bwd.
        self.fold_shared = shared_weights
        if shared_weights:
            scale = {}
            for t, (gi, k, fc) in self._terms:
                _, mul, _ = self.x_slots[t.a_off]
                prev = scale.get((gi, fc))
                assert prev is None or prev == (t.b_off, mul), (
                    "fan column fed by multiple weight paths; cannot fold"
                )
                scale[(gi, fc)] = (t.b_off, mul)
            self.w_row_map = [
                sorted(
                    (fc, off, mul)
                    for (g2, fc), (off, mul) in scale.items()
                    if g2 == gi
                )
                for gi in range(len(self.groups))
            ]

    def scale_shared_weights(self, w, Ws):
        """Fold the shared per-path weight vector into the packed linear
        weights (rows of each group's W scaled by the matching w entries).
        Runs in XLA outside the kernel, so dw and dW chain automatically."""
        w = w.reshape(-1)
        out = []
        for gi, W in enumerate(Ws):
            rows = jnp.zeros((self.groups[gi].fan_pad,), W.dtype)
            for fc, off, mul in self.w_row_map[gi]:
                rows = jax.lax.dynamic_update_slice(
                    rows, w[off : off + mul].astype(W.dtype), (fc,)
                )
            out.append(W * rows[:, None])
        return out

    # ------------------------------------------------------- radial folding
    def pack_radial(self, Wr: jnp.ndarray, offset: Optional[jnp.ndarray]):
        """Pack the radial profile's final linear ``Wr [rad_hd, weight_numel]``
        (+ optional ``offset [weight_numel]``, the reference RadialProfile's
        separate bias, radial_func.py:39-41) into one block matrix per pack
        group: ``M_p [p*rad_hp, group width]`` such that the kernel's
        ``h_packed @ M_p`` emits the aligned+packed weight layout directly
        (rows g*rad_hp+: the g-th packed row-group's columns; row offset
        rad_hd carries the offset, matching h's appended ones column).
        Runs in XLA, so dWr/doffset chain through its transpose."""
        hd, hp = self.rad_hd, self.rad_hp
        outs = []
        for p, start, width in self.rad_ranges:
            M = jnp.zeros((p * hp, width), Wr.dtype)
            for off, (slot, mul, sp) in self.w_slots.items():
                if not (start <= slot < start + width):
                    continue
                col0 = slot - start
                for g in range(sp):
                    M = jax.lax.dynamic_update_slice(
                        M, Wr[:, off : off + mul], (g * hp, col0 + g * mul)
                    )
                    if offset is not None:
                        M = jax.lax.dynamic_update_slice(
                            M,
                            offset[None, off : off + mul].astype(M.dtype),
                            (g * hp + hd, col0 + g * mul),
                        )
            outs.append(M)
        return outs

    def pad_h(self, h: jnp.ndarray) -> jnp.ndarray:
        """[E, rad_hd] hidden -> [E, rad_hp] kernel operand [h, 1, 0...]."""
        E = h.shape[0]
        ones = jnp.ones((E, 1), h.dtype)
        return jnp.pad(
            jnp.concatenate([h, ones], axis=-1),
            ((0, 0), (0, self.rad_hp - self.rad_hd - 1)),
        )

    # ------------------------------------------------------------- weights
    def pack_weights(self, head_weights: Sequence[Sequence[jnp.ndarray]]):
        """head_weights[h][i] = the IrrepsLinear weight [fan_real, mul_out] for
        the h-th head's i-th output block (IrrepsLinear order).  Returns the
        per-group packed [fan_pad, cols] arrays (zero rows at lane padding).
        Differentiable: runs outside the custom_vjp so dW unpacking is XLA's.
        """
        tp = self.tp
        packed = []
        for gi, g in enumerate(self.groups):
            W = jnp.zeros((g.fan_pad, g.cols), head_weights[0][0].dtype)
            for h, segs in enumerate(self.head_cols):
                for ti, ir_out, col0, mul_out in segs:
                    if ir_out != g.ir or col0 < 0:
                        continue
                    Wh = head_weights[h][ti]  # [fan_real, mul_out]
                    row = 0
                    for bo in g.blocks:
                        mul = tp.irreps_out[bo].mul
                        W = jax.lax.dynamic_update_slice(
                            W, Wh[row : row + mul], (g.fan_slot[bo], col0)
                        )
                        row += mul
                    assert row == Wh.shape[0], (row, Wh.shape)
            packed.append(W)
        return packed

    # -------------------------------------------------------------- output
    def split_output(self, out_flat: jnp.ndarray) -> List[jnp.ndarray]:
        """Fused flat output -> one flat per-head array in the head's own
        component-major irreps layout (same as IrrepsLinear's output)."""
        heads = []
        for h, hirr in enumerate(self.head_irreps):
            pieces = []
            for ti, ir_out, col0, mul_out in self.head_cols[h]:
                if col0 < 0:
                    pieces.append(
                        jnp.zeros(
                            out_flat.shape[:-1] + (ir_out.dim * mul_out,),
                            out_flat.dtype,
                        )
                    )
                    continue
                g = next(g for g in self.groups if g.ir == ir_out)
                ks = [
                    out_flat[
                        ...,
                        g.out_off + k * g.cols + col0 : g.out_off
                        + k * g.cols
                        + col0
                        + mul_out,
                    ]
                    for k in range(ir_out.dim)
                ]
                pieces.append(
                    jnp.concatenate(ks, axis=-1) if len(ks) > 1 else ks[0]
                )
            heads.append(
                jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]
            )
        return heads


# ------------------------------------------------------------------ kernels


def _align_inputs(plan: DTPLinPlan, x_ref, w_ref, x_al, w_al, T):
    """Copy x and w into the 128-aligned slot scratches.

    Packed slots (p > 1) lay p contiguous row-groups of T/p edges side by
    side on the lanes, so the FMA phase runs with all 128 lanes busy; p == 1
    slots keep the plain layout with zeroed pad lanes.  ``x_ref is None``
    (save_z backward that still needs w) skips the x phase."""
    # pad lanes only exist when a slot is not fully packed (p*mul < 128);
    # zero just those slots once instead of the whole scratch every tile
    if x_ref is not None:
        for off, (slot, mul, p) in plan.x_slots.items():
            if p * mul < LANE:
                x_al[:, slot : slot + LANE] = jnp.zeros_like(
                    x_al[:, slot : slot + LANE]
                )
        for off, (slot, mul, p) in plan.x_slots.items():
            if p == 1:
                x_al[:, slot : slot + mul] = x_ref[:, off : off + mul]
            else:
                r = T // p
                for g in range(p):
                    x_al[:r, slot + g * mul : slot + (g + 1) * mul] = x_ref[
                        g * r : (g + 1) * r, off : off + mul
                    ]
    if w_ref is None:  # fold_shared: w lives in the packed linear weights
        return
    for off, (slot, mul, p) in plan.w_slots.items():
        if p * mul < LANE:
            w_al[:, slot : slot + LANE] = jnp.zeros_like(w_al[:, slot : slot + LANE])
    for off, (slot, mul, p) in plan.w_slots.items():
        if p == 1:
            w_al[:, slot : slot + mul] = w_ref[:, off : off + mul]
        else:
            r = T // p
            for g in range(p):
                w_al[:r, slot + g * mul : slot + (g + 1) * mul] = w_ref[
                    g * r : (g + 1) * r, off : off + mul
                ]


def _radial_h_packed(plan, h_ref, p, T):
    """[T, hp] h operand -> [T/p, p*hp] with row-group g on lane group g."""
    if p == 1:
        return h_ref[:]
    r = T // p
    return jnp.concatenate([h_ref[g * r : (g + 1) * r, :] for g in range(p)], axis=1)


def _radial_w_fill(plan, T, h_ref, Wr_refs, w_al):
    """Fill the aligned+packed w scratch from the radial hidden: one MXU dot
    per pack group (replaces the per-slot w align copies AND the XLA-side
    radial final matmul).  Pad lanes come out zero via Wr's zero columns."""
    for pi, (p, start, width) in enumerate(plan.rad_ranges):
        r = T // p
        hp_op = _radial_h_packed(plan, h_ref, p, T)
        w_al[:r, start : start + width] = jax.lax.dot_general(
            hp_op,
            Wr_refs[pi][:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(w_al.dtype)


def _radial_write_dw(plan, dw_acc, dw_al, T):
    """Write per-slot dw accumulators into the aligned+packed scratch (the
    layout _radial_w_fill produces), ready for the dh/dWr contractions.

    Every lane of every slot's [:T//p] rows must hold a real value or zero:
    the following contractions run over the full lane range, and scratch
    garbage would poison them (0 * NaN = NaN) even where Wr's packed columns
    are zero."""
    for off, (slot, mul, p) in plan.w_slots.items():
        r = T // p
        acc = dw_acc.get(slot)
        if acc is None:  # dead slot: instruction feeds no live z irrep
            dw_al[:r, slot : slot + LANE] = jnp.zeros_like(
                dw_al[:r, slot : slot + LANE]
            )
            continue
        lanes = acc.shape[1]
        if lanes < LANE:  # capped pack factor: zero the pad lanes
            dw_al[:r, slot + lanes : slot + LANE] = jnp.zeros_like(
                dw_al[:r, slot + lanes : slot + LANE]
            )
        dw_al[:r, slot : slot + lanes] = acc.astype(dw_al.dtype)


def _radial_dh(plan, T, dw_al, Wr_refs, dh_ref):
    """dh = dw contracted against Wr per pack group (the h-leg transpose);
    packed groups unpack their p*hp lanes back onto row groups."""
    dh_ref[:] = jnp.zeros_like(dh_ref)
    for pi, (p, start, width) in enumerate(plan.rad_ranges):
        r = T // p
        prod = jax.lax.dot_general(
            dw_al[:r, start : start + width],
            Wr_refs[pi][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [r, p*hp]
        hp = plan.rad_hp
        if p == 1:
            dh_ref[:] += prod.astype(dh_ref.dtype)
        else:
            for g in range(p):
                dh_ref[g * r : (g + 1) * r, :] += prod[
                    :, g * hp : (g + 1) * hp
                ].astype(dh_ref.dtype)


def _packed_col(plan, cols, colcache, col_off, p, mul, T):
    """Per-edge sh column in the packed row-group layout [T/p, p*mul]
    (group width is the slot's mul, which can be < 128//p when the pack
    factor was capped for sublane tiling)."""
    key = (col_off, p, mul)
    if key not in colcache:
        if p == 1:
            colcache[key] = cols[:, col_off : col_off + 1]
        else:
            r = T // p
            colcache[key] = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        cols[g * r : (g + 1) * r, col_off : col_off + 1], (r, mul)
                    )
                    for g in range(p)
                ],
                axis=1,
            )
    return colcache[key]


def _fma_z(plan: DTPLinPlan, cols, x_al, w_al, z_scr, T):
    """The DTP FMA phase: accumulate z into the per-group aligned scratches.
    Terms are grouped by z slot so the per-path weight multiplies once; packed
    slots do the work on T/p rows with full lanes, then unpack into z's
    edge-major rows for the MXU phase."""
    slot_acc = {}
    colcache = {}
    for t, (gi, k, fc) in plan._terms:
        xs, mul, p = plan.x_slots[t.a_off]
        r = T // p
        cp = _packed_col(plan, cols, colcache, t.col_off, p, mul, T)
        lanes = LANE if p == 1 else p * mul
        a = x_al[:r, xs : xs + lanes]
        v = (t.coeff * cp) * a
        key = (gi, k, fc, t.b_off)
        slot_acc[key] = v if key not in slot_acc else slot_acc[key] + v
    for (gi, k, fc, b_off), acc in slot_acc.items():
        ws, mul, p = plan.w_slots[b_off]
        r = T // p
        lanes = LANE if p == 1 else p * mul
        if w_al is None:  # fold_shared: w applied via the packed linear W
            val = acc
        else:
            val = acc * w_al[:r, ws : ws + lanes]
        if p == 1:
            z_scr[gi][k * T : (k + 1) * T, fc : fc + LANE] = val
        else:
            for g in range(p):
                z_scr[gi][
                    k * T + g * r : k * T + (g + 1) * r, fc : fc + mul
                ] = val[:, g * mul : (g + 1) * mul]


def _fwd_kernel(plan: DTPLinPlan, T, save_z, n_ref, *refs):
    nG = len(plan.groups)
    h_ref = Wr_refs = None
    if plan.fold_shared:
        x_ref, sh_ref, w_ref = refs[0], refs[1], None
        rest = refs[2:]
    elif plan.radial_fold is not None:
        x_ref, sh_ref, h_ref, w_ref = refs[0], refs[1], refs[2], None
        nP = len(plan.rad_ranges)
        Wr_refs = refs[3 : 3 + nP]
        rest = refs[3 + nP :]
    else:
        x_ref, sh_ref, w_ref = refs[:3]
        rest = refs[3:]
    W_refs = rest[:nG]
    out_ref = rest[nG]
    rest = rest[nG + 1 :]
    if save_z:
        # z emitted as per-tile output blocks (read back by the backward)
        z_scr = rest[:nG]
        rest = rest[nG:]
    x_al = rest[0]
    if plan.fold_shared:
        w_al = None
        rest = rest[1:]
    else:
        w_al = rest[1]
        rest = rest[2:]
    if not save_z:
        z_scr = rest

        # packed slots write only fc:fc+mul lanes of z; the pad lanes must
        # hold zeros (not uninitialized VMEM) so the MXU sees 0 * W's zero
        # rows; the persistent scratch only needs this once
        @pl.when(pl.program_id(0) == 0)
        def _():
            for zs in z_scr:
                zs[:] = jnp.zeros_like(zs)

    # tiles past the real edge count (padding tail of the sorted edge list)
    # skip all compute and emit zeros
    active = pl.program_id(0) * T < n_ref[0]

    @pl.when(active)
    def _():
        if save_z:
            # output blocks are fresh VMEM every tile: zero the pad lanes the
            # packed FMA writes do not cover (skipped tiles stay garbage — the
            # backward never reads them)
            for zs in z_scr:
                zs[:] = jnp.zeros_like(zs)
        _align_inputs(plan, x_ref, w_ref, x_al, w_al, T)
        if h_ref is not None:
            _radial_w_fill(plan, T, h_ref, Wr_refs, w_al)
        _fma_z(plan, sh_ref[:], x_al, w_al, z_scr, T)
        for gi, g in enumerate(plan.groups):
            res = jnp.dot(
                z_scr[gi][:], W_refs[gi][:], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)
            for k in range(g.ir.dim):
                out_ref[
                    :, g.out_off + k * g.cols : g.out_off + (k + 1) * g.cols
                ] = res[k * T : (k + 1) * T, :]

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _bwd_needs_x(plan: DTPLinPlan, save_z) -> bool:
    """Whether the backward reads x: always when z is recomputed; with saved
    z only for the per-edge-w dw transpose or the dsh transpose."""
    return (not save_z) or (not plan.fold_shared) or plan.needs_dsh


def _bwd_kernel(plan: DTPLinPlan, T, save_z, n_ref, *refs):
    nG = len(plan.groups)
    rad = plan.radial_fold is not None
    nP = len(plan.rad_ranges) if rad else 0
    has_x = _bwd_needs_x(plan, save_z)
    it = iter(refs)
    x_ref = next(it) if has_x else None
    sh_ref = next(it)
    h_ref, Wr_refs = None, ()
    if rad:
        h_ref = next(it)
        Wr_refs = [next(it) for _ in range(nP)]
        w_ref = None
    else:
        w_ref = None if plan.fold_shared else next(it)
    W_refs = [next(it) for _ in range(nG)]
    g_ref = next(it)
    z_in = [next(it) for _ in range(nG)] if save_z else None
    dx_ref = next(it)
    dsh_ref = next(it)
    dh_ref, dWr_refs = None, ()
    if rad:
        dh_ref = next(it)
        dWr_refs = [next(it) for _ in range(nP)]
        dw_ref = None
    else:
        dw_ref = None if plan.fold_shared else next(it)
    dW_refs = [next(it) for _ in range(nG)]
    x_al = next(it) if has_x else None
    w_al = next(it) if (rad or not plan.fold_shared) else None
    if save_z:
        z_scr = z_in  # input blocks double as the MXU operand
    else:
        z_scr = [next(it) for _ in range(nG)]
    dz_scr = [next(it) for _ in range(nG)]
    g_scr = [next(it) for _ in range(nG)]
    assert next(it, None) is None

    i = pl.program_id(0)

    if not save_z:

        @pl.when(i == 0)
        def _():
            for zs in z_scr:
                zs[:] = jnp.zeros_like(zs)

    # tiles past the real edge count: zero cotangent blocks, skip compute
    active = i * T < n_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dsh_ref[:] = jnp.zeros_like(dsh_ref)
        if dw_ref is not None:
            dw_ref[:] = jnp.zeros_like(dw_ref)
        if dh_ref is not None:
            dh_ref[:] = jnp.zeros_like(dh_ref)

        @pl.when(i == 0)
        def _():
            for gi in range(nG):
                dW_refs[gi][:] = jnp.zeros_like(dW_refs[gi])
            for pi in range(nP):
                dWr_refs[pi][:] = jnp.zeros_like(dWr_refs[pi])

    @pl.when(active)
    def _():
        _bwd_body(
            plan, T, save_z, x_ref, sh_ref, w_ref, W_refs, g_ref, dx_ref,
            dsh_ref, dw_ref, dW_refs, x_al, w_al, z_scr, dz_scr, g_scr, i,
            h_ref=h_ref, Wr_refs=Wr_refs, dh_ref=dh_ref, dWr_refs=dWr_refs,
        )


def _bwd_body(plan, T, save_z, x_ref, sh_ref, w_ref, W_refs, g_ref, dx_ref,
              dsh_ref, dw_ref, dW_refs, x_al, w_al, z_scr, dz_scr, g_scr, i,
              h_ref=None, Wr_refs=(), dh_ref=None, dWr_refs=()):
    nG = len(plan.groups)
    _align_inputs(plan, x_ref, w_ref, x_al, w_al, T)
    if h_ref is not None:
        # radial fold: materialize the per-edge w in the aligned scratch from
        # the hidden activation (one MXU dot per pack group)
        _radial_w_fill(plan, T, h_ref, Wr_refs, w_al)
    cols = sh_ref[:]
    if not save_z:
        # recompute z in VMEM (low-memory variant)
        _fma_z(plan, cols, x_al, w_al, z_scr, T)
    # MXU: dW += z^T g ; dz = g W^T
    for gi, g in enumerate(plan.groups):
        gm = g_scr[gi]
        for k in range(g.ir.dim):
            gm[k * T : (k + 1) * T, :] = g_ref[
                :, g.out_off + k * g.cols : g.out_off + (k + 1) * g.cols
            ]
        dW_c = jax.lax.dot_general(
            z_scr[gi][:],
            gm[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            dW_refs[gi][:] = dW_c

        @pl.when(i > 0)
        def _():
            dW_refs[gi][:] += dW_c

        dz_scr[gi][:] = jax.lax.dot_general(
            gm[:],
            W_refs[gi][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dz_scr[gi].dtype)

    # trilinear transposes off dz.  Per term:
    #   dx[i]  += c * sh[j] * w[p] * dz[k]
    #   dw[p]  += c * sh[j] * x[i] * dz[k]
    #   dsh[j] += c * sum_lanes x[i] * w[p] * dz[k]
    dx_acc, dw_acc, dsh_acc = {}, {}, {}
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
        lanes = LANE if p == 1 else p * mul
        xv = None if x_al is None else x_al[:r, xs : xs + lanes]
        if plan.fold_shared:
            # w is folded into W, so dz already carries it: dx = c*col*dz,
            # and dw flows through the XLA-side row-scaling of W
            cdz = (t.coeff * cp) * dz
            dx_acc[xs] = dx_acc.get(xs, 0.0) + cdz
            if plan.needs_dsh:
                dsh_acc[(t.col_off, p, mul)] = (
                    dsh_acc.get((t.col_off, p, mul), 0.0) + t.coeff * (xv * dz)
                )
            continue
        wv = w_al[:r, ws : ws + lanes]
        # factor c*col*dz once; dx and dw are one FMA each off it
        cdz = (t.coeff * cp) * dz
        dx_acc[xs] = dx_acc.get(xs, 0.0) + cdz * wv
        dw_acc[ws] = dw_acc.get(ws, 0.0) + cdz * xv
        if plan.needs_dsh:
            dsh_acc[(t.col_off, p, mul)] = (
                dsh_acc.get((t.col_off, p, mul), 0.0) + t.coeff * (xv * (wv * dz))
            )
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
    dsh_ref[:] = jnp.zeros_like(dsh_ref)
    for (j, p, mul), acc in dsh_acc.items():
        if p == 1:
            dsh_ref[:, j : j + 1] += jnp.sum(acc, axis=1, keepdims=True).astype(
                dsh_ref.dtype
            )
        else:
            r = T // p
            for g in range(p):
                dsh_ref[g * r : (g + 1) * r, j : j + 1] += jnp.sum(
                    acc[:, g * mul : (g + 1) * mul], axis=1, keepdims=True
                ).astype(dsh_ref.dtype)
    if plan.fold_shared:
        return  # dw comes from the XLA-side W row-scaling
    if dh_ref is not None:
        # radial fold: dw never leaves VMEM — write it into the (now dead)
        # w scratch in the aligned+packed layout, then contract it against
        # h for dWr and against Wr for dh (both MXU dots per pack group)
        _radial_write_dw(plan, dw_acc, w_al, T)
        for pi, (p, start, width) in enumerate(plan.rad_ranges):
            r = T // p
            hp_op = _radial_h_packed(plan, h_ref, p, T)
            dWr_c = jax.lax.dot_general(
                hp_op,
                w_al[:r, start : start + width],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(i == 0)
            def _(pi=pi, dWr_c=dWr_c):
                dWr_refs[pi][:] = dWr_c

            @pl.when(i > 0)
            def _(pi=pi, dWr_c=dWr_c):
                dWr_refs[pi][:] += dWr_c

        _radial_dh(plan, T, w_al, Wr_refs, dh_ref)
        return
    # shared weights always take the folded path (fold_shared ==
    # shared_weights in __init__), so dw here is per-edge
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


# ------------------------------------------------------------ callable op


def _shared_spec(shape):
    return pl.BlockSpec(shape, lambda i, *_: (0, 0))


def _n_scalar(n_edges, E):
    """Real-edge count as the i32[1] scalar-prefetch operand (defaults to
    all-active when the caller has no mask)."""
    if n_edges is None:
        return jnp.full((1,), E, jnp.int32)
    return jnp.asarray(n_edges, jnp.int32).reshape((1,))


def _save_z_default() -> bool:
    import os

    return os.environ.get("EQUIFORMER_TPU_SAVE_Z", "1") not in ("0", "false")


def _tile_eff(tile: int, dtype) -> int:
    """VMEM scratch scales with bytes-per-element: the tuned tiles are
    calibrated for bf16; fp32 (profile runs, --fp32) halves the tile — the
    folded-shared backward at tile 256 fp32 measured a 16.33M scoped-vmem
    OOM on v5e."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return tile
    return max(32, tile // 2)


def make_bwd_call(plan: DTPLinPlan, tile: int, save_z: bool, interpret: bool):
    """Module-level builder for the fused backward pallas_call — shared by
    make_fused_dtp_lin's custom_vjp and the pair kernel (dtp_lin_pair.py),
    whose composed backward reuses the two plans' existing bwd kernels."""

    def z_specs(T):
        return tuple(
            pl.BlockSpec((g.ir.dim * T, g.fan_pad), lambda i, *_: (i, 0))
            for g in plan.groups
        )

    def bwd_call(x, sh, w, Ws, g, zs, n):
        E = g.shape[0]
        dtype = g.dtype
        T = _tile_eff(tile, dtype)
        has_x = _bwd_needs_x(plan, save_z)
        z_scratch = [] if save_z else [
            pltpu.VMEM((gr.ir.dim * T, gr.fan_pad), dtype) for gr in plan.groups
        ]
        dz_scratch = [
            pltpu.VMEM((gr.ir.dim * T, gr.fan_pad), dtype) for gr in plan.groups
        ]
        g_scratch = [
            pltpu.VMEM((gr.ir.dim * T, gr.cols), dtype) for gr in plan.groups
        ]
        dW_shapes = tuple(
            jax.ShapeDtypeStruct((gr.fan_pad, gr.cols), jnp.float32)
            for gr in plan.groups
        )
        dW_specs = tuple(_shared_spec((gr.fan_pad, gr.cols)) for gr in plan.groups)

        rad = plan.radial_fold is not None
        in_specs, operands = [], []
        if has_x:
            in_specs.append(pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)))
            operands.append(x)
        in_specs.append(pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)))
        operands.append(sh)
        if rad:
            h, Wrs = w
            in_specs.append(pl.BlockSpec((T, plan.rad_hp), lambda i, *_: (i, 0)))
            operands.append(h)
            in_specs += [_shared_spec(M.shape) for M in Wrs]
            operands += list(Wrs)
        elif not plan.fold_shared:
            in_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
            operands.append(w)
        in_specs += [_shared_spec(W.shape) for W in Ws]
        operands += list(Ws)
        in_specs.append(pl.BlockSpec((T, plan.d_out), lambda i, *_: (i, 0)))
        operands.append(g)
        if save_z:
            in_specs += list(z_specs(T))
            operands += list(zs)

        out_shape = [
            jax.ShapeDtypeStruct((E, plan.d_x), dtype),
            jax.ShapeDtypeStruct((E, plan.d_sh), sh.dtype),
        ]
        out_specs = [
            pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
            pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
        ]
        if rad:
            out_shape.append(jax.ShapeDtypeStruct((E, plan.rad_hp), h.dtype))
            out_specs.append(
                pl.BlockSpec((T, plan.rad_hp), lambda i, *_: (i, 0))
            )
            for (p, _, width), M in zip(plan.rad_ranges, Wrs):
                out_shape.append(
                    jax.ShapeDtypeStruct((p * plan.rad_hp, width), jnp.float32)
                )
                out_specs.append(_shared_spec((p * plan.rad_hp, width)))
        elif not plan.fold_shared:
            out_shape.append(jax.ShapeDtypeStruct((E, plan.d_w), w.dtype))
            out_specs.append(pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0)))
        out_shape += list(dW_shapes)
        out_specs += list(dW_specs)

        scratch = []
        if has_x:
            scratch.append(pltpu.VMEM((T, plan.d_x_al), dtype))
        if rad or not plan.fold_shared:
            scratch.append(pltpu.VMEM((T, plan.d_w_al), dtype))
        scratch += z_scratch + dz_scratch + g_scratch

        return pl.pallas_call(
            functools.partial(_bwd_kernel, plan, T, save_z),
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

    return bwd_call


def make_fused_dtp_lin(plan: DTPLinPlan, tile: int = 128,
                       interpret: Optional[bool] = None,
                       save_z: Optional[bool] = None):
    """Build the custom-vjp fused op for a plan.  Signature:
    ``fused(x, sh, w, *Ws) -> out_flat`` with ``Ws`` from plan.pack_weights.
    x: [E, d_x]; sh: [E, d_sh]; w: [E, d_w] ([1, d_w] if shared_weights).

    ``save_z`` (default: EQUIFORMER_TPU_SAVE_Z, on): the forward emits the
    per-group z blocks as extra outputs and the backward reads them instead
    of recomputing — drops the align+FMA phases from the folded-shared
    backward and the FMA recompute from the per-edge-w backward, at the cost
    of a [E, ~d_z] bf16 residual per call.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if save_z is None:
        save_z = _save_z_default()
    nG = len(plan.groups)

    def _t_eff(dtype):
        # VMEM scratch scales with bytes-per-element: the tuned tiles are
        # calibrated for bf16; fp32 (profile runs, --fp32) halves the tile —
        # the folded-shared backward at tile 256 fp32 measured a 16.33M
        # scoped-vmem OOM on v5e
        if jnp.dtype(dtype) == jnp.bfloat16:
            return tile
        return max(32, tile // 2)

    def w_spec(E, T):
        # shared weights always ride the folded path; here w is per-edge
        return pl.BlockSpec((T, plan.d_w), lambda i, *_: (i, 0))

    def z_specs(T):
        return tuple(
            pl.BlockSpec((g.ir.dim * T, g.fan_pad), lambda i, *_: (i, 0))
            for g in plan.groups
        )

    def z_shapes(E, dtype):
        return tuple(
            jax.ShapeDtypeStruct((g.ir.dim * E, g.fan_pad), dtype)
            for g in plan.groups
        )

    def fwd_call(x, sh, w, Ws, n):
        E = x.shape[0]
        T = _t_eff(x.dtype)
        if plan.fold_shared:
            in_specs = [
                pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
                pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
            ] + [_shared_spec(W.shape) for W in Ws]
            w_scratch = []
            operands = (x, sh) + tuple(Ws)
        elif plan.radial_fold is not None:
            h, Wrs = w
            in_specs = [
                pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
                pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
                pl.BlockSpec((T, plan.rad_hp), lambda i, *_: (i, 0)),
            ] + [_shared_spec(M.shape) for M in Wrs] + [
                _shared_spec(W.shape) for W in Ws
            ]
            w_scratch = [pltpu.VMEM((T, plan.d_w_al), x.dtype)]
            operands = (x, sh, h) + tuple(Wrs) + tuple(Ws)
        else:
            in_specs = [
                pl.BlockSpec((T, plan.d_x), lambda i, *_: (i, 0)),
                pl.BlockSpec((T, plan.d_sh), lambda i, *_: (i, 0)),
                w_spec(E, T),
            ] + [_shared_spec(W.shape) for W in Ws]
            w_scratch = [pltpu.VMEM((T, plan.d_w_al), x.dtype)]
            operands = (x, sh, w) + tuple(Ws)
        out_shape = jax.ShapeDtypeStruct((E, plan.d_out), x.dtype)
        out_specs = pl.BlockSpec((T, plan.d_out), lambda i, *_: (i, 0))
        if save_z:
            out_shape = (out_shape,) + z_shapes(E, x.dtype)
            out_specs = (out_specs,) + z_specs(T)
            z_scratch = []
        else:
            z_scratch = [
                pltpu.VMEM((g.ir.dim * T, g.fan_pad), x.dtype)
                for g in plan.groups
            ]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, plan, T, save_z),
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(E // T,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=[pltpu.VMEM((T, plan.d_x_al), x.dtype)]
                + w_scratch + z_scratch,
            ),
            interpret=interpret,
        )(n, *operands)

    bwd_call = make_bwd_call(plan, tile, save_z, interpret)

    if plan.fold_shared:

        @jax.custom_vjp
        def fused_nw(n, x, sh, *Ws):
            res = fwd_call(x, sh, None, Ws, n)
            return res[0] if save_z else res

        def fnw_fwd(n, x, sh, *Ws):
            res = fwd_call(x, sh, None, Ws, n)
            if save_z:
                # x is dropped from the residuals when the backward never
                # reads it (needs_dsh=False): frees it for XLA
                keep_x = _bwd_needs_x(plan, save_z)
                return res[0], (n, x if keep_x else None, sh, Ws, res[1:])
            return res, (n, x, sh, Ws, None)

        def fnw_bwd(res, g):
            n, x, sh, Ws, zs = res
            outs = bwd_call(x, sh, None, Ws, g, zs, n)
            dWs = tuple(d.astype(W.dtype) for d, W in zip(outs[2:], Ws))
            return (None, outs[0], outs[1]) + dWs

        fused_nw.defvjp(fnw_fwd, fnw_bwd)

        def call(x, sh, w, Ws, n_edges=None):
            """Fold the shared w into the packed weights, pad, run, unpad."""
            E = x.shape[0]
            pad = (-E) % _t_eff(x.dtype)
            Ws = plan.scale_shared_weights(w.astype(x.dtype), Ws)
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
                sh = jnp.pad(sh, ((0, pad), (0, 0)))
            n = _n_scalar(n_edges, E)
            out = fused_nw(n, x, sh, *Ws)
            return out[:E] if pad else out

        return call

    if plan.radial_fold is not None:

        @jax.custom_vjp
        def fused_rad(n, x, sh, h, Wrs, Ws):
            res = fwd_call(x, sh, (h, Wrs), Ws, n)
            return res[0] if save_z else res

        def fr_fwd(n, x, sh, h, Wrs, Ws):
            res = fwd_call(x, sh, (h, Wrs), Ws, n)
            if save_z:
                return res[0], (n, x, sh, h, Wrs, Ws, res[1:])
            return res, (n, x, sh, h, Wrs, Ws, None)

        def fr_bwd(res, g):
            n, x, sh, h, Wrs, Ws, zs = res
            outs = bwd_call(x, sh, (h, Wrs), Ws, g, zs, n)
            dx, dsh, dh = outs[0], outs[1], outs[2]
            nP = len(Wrs)
            dWrs = tuple(
                d.astype(M.dtype) for d, M in zip(outs[3 : 3 + nP], Wrs)
            )
            dWs = tuple(
                d.astype(W.dtype) for d, W in zip(outs[3 + nP :], Ws)
            )
            return (None, dx, dsh, dh, dWrs, dWs)

        fused_rad.defvjp(fr_fwd, fr_bwd)

        def call(x, sh, w, Ws, n_edges=None):
            """w = (h, Wrs): pad h to [E_pad, rad_hp], run, unpad.  AD wrt
            the raw (h, Wr, offset) chains through pad_h/pack_radial in XLA."""
            E = x.shape[0]
            pad = (-E) % _t_eff(x.dtype)
            h, Wrs = w
            h = plan.pad_h(h.astype(x.dtype))
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
                sh = jnp.pad(sh, ((0, pad), (0, 0)))
                h = jnp.pad(h, ((0, pad), (0, 0)))
            n = _n_scalar(n_edges, E)
            out = fused_rad(n, x, sh, h, tuple(Wrs), tuple(Ws))
            return out[:E] if pad else out

        return call

    @jax.custom_vjp
    def fused(n, x, sh, w, *Ws):
        res = fwd_call(x, sh, w, Ws, n)
        return res[0] if save_z else res

    def f_fwd(n, x, sh, w, *Ws):
        res = fwd_call(x, sh, w, Ws, n)
        if save_z:
            return res[0], (n, x, sh, w, Ws, res[1:])
        return res, (n, x, sh, w, Ws, None)

    def f_bwd(res, g):
        n, x, sh, w, Ws, zs = res
        outs = bwd_call(x, sh, w, Ws, g, zs, n)
        dx, dsh, dw = outs[0], outs[1], outs[2]
        dWs = tuple(d.astype(W.dtype) for d, W in zip(outs[3:], Ws))
        return (None, dx, dsh, dw) + dWs

    fused.defvjp(f_fwd, f_bwd)

    def call(x, sh, w, Ws, n_edges=None):
        """Pad edges to the tile, run, unpad."""
        E = x.shape[0]
        pad = (-E) % _t_eff(x.dtype)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            sh = jnp.pad(sh, ((0, pad), (0, 0)))
            w = jnp.pad(w, ((0, pad), (0, 0)))
        n = _n_scalar(n_edges, E)
        out = fused(n, x, sh, w, *Ws)
        return out[:E] if pad else out

    return call
