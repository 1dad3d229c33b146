"""Fused Pallas TPU kernels for the depthwise tensor product (the hot op).

The depthwise TP (uvu, second input = spherical harmonics with mul=1) is the
reference's dominant kernel (e3nn codegen CUDA); on TPU an einsum formulation
lowers to per-edge batched matmuls with contraction dims 1-7 — <1% MXU
utilization.  Here the (sparse) Clebsch-Gordan contraction is unrolled into
vector FMAs over [edge-tile, mul] lanes: with the component-major feature
layout every CG term touches a *contiguous* [T_E, mul] tile (multiplicity on
the 128-lane axis), so the VPU runs at full width.  Per-edge radial weights
are fused as per-group multiplies and the fan-in rescale is folded into the
CG constants.

Differentiability: the DTP ``out = sum c * sh[j] * x[i] * w[p]`` is trilinear,
so all derivatives stay in a closed family of two sparse-trilinear primitives:

* ``T(a, col, b)``  -> lane tensor:  out[o] += c * col[j] * a[i] * b[p]
* ``R(a, b, d)``    -> column:       col[j] += c * sum_lanes a[i]*b[p]*d[k]

Each primitive's VJP is again T/R with a permuted (static) term list, so
arbitrary-order autodiff (forces = grad-of-grad) composes by induction.
Interpret mode makes the same code path unit-testable on CPU.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..core.tensor_product import TensorProduct


class Term(NamedTuple):
    a_off: int  # lane-tile offset in a
    col_off: int  # column index in col
    b_off: int  # lane-tile offset in b
    out_off: int  # lane-tile offset in out (T); for R, the d operand offset
    mul: int
    coeff: float


def _group(terms: Sequence[Term]):
    """Group by (out_off, b_off, mul) so the b multiply happens once per group."""
    groups = {}
    for t in terms:
        groups.setdefault((t.out_off, t.b_off, t.mul), []).append(t)
    return groups


def _t_kernel(terms, a_ref, col_ref, b_ref, out_ref):
    cols = col_ref[:]  # hoist: one VMEM read, per-term value slices are free
    out_acc = {}
    for (out_off, b_off, mul), ts in _group(terms).items():
        acc = None
        for t in ts:
            col = cols[:, t.col_off : t.col_off + 1]
            a = a_ref[:, t.a_off : t.a_off + t.mul]
            v = (t.coeff * col) * a
            acc = v if acc is None else acc + v
        val = acc * b_ref[:, b_off : b_off + mul]
        key = (out_off, mul)
        out_acc[key] = out_acc.get(key, 0.0) + val
    out_ref[:] = jnp.zeros_like(out_ref)
    for (out_off, mul), val in out_acc.items():
        out_ref[:, out_off : out_off + mul] = val


def _r_kernel(terms, a_ref, b_ref, d_ref, col_ref):
    col_acc = {}
    for t in terms:
        a = a_ref[:, t.a_off : t.a_off + t.mul]
        b = b_ref[:, t.b_off : t.b_off + t.mul]
        d = d_ref[:, t.out_off : t.out_off + t.mul]
        s = t.coeff * jnp.sum(a * b * d, axis=1, keepdims=True)
        col_acc[t.col_off] = col_acc.get(t.col_off, 0.0) + s
    col_ref[:] = jnp.zeros_like(col_ref)
    for off, s in col_acc.items():
        col_ref[:, off : off + 1] = s


def _lane_spec(tile, d, shared=False):
    if shared:
        return pl.BlockSpec((1, d), lambda i: (0, 0))
    return pl.BlockSpec((tile, d), lambda i: (i, 0))


# ---------------------------------------------------------------- primitives
# T and R are registered as first-class JAX primitives with JVP + transpose
# rules (each transpose is again a T/R with a permuted static term list), so
# arbitrary-order autodiff — e.g. training gradients through force = -dE/dpos
# — composes without falling back to einsums.

from jax.extend import core as jex_core
from jax.interpreters import ad, mlir

_t_p = jex_core.Primitive("equiformer_dtp_t")
_r_p = jex_core.Primitive("equiformer_dtp_r")


def _pad_edges(arrs, tile, shared_flags):
    E = None
    for a, sh in zip(arrs, shared_flags):
        if not sh:
            E = a.shape[0]
            break
    pad = (-E) % tile
    if pad == 0:
        return arrs, E
    out = []
    for a, sh in zip(arrs, shared_flags):
        out.append(a if sh else jnp.pad(a, ((0, pad), (0, 0))))
    return out, E


def t_apply(a, col, b, *, terms, d_a, d_col, d_b, d_out, tile, interpret,
            shared_a=False, shared_b=False):
    return _t_p.bind(
        a, col, b, terms=terms, d_a=d_a, d_col=d_col, d_b=d_b, d_out=d_out,
        tile=tile, interpret=interpret, shared_a=shared_a, shared_b=shared_b,
    )


def r_apply(a, b, d, *, terms, d_a, d_b, d_d, d_col, tile, interpret,
            shared_a=False, shared_b=False):
    return _r_p.bind(
        a, b, d, terms=terms, d_a=d_a, d_b=d_b, d_d=d_d, d_col=d_col,
        tile=tile, interpret=interpret, shared_a=shared_a, shared_b=shared_b,
    )


def _t_call(a, col, b, *, terms, d_a, d_col, d_b, d_out, tile, interpret,
            shared_a, shared_b):
    E = col.shape[0]
    return pl.pallas_call(
        functools.partial(_t_kernel, terms),
        out_shape=jax.ShapeDtypeStruct((E, d_out), col.dtype),
        grid=(E // tile,),
        in_specs=[
            _lane_spec(tile, d_a, shared_a),
            pl.BlockSpec((tile, d_col), lambda i: (i, 0)),
            _lane_spec(tile, d_b, shared_b),
        ],
        out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0)),
        interpret=interpret,
    )(a, col, b)


def _r_call(a, b, d, *, terms, d_a, d_b, d_d, d_col, tile, interpret,
            shared_a, shared_b):
    E = d.shape[0]
    return pl.pallas_call(
        functools.partial(_r_kernel, terms),
        out_shape=jax.ShapeDtypeStruct((E, d_col), d.dtype),
        grid=(E // tile,),
        in_specs=[
            _lane_spec(tile, d_a, shared_a),
            _lane_spec(tile, d_b, shared_b),
            pl.BlockSpec((tile, d_d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d_col), lambda i: (i, 0)),
        interpret=interpret,
    )(a, b, d)


def _t_abstract(a, col, b, *, d_out, **kw):
    return jax.core.ShapedArray((col.shape[0], d_out), col.dtype)


def _r_abstract(a, b, d, *, d_col, **kw):
    return jax.core.ShapedArray((d.shape[0], d_col), d.dtype)


_t_p.def_abstract_eval(_t_abstract)
_r_p.def_abstract_eval(_r_abstract)
_t_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _t_p))
_r_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _r_p))
mlir.register_lowering(_t_p, mlir.lower_fun(_t_call, multiple_results=False))
mlir.register_lowering(_r_p, mlir.lower_fun(_r_call, multiple_results=False))


def _perm_a(terms):  # swap a <-> out
    return tuple(Term(t.out_off, t.col_off, t.b_off, t.a_off, t.mul, t.coeff) for t in terms)


def _perm_b(terms):  # swap b <-> out
    return tuple(Term(t.a_off, t.col_off, t.out_off, t.b_off, t.mul, t.coeff) for t in terms)


def _t_jvp(primals, tangents, **params):
    a, col, b = primals
    da, dcol, db = tangents
    out = t_apply(a, col, b, **params)
    tan = None
    def add(x, y):
        return y if x is None else x + y
    if type(da) is not ad.Zero:
        tan = add(tan, t_apply(da, col, b, **params))
    if type(dcol) is not ad.Zero:
        tan = add(tan, t_apply(a, dcol, b, **params))
    if type(db) is not ad.Zero:
        tan = add(tan, t_apply(a, col, db, **params))
    if tan is None:
        tan = ad.Zero.from_primal_value(out)
    return out, tan


def _r_jvp(primals, tangents, **params):
    a, b, d = primals
    da, db, dd = tangents
    out = r_apply(a, b, d, **params)
    tan = None
    def add(x, y):
        return y if x is None else x + y
    if type(da) is not ad.Zero:
        tan = add(tan, r_apply(da, b, d, **params))
    if type(db) is not ad.Zero:
        tan = add(tan, r_apply(a, db, d, **params))
    if type(dd) is not ad.Zero:
        tan = add(tan, r_apply(a, b, dd, **params))
    if tan is None:
        tan = ad.Zero.from_primal_value(out)
    return out, tan


ad.primitive_jvps[_t_p] = _t_jvp
ad.primitive_jvps[_r_p] = _r_jvp


def _maybe_sum_shared(x, shared):
    return jnp.sum(x, axis=0, keepdims=True) if shared else x


def _t_transpose(ct, a, col, b, *, terms, d_a, d_col, d_b, d_out, tile,
                 interpret, shared_a, shared_b):
    if type(ct) is ad.Zero:
        return None, None, None
    ct_a = ct_col = ct_b = None
    if ad.is_undefined_primal(a):
        ct_a = t_apply(
            ct, col, b, terms=_perm_a(terms), d_a=d_out, d_col=d_col, d_b=d_b,
            d_out=d_a, tile=tile, interpret=interpret,
            shared_a=False, shared_b=shared_b,
        )
        ct_a = _maybe_sum_shared(ct_a, shared_a)
    if ad.is_undefined_primal(col):
        ct_col = r_apply(
            a, b, ct, terms=terms, d_a=d_a, d_b=d_b, d_d=d_out, d_col=d_col,
            tile=tile, interpret=interpret, shared_a=shared_a, shared_b=shared_b,
        )
    if ad.is_undefined_primal(b):
        ct_b = t_apply(
            a, col, ct, terms=_perm_b(terms), d_a=d_a, d_col=d_col, d_b=d_out,
            d_out=d_b, tile=tile, interpret=interpret,
            shared_a=shared_a, shared_b=False,
        )
        ct_b = _maybe_sum_shared(ct_b, shared_b)
    return ct_a, ct_col, ct_b


def _r_transpose(ct, a, b, d, *, terms, d_a, d_b, d_d, d_col, tile,
                 interpret, shared_a, shared_b):
    # R(a, b, d)[j] = c * sum_u a[i]b[p]d[k]; ct is a column [E, d_col]
    if type(ct) is ad.Zero:
        return None, None, None
    ct_a = ct_b = ct_d = None
    if ad.is_undefined_primal(a):
        # ct_a[i] += c * ct[j] * b[p] * d[k] -> T(b, ct, d) with a<->? formula
        t = tuple(Term(x.b_off, x.col_off, x.out_off, x.a_off, x.mul, x.coeff) for x in terms)
        ct_a = t_apply(
            b, ct, d, terms=t, d_a=d_b, d_col=d_col, d_b=d_d, d_out=d_a,
            tile=tile, interpret=interpret, shared_a=shared_b, shared_b=False,
        )
        ct_a = _maybe_sum_shared(ct_a, shared_a)
    if ad.is_undefined_primal(b):
        t = tuple(Term(x.a_off, x.col_off, x.out_off, x.b_off, x.mul, x.coeff) for x in terms)
        ct_b = t_apply(
            a, ct, d, terms=t, d_a=d_a, d_col=d_col, d_b=d_d, d_out=d_b,
            tile=tile, interpret=interpret, shared_a=shared_a, shared_b=False,
        )
        ct_b = _maybe_sum_shared(ct_b, shared_b)
    if ad.is_undefined_primal(d):
        t = tuple(Term(x.a_off, x.col_off, x.b_off, x.out_off, x.mul, x.coeff) for x in terms)
        ct_d = t_apply(
            a, ct, b, terms=t, d_a=d_a, d_col=d_col, d_b=d_b, d_out=d_d,
            tile=tile, interpret=interpret, shared_a=shared_a, shared_b=shared_b,
        )
    return ct_a, ct_b, ct_d


ad.primitive_transposes[_t_p] = _t_transpose
ad.primitive_transposes[_r_p] = _r_transpose


def _plan_terms(tp: TensorProduct, fold_rescale: bool, eps: float = 1e-10) -> Tuple[Term, ...]:
    in_offsets = [s.start for s in tp.irreps_in1.slices()]
    sh_offsets = [s.start for s in tp.irreps_in2.slices()]
    out_offsets = [s.start for s in tp.irreps_out.slices()]
    terms: List[Term] = []
    for idx, ins in enumerate(tp.instructions):
        if ins.mode != "uvu" or tp.irreps_in2[ins.i_in2].mul != 1:
            raise ValueError("pallas DTP kernel supports depthwise uvu with mul-1 SH")
        mul = tp.irreps_in1[ins.i_in1].mul
        C = tp._cg[idx] * (tp.slice_sqrt_k[ins.i_out] if fold_rescale else 1.0)
        d1, d2, d3 = C.shape
        for i in range(d1):
            for j in range(d2):
                for k in range(d3):
                    c = float(C[i, j, k])
                    if abs(c) < eps:
                        continue
                    terms.append(
                        Term(
                            a_off=in_offsets[ins.i_in1] + i * mul,
                            col_off=sh_offsets[ins.i_in2] + j,
                            b_off=tp._offsets[idx],
                            out_off=out_offsets[ins.i_out] + k * mul,
                            mul=mul,
                            coeff=c,
                        )
                    )
    return tuple(terms)


class PallasDTP:
    """Fused depthwise-TP: ``PallasDTP(plan)(x, sh, w)`` is semantically
    identical to ``plan.apply(x, sh, w, scale_weights=True)`` (external raw
    weights); with ``fold_rescale=False, shared_weights=True`` it matches
    ``plan.apply(x, sh, w)`` for internal pre-scaled weights."""

    def __init__(
        self,
        tp: TensorProduct,
        tile: Optional[int] = None,
        interpret: Optional[bool] = None,
        fold_rescale: bool = True,
        shared_weights: bool = False,
        first_order: bool = False,
    ):
        self.tp = tp
        if tile is None:
            # Auto edge-tile: wide plans (the L3 models' unsimplified DTP
            # output is 9408 columns) overflow Mosaic's 16M scoped-VMEM stack
            # at tile 128 (observed 20.4M for d_out=9408); the stack scales
            # linearly with the tile, so halve until a calibrated live-bytes
            # proxy fits.  L2/OC20-width plans keep the tuned tile of 128.
            tile = 128
            width = (
                tp.irreps_in1.dim + tp.irreps_in2.dim + tp.weight_numel
                + 2 * tp.irreps_out.dim
            )
            while tile > 32 and tile * width * 4 > 8 * 2**20:
                tile //= 2
        self.tile = tile
        self.shared_weights = shared_weights
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        terms = _plan_terms(tp, fold_rescale)
        self._params = dict(
            terms=terms,
            d_a=tp.irreps_in1.dim,
            d_col=tp.irreps_in2.dim,
            d_b=tp.weight_numel,
            d_out=tp.irreps_out.dim,
            tile=tile,
            interpret=interpret,
            shared_a=False,
            shared_b=shared_weights,
        )
        self._first_order_fn = None
        if first_order:
            # fused single-kernel backward (first-order training only)
            self._first_order_fn = make_first_order_dtp(
                terms, tp.irreps_in1.dim, tp.irreps_in2.dim, tp.weight_numel,
                tp.irreps_out.dim, tile, interpret, shared_weights,
            )

    def __call__(self, x: jnp.ndarray, sh: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        E = x.shape[0]
        pad = (-E) % self.tile
        if self.shared_weights and w.ndim == 1:
            w = w[None, :]
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            sh = jnp.pad(sh, ((0, pad), (0, 0)))
            if not self.shared_weights:
                w = jnp.pad(w, ((0, pad), (0, 0)))
        if self._first_order_fn is not None:
            out = self._first_order_fn(x, sh, w)
        else:
            out = t_apply(x, sh, w, **self._params)
        return out[:E] if pad else out


# ------------------------------------------------- fused first-order backward
# The primitive-composed backward (3 kernels) supports arbitrary-order AD but
# re-reads the inputs three times.  For first-order-only training (QM9, OC20 —
# no force gradients) this fused single-kernel backward computes dx, dsh, dw
# in one pass over the edge tiles; select with PallasDTP(..., first_order=True).


def _fused_bwd_kernel(terms, x_ref, sh_ref, w_ref, g_ref, dx_ref, dsh_ref, dw_ref):
    dx_acc, dsh_acc, dw_acc = {}, {}, {}
    for t in terms:
        sh_col = sh_ref[:, t.col_off : t.col_off + 1]
        x_tile = x_ref[:, t.a_off : t.a_off + t.mul]
        w_tile = w_ref[:, t.b_off : t.b_off + t.mul]
        g_tile = g_ref[:, t.out_off : t.out_off + t.mul]
        gw = g_tile * w_tile
        dx_acc[t.a_off] = dx_acc.get(t.a_off, 0.0) + (t.coeff * sh_col) * gw
        dsh_acc[t.col_off] = dsh_acc.get(t.col_off, 0.0) + t.coeff * jnp.sum(
            x_tile * gw, axis=1, keepdims=True
        )
        dw_acc[t.b_off] = dw_acc.get(t.b_off, 0.0) + (t.coeff * sh_col) * x_tile * g_tile
    dx_ref[:] = jnp.zeros_like(dx_ref)
    dsh_ref[:] = jnp.zeros_like(dsh_ref)
    dw_ref[:] = jnp.zeros_like(dw_ref)
    for off, v in dx_acc.items():
        dx_ref[:, off : off + v.shape[-1]] = v
    for off, s in dsh_acc.items():
        dsh_ref[:, off : off + 1] = s
    for off, u in dw_acc.items():
        dw_ref[:, off : off + u.shape[-1]] = u


def make_first_order_dtp(terms, d_in, d_sh, d_w, d_out, tile, interpret,
                         shared_w: bool):
    w_spec = _lane_spec(tile, d_w, shared_w)

    def fwd_call(x, sh, w):
        E = sh.shape[0]
        return pl.pallas_call(
            functools.partial(_t_kernel, terms),
            out_shape=jax.ShapeDtypeStruct((E, d_out), sh.dtype),
            grid=(E // tile,),
            in_specs=[
                pl.BlockSpec((tile, d_in), lambda i: (i, 0)),
                pl.BlockSpec((tile, d_sh), lambda i: (i, 0)),
                w_spec,
            ],
            out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0)),
            interpret=interpret,
        )(x, sh, w)

    def bwd_call(x, sh, w, g):
        E = sh.shape[0]
        return pl.pallas_call(
            functools.partial(_fused_bwd_kernel, terms),
            out_shape=(
                jax.ShapeDtypeStruct((E, d_in), sh.dtype),
                jax.ShapeDtypeStruct((E, d_sh), sh.dtype),
                jax.ShapeDtypeStruct((E, d_w), sh.dtype),
            ),
            grid=(E // tile,),
            in_specs=[
                pl.BlockSpec((tile, d_in), lambda i: (i, 0)),
                pl.BlockSpec((tile, d_sh), lambda i: (i, 0)),
                w_spec,
                pl.BlockSpec((tile, d_out), lambda i: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((tile, d_in), lambda i: (i, 0)),
                pl.BlockSpec((tile, d_sh), lambda i: (i, 0)),
                pl.BlockSpec((tile, d_w), lambda i: (i, 0)),
            ),
            interpret=interpret,
        )(x, sh, w, g)

    @jax.custom_vjp
    def dtp(x, sh, w):
        return fwd_call(x, sh, w)

    def f(x, sh, w):
        return fwd_call(x, sh, w), (x, sh, w)

    def b(res, g):
        x, sh, w = res
        dx, dsh, dw = bwd_call(x, sh, w, g)
        if shared_w:
            dw = jnp.sum(dw, axis=0, keepdims=True)
        return dx, dsh, dw

    dtp.defvjp(f, b)
    return dtp


# ------------------------------------------------------------- lane packing
# For mul < 128 blocks the [T, mul] FMA tiles use only mul/128 of the vector
# lanes.  PackedPallasDTP splits the plan into mul-groups and packs
# p = 128 // mul edges side-by-side in each lane row (a pure jnp
# reshape/transpose outside the primitives, so autodiff passes through), so
# every kernel FMA runs at full 128-lane width.  The uvu depthwise structure
# makes groups closed: an instruction's input block, weights and output block
# all share the same multiplicity.


def _pack_factor(mul: int) -> int:
    return 128 // mul if (mul < 128 and 128 % mul == 0) else 1


def _pack_blocks(x, blocks, p):
    """x [E, sum(d*mul)] with the given (offset, d, mul) blocks -> [E/p, sum(d*mul*p)].

    Each block [E, d, mul] becomes [E/p, d, p*mul] (p edges side by side).
    For p == 1 this still slices out and concatenates the group's blocks."""
    E = x.shape[0]
    pieces = []
    for off, d, mul in blocks:
        blk = x[:, off : off + d * mul].reshape(E // p, p, d, mul)
        blk = jnp.transpose(blk, (0, 2, 1, 3)).reshape(E // p, d * p * mul)
        pieces.append(blk)
    return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]


def _unpack_blocks(y, blocks, p, E):
    pieces = []
    off_packed = 0
    for off, d, mul in blocks:
        blk = y[:, off_packed : off_packed + d * p * mul]
        blk = blk.reshape(E // p, d, p, mul)
        blk = jnp.transpose(blk, (0, 2, 1, 3)).reshape(E, d * mul)
        pieces.append(blk)
        off_packed += d * p * mul
    return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]


def _pack_cols(cols, mul, p):
    """[E, L] -> [E/p, L*128] with col value repeated per copy of its edge."""
    E, L = cols.shape
    rep = jnp.broadcast_to(cols[:, :, None], (E, L, mul))
    rep = rep.reshape(E // p, p, L, mul)
    rep = jnp.transpose(rep, (0, 2, 1, 3)).reshape(E // p, L * p * mul)
    return rep


class PackedPallasDTP:
    """Lane-packed depthwise TP; same semantics as PallasDTP (external raw
    weights, fan-in rescale folded)."""

    def __init__(self, tp: TensorProduct, tile_rows: int = 128,
                 interpret: Optional[bool] = None):
        self.tp = tp
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.tile_rows = tile_rows
        base_terms = _plan_terms(tp, fold_rescale=True)

        in_slices = tp.irreps_in1.slices()
        out_slices = tp.irreps_out.slices()
        # group instructions by multiplicity
        groups = {}
        for idx, ins in enumerate(tp.instructions):
            mul = tp.irreps_in1[ins.i_in1].mul
            groups.setdefault(mul, []).append(idx)

        self.groups = []
        L = tp.irreps_in2.dim
        for mul, idxs in sorted(groups.items()):
            p = _pack_factor(mul)
            # input blocks of this group (unique, ordered)
            in_blocks = []
            seen = set()
            for idx in idxs:
                b = tp.instructions[idx].i_in1
                if b not in seen:
                    seen.add(b)
                    in_blocks.append(
                        (in_slices[b].start, tp.irreps_in1[b].ir.dim, mul)
                    )
            in_pos = {blk[0]: i for i, blk in enumerate(in_blocks)}
            in_off_packed = {}
            acc = 0
            for off, d, m in in_blocks:
                in_off_packed[off] = acc
                acc += d * p * m
            d_a = acc
            # weight blocks (one per instruction, width mul)
            w_blocks = []
            w_off_packed = {}
            acc = 0
            for idx in idxs:
                off = tp._offsets[idx]
                w_blocks.append((off, 1, mul))
                w_off_packed[off] = acc
                acc += p * mul
            d_b = acc
            # output blocks (one per instruction, width d3*mul)
            o_blocks = []
            o_off_packed = {}
            acc = 0
            for idx in idxs:
                b = tp.instructions[idx].i_out
                off = out_slices[b].start
                d3 = tp.irreps_out[b].ir.dim
                o_blocks.append((off, d3, mul))
                o_off_packed[off] = acc
                acc += d3 * p * mul
            d_out = acc
            # remap the terms of this group to packed offsets (lane width p*mul)
            idxset = set(idxs)
            gterms = []
            for t in base_terms:
                # identify the instruction of this term by weight offset
                if not any(tp._offsets[idx] == t.b_off and idx in idxset for idx in idxs):
                    continue
                # within-block component indices
                in_base = max(o for o in in_off_packed if o <= t.a_off and
                              any(ib[0] == o for ib in in_blocks))
                # find owning input block
                own = None
                for off, d, m in in_blocks:
                    if off <= t.a_off < off + d * m:
                        own = (off, d, m)
                        break
                i_comp = (t.a_off - own[0]) // mul
                own_out = None
                for off, d3, m in o_blocks:
                    if off <= t.out_off < off + d3 * m:
                        own_out = (off, d3, m)
                        break
                k_comp = (t.out_off - own_out[0]) // mul
                gterms.append(
                    Term(
                        a_off=in_off_packed[own[0]] + i_comp * p * mul,
                        col_off=t.col_off,  # handled via packed cols lane tiles
                        b_off=w_off_packed[t.b_off],
                        out_off=o_off_packed[own_out[0]] + k_comp * p * mul,
                        mul=p * mul,
                        coeff=t.coeff,
                    )
                )
            self.groups.append(dict(
                mul=mul, p=p, idxs=idxs, in_blocks=in_blocks, w_blocks=w_blocks,
                o_blocks=o_blocks, terms=tuple(gterms), d_a=d_a, d_b=d_b,
                d_out=d_out,
            ))
        self._lcm_pad = int(np.lcm.reduce([g["p"] for g in self.groups])) * tile_rows

    def __call__(self, x, sh, w):
        E0 = x.shape[0]
        pad = (-E0) % self._lcm_pad
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            sh = jnp.pad(sh, ((0, pad), (0, 0)))
            w = jnp.pad(w, ((0, pad), (0, 0)))
        E = x.shape[0]
        tp = self.tp
        out_slices = tp.irreps_out.slices()
        out_pieces = {}
        for g in self.groups:
            p, mul = g["p"], g["mul"]
            xg = _pack_blocks(x, g["in_blocks"], p)
            wg = _pack_blocks(w, g["w_blocks"], p)
            if p > 1:
                colg = _pack_cols(sh, mul, p)
                d_col = sh.shape[1] * p * mul
                # terms use col lane tiles of width p*mul at j*(p*mul)
                terms = tuple(
                    Term(t.a_off, t.col_off * p * mul, t.b_off, t.out_off,
                         t.mul, t.coeff)
                    for t in g["terms"]
                )
                kernel = _t_kernel_packed
            else:
                colg = sh
                d_col = sh.shape[1]
                terms = g["terms"]
                kernel = None
            rows = E // p
            tile = self.tile_rows
            if kernel is None:
                out_g = t_apply(
                    xg, colg, wg, terms=terms, d_a=g["d_a"], d_col=d_col,
                    d_b=g["d_b"], d_out=g["d_out"], tile=tile,
                    interpret=self.interpret,
                )
            else:
                out_g = t_packed_apply(
                    xg, colg, wg, terms=terms, d_a=g["d_a"], d_col=d_col,
                    d_b=g["d_b"], d_out=g["d_out"], tile=tile,
                    interpret=self.interpret,
                )
            out_g = _unpack_blocks(out_g, g["o_blocks"], p, E)
            # scatter group blocks into final output order
            off_unpacked = 0
            for off, d3, m in g["o_blocks"]:
                out_pieces[off] = out_g[:, off_unpacked : off_unpacked + d3 * m]
                off_unpacked += d3 * m
        ordered = [out_pieces[s.start] for s in out_slices]
        out = jnp.concatenate(ordered, axis=-1)
        return out[:E0] if pad else out


def _t_kernel_packed(terms, a_ref, col_ref, b_ref, out_ref):
    """Same FMA structure as _t_kernel but the column operand is a packed
    full-width lane tile instead of a [T, 1] broadcast column."""
    out_acc = {}
    for (out_off, b_off, mul), ts in _group(terms).items():
        acc = None
        for t in ts:
            col = col_ref[:, t.col_off : t.col_off + t.mul]
            a = a_ref[:, t.a_off : t.a_off + t.mul]
            v = (t.coeff * col) * a
            acc = v if acc is None else acc + v
        val = acc * b_ref[:, b_off : b_off + mul]
        key = (out_off, mul)
        out_acc[key] = out_acc.get(key, 0.0) + val
    out_ref[:] = jnp.zeros_like(out_ref)
    for (out_off, mul), val in out_acc.items():
        out_ref[:, out_off : out_off + mul] = val


_tpk_p = jex_core.Primitive("equiformer_dtp_t_packed")


def t_packed_apply(a, col, b, *, terms, d_a, d_col, d_b, d_out, tile, interpret):
    return _tpk_p.bind(a, col, b, terms=terms, d_a=d_a, d_col=d_col, d_b=d_b,
                       d_out=d_out, tile=tile, interpret=interpret)


def _tpk_call(a, col, b, *, terms, d_a, d_col, d_b, d_out, tile, interpret):
    E = a.shape[0]
    return pl.pallas_call(
        functools.partial(_t_kernel_packed, terms),
        out_shape=jax.ShapeDtypeStruct((E, d_out), a.dtype),
        grid=(E // tile,),
        in_specs=[
            pl.BlockSpec((tile, d_a), lambda i: (i, 0)),
            pl.BlockSpec((tile, d_col), lambda i: (i, 0)),
            pl.BlockSpec((tile, d_b), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0)),
        interpret=interpret,
    )(a, col, b)


def _tpk_abstract(a, col, b, *, d_out, **kw):
    return jax.core.ShapedArray((a.shape[0], d_out), a.dtype)


_tpk_p.def_abstract_eval(_tpk_abstract)
_tpk_p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, _tpk_p))
mlir.register_lowering(_tpk_p, mlir.lower_fun(_tpk_call, multiple_results=False))


def _tpk_jvp(primals, tangents, **params):
    a, col, b = primals
    da, dcol, db = tangents
    out = t_packed_apply(a, col, b, **params)
    tan = None
    def add(x, y):
        return y if x is None else x + y
    if type(da) is not ad.Zero:
        tan = add(tan, t_packed_apply(da, col, b, **params))
    if type(dcol) is not ad.Zero:
        tan = add(tan, t_packed_apply(a, dcol, b, **params))
    if type(db) is not ad.Zero:
        tan = add(tan, t_packed_apply(a, col, db, **params))
    if tan is None:
        tan = ad.Zero.from_primal_value(out)
    return out, tan


def _tpk_transpose(ct, a, col, b, *, terms, d_a, d_col, d_b, d_out, tile, interpret):
    # fully symmetric trilinear with all-lane operands: every transpose is the
    # same primitive with two slots swapped in the term list
    if type(ct) is ad.Zero:
        return None, None, None
    ct_a = ct_col = ct_b = None
    if ad.is_undefined_primal(a):
        t = tuple(Term(x.out_off, x.col_off, x.b_off, x.a_off, x.mul, x.coeff) for x in terms)
        ct_a = t_packed_apply(ct, col, b, terms=t, d_a=d_out, d_col=d_col,
                              d_b=d_b, d_out=d_a, tile=tile, interpret=interpret)
    if ad.is_undefined_primal(col):
        t = tuple(Term(x.a_off, x.out_off, x.b_off, x.col_off, x.mul, x.coeff) for x in terms)
        ct_col = t_packed_apply(a, ct, b, terms=t, d_a=d_a, d_col=d_out,
                                d_b=d_b, d_out=d_col, tile=tile, interpret=interpret)
    if ad.is_undefined_primal(b):
        t = tuple(Term(x.a_off, x.col_off, x.out_off, x.b_off, x.mul, x.coeff) for x in terms)
        ct_b = t_packed_apply(a, col, ct, terms=t, d_a=d_a, d_col=d_col,
                              d_b=d_out, d_out=d_b, tile=tile, interpret=interpret)
    return ct_a, ct_col, ct_b


ad.primitive_jvps[_tpk_p] = _tpk_jvp
ad.primitive_transposes[_tpk_p] = _tpk_transpose
