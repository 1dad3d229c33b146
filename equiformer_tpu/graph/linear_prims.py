"""Arbitrary-order-differentiable linear graph ops as first-class primitives.

Force models (MD17/DeNS) differentiate the training loss through
``forces = -dE/dpos`` — reverse-over-reverse AD.  ``jax.custom_vjp`` cannot
be linearized (no JVP rule), so the sorted-segment / CSR-Pallas-kernel
backward lowerings used on the first-order path (graph/segment.py) were
unavailable to them and XLA fell back to unsorted scatter-adds — the
reference hits the same ops through torch_scatter inside its force autograd
(graph_attention_transformer_md17.py:318-325, graph_attention_transformer.py:513).

Like the DTP T/R primitives (kernels/dtp_pallas.py), the three ops here form
a family closed under JVP + transpose, so autodiff of ANY order stays on the
fast lowerings by induction:

  take(x, idx)     JVP: take(dx, idx)     transpose: segsum(perm(ct), t_ids)
  segsum(v, ids)   JVP: segsum(dv, ids)   transpose: take(ct, ids)
  perm(x, p)       JVP: perm(dx, p)       transpose: perm(ct, p_inv)

``take`` carries its own transpose recipe as operands: ``t_ids`` are segment
ids that sort the cotangent rows (dst of a dst-sorted edge list) and
``t_perm`` an optional involutive row permutation applied first (the
reverse-twin trick: summing ct over src equals summing ct[rev] over dst,
see graph/segment.gather_add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

__all__ = ["take_rows", "segsum_rows", "permute_rows"]

_take_p = jex_core.Primitive("equiformer_take_rows")
_segsum_p = jex_core.Primitive("equiformer_segsum_rows")
_perm_p = jex_core.Primitive("equiformer_permute_rows")


# ------------------------------------------------------------------ wrappers
def take_rows(x, idx, *, t_ids=None, t_perm=None, t_sorted: bool = False):
    """``x[idx]`` whose transpose is a (sorted, CSR-eligible) segment sum.

    ``t_ids``: segment ids such that ``segsum(ct[t_perm], t_ids)`` equals the
    scatter-add of ``ct`` over ``idx`` (defaults to ``idx`` itself with
    ``t_sorted=False`` — a plain unsorted scatter).  ``t_perm`` must be an
    involution when given (``t_perm[t_perm] == iota``); rows where the
    cotangent is zero may map anywhere.
    """
    if t_ids is None:
        t_ids = idx
    has_perm = t_perm is not None
    if t_perm is None:
        t_perm = idx  # dummy operand, never read
    return _take_p.bind(
        x, idx, t_perm, t_ids,
        num_rows=x.shape[0], t_has_perm=has_perm, t_sorted=t_sorted,
    )


def segsum_rows(v, ids, num_segments: int, *, sorted: bool = False,
                use_csr: bool = False, csr_k: int = 256):
    """Segment sum of ``v`` [E, ...] by ``ids`` into ``num_segments`` rows,
    differentiable to arbitrary order.  ``use_csr`` lowers through the CSR
    node-tile Pallas kernel (caller checks eligibility)."""
    return _segsum_p.bind(
        v, ids, num_segments=num_segments, sorted=sorted, use_csr=use_csr,
        csr_k=csr_k,
    )


def permute_rows(x, perm, perm_inv=None):
    """``x[perm]`` for a permutation; transpose gathers by ``perm_inv``
    (defaults to ``perm`` — an involution)."""
    if perm_inv is None:
        perm_inv = perm
    return _perm_p.bind(x, perm, perm_inv)


# ------------------------------------------------------------- abstract eval
def _take_abstract(x, idx, t_perm, t_ids, *, num_rows, t_has_perm, t_sorted):
    return jax.core.ShapedArray((idx.shape[0],) + x.shape[1:], x.dtype)


def _segsum_abstract(v, ids, *, num_segments, sorted, use_csr, csr_k):
    return jax.core.ShapedArray((num_segments,) + v.shape[1:], v.dtype)


def _perm_abstract(x, perm, perm_inv):
    return jax.core.ShapedArray(x.shape, x.dtype)


_take_p.def_abstract_eval(_take_abstract)
_segsum_p.def_abstract_eval(_segsum_abstract)
_perm_p.def_abstract_eval(_perm_abstract)


# ------------------------------------------------------------------ lowering
def _take_impl(x, idx, t_perm, t_ids, *, num_rows, t_has_perm, t_sorted):
    return jnp.take(x, idx, axis=0)


def _segsum_impl(v, ids, *, num_segments, sorted, use_csr, csr_k):
    if use_csr:
        from ..kernels.segment_csr_pallas import csr_segment_sum_impl

        shape = v.shape
        if v.ndim == 3:  # [E, H, D]: the sum is elementwise over trailing dims
            v = v.reshape(shape[0], -1)
        out = csr_segment_sum_impl(v, ids, num_segments, K=csr_k)
        if len(shape) == 3:
            out = out.reshape((num_segments,) + shape[1:])
        return out
    return jax.ops.segment_sum(v, ids, num_segments=num_segments,
                               indices_are_sorted=sorted)


def _perm_impl(x, perm, perm_inv):
    return jnp.take(x, perm, axis=0)


for p, impl in ((_take_p, _take_impl), (_segsum_p, _segsum_impl),
                (_perm_p, _perm_impl)):
    p.def_impl(functools.partial(jax.interpreters.xla.apply_primitive, p))
    mlir.register_lowering(p, mlir.lower_fun(impl, multiple_results=False))


# ----------------------------------------------------------------------- JVP
def _is_zero(t):
    return type(t) is ad.Zero


def _take_jvp(primals, tangents, **params):
    x, idx, t_perm, t_ids = primals
    dx = tangents[0]
    out = _take_p.bind(x, idx, t_perm, t_ids, **params)
    if _is_zero(dx):
        return out, ad.Zero.from_primal_value(out)
    return out, _take_p.bind(dx, idx, t_perm, t_ids, **params)


def _segsum_jvp(primals, tangents, **params):
    v, ids = primals
    dv = tangents[0]
    out = _segsum_p.bind(v, ids, **params)
    if _is_zero(dv):
        return out, ad.Zero.from_primal_value(out)
    return out, _segsum_p.bind(dv, ids, **params)


def _perm_jvp(primals, tangents, **params):
    x, perm, perm_inv = primals
    dx = tangents[0]
    out = _perm_p.bind(x, perm, perm_inv)
    if _is_zero(dx):
        return out, ad.Zero.from_primal_value(out)
    return out, _perm_p.bind(dx, perm, perm_inv)


ad.primitive_jvps[_take_p] = _take_jvp
ad.primitive_jvps[_segsum_p] = _segsum_jvp
ad.primitive_jvps[_perm_p] = _perm_jvp


# ----------------------------------------------------------------- transpose
def _csr_ok(ct, sorted):
    """Mirror segment._csr_eligible for the transpose-generated segment sum."""
    from .segment import _csr_min_cols, _csr_scatter_enabled, _flat_cols

    return (
        sorted
        and ct.ndim in (2, 3)
        and _flat_cols(ct) >= _csr_min_cols()
        and _csr_scatter_enabled()
    )


def _take_transpose(ct, x, idx, t_perm, t_ids, *, num_rows, t_has_perm,
                    t_sorted):
    assert ad.is_undefined_primal(x)
    if type(ct) is ad.Zero:
        return None, None, None, None
    if t_has_perm:
        ct = _perm_p.bind(ct, t_perm, t_perm)  # involution
    ct_x = _segsum_p.bind(
        ct, t_ids, num_segments=num_rows, sorted=t_sorted,
        use_csr=_csr_ok(ct, t_sorted), csr_k=256,
    )
    return ct_x, None, None, None


def _segsum_transpose(ct, v, ids, *, num_segments, sorted, use_csr, csr_k):
    assert ad.is_undefined_primal(v)
    if type(ct) is ad.Zero:
        return None, None
    ct_v = _take_p.bind(
        ct, ids, ids, ids,
        num_rows=num_segments, t_has_perm=False, t_sorted=sorted,
    )
    return ct_v, None


def _perm_transpose(ct, x, perm, perm_inv):
    assert ad.is_undefined_primal(x)
    if type(ct) is ad.Zero:
        return None, None, None
    return _perm_p.bind(ct, perm_inv, perm), None, None


ad.primitive_transposes[_take_p] = _take_transpose
ad.primitive_transposes[_segsum_p] = _segsum_transpose
ad.primitive_transposes[_perm_p] = _perm_transpose
