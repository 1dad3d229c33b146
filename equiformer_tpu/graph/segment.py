"""Masked segment reductions over padded edge/node arrays.

TPU-native replacements for torch_scatter.scatter / torch_geometric.utils
(softmax, degree, global pooling) used throughout the reference
(e.g. graph_attention_transformer.py:508,513,517, instance_norm.py).  All
shapes are static; padding is handled with boolean masks so XLA sees dense,
fusable segment ops.
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp


def _csr_scatter_enabled() -> bool:
    """Route wide sorted segment sums through the CSR Pallas kernel
    (kernels/segment_csr_pallas.py) — 2-3x faster than XLA's sorted scatter
    at attention widths on v5e (scripts/seg_sorted_bench.py).  On by default
    on TPU; override with EQUIFORMER_TPU_CSR_SCATTER=0/1."""
    import os

    env = os.environ.get("EQUIFORMER_TPU_CSR_SCATTER")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _csr_min_cols() -> int:
    """Narrowest sum routed to the CSR kernel (narrower inputs are padded to
    the 128 lanes, trading DMA bloat for XLA's scatter; the microbench says
    the kernel still wins at C=64).  EQUIFORMER_TPU_CSR_MIN_COLS overrides."""
    import os

    return int(os.environ.get("EQUIFORMER_TPU_CSR_MIN_COLS", "128"))


def _csr_eligible(data, sorted: bool, higher_order: bool) -> bool:
    return (
        sorted
        and not higher_order  # custom_vjp: first-order AD only
        and data.ndim in (2, 3)
        and _flat_cols(data) >= _csr_min_cols()
        and _csr_scatter_enabled()
    )


def _flat_cols(data) -> int:
    n = 1
    for d in data.shape[1:]:
        n *= d
    return n


def segment_sum(data, segment_ids, num_segments: int, mask=None, sorted: bool = False,
                higher_order: bool = False):
    """Sum ``data`` [E, ...] into ``num_segments`` rows by ``segment_ids``.

    ``sorted=True`` asserts segment_ids are non-decreasing (dst-sorted edges
    from the radius-graph builders, or node batch ids from collate) so XLA
    can use the cheaper sorted-segment lowering; wide sorted sums take the
    CSR Pallas kernel on TPU (see _csr_scatter_enabled).  Force models pass
    ``higher_order=True``: the sum then routes through the segsum primitive
    (graph/linear_prims.py) whose JVP/transpose rules keep every AD order on
    the CSR kernel / sorted lowerings (custom_vjp, used on the first-order
    path, cannot be linearized)."""
    if higher_order:
        from .linear_prims import segsum_rows

        if mask is not None:
            data = jnp.where(_expand(mask, data), data, 0)
        return segsum_rows(
            data, segment_ids, num_segments, sorted=sorted,
            use_csr=_csr_eligible(data, sorted, False),
        )
    if _csr_eligible(data, sorted, higher_order):
        from ..kernels.segment_csr_pallas import csr_segment_sum

        shape = data.shape
        if data.ndim == 3:  # [E, H, D] attention values: sum is elementwise
            data = data.reshape(shape[0], -1)
        out = csr_segment_sum(data, segment_ids, num_segments, mask=mask)
        if len(shape) == 3:
            out = out.reshape((num_segments,) + shape[1:])
        return out
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=sorted)


def segment_mean(data, segment_ids, num_segments: int, mask=None, eps: float = 1e-12,
                 sorted: bool = False):
    total = segment_sum(data, segment_ids, num_segments, mask, sorted=sorted)
    if mask is None:
        count = jax.ops.segment_sum(
            jnp.ones(data.shape[:1], data.dtype), segment_ids, num_segments,
            indices_are_sorted=sorted,
        )
    else:
        count = jax.ops.segment_sum(
            mask.astype(data.dtype), segment_ids, num_segments,
            indices_are_sorted=sorted,
        )
    count = jnp.maximum(count, eps)
    return total / _expand_to(count, total)


def segment_max(data, segment_ids, num_segments: int, mask=None, sorted: bool = False):
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(data.dtype).min, data.dtype)
        data = jnp.where(_expand(mask, data), data, neg)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=sorted)


def segment_softmax(scores, segment_ids, num_segments: int, mask=None,
                    sorted: bool = False, higher_order: bool = False):
    """Numerically stable softmax of ``scores`` [E, ...] grouped by segment.

    Equivalent of ``torch_geometric.utils.softmax(alpha, edge_dst)``
    (graph_attention_transformer.py:508) with padding: masked-out entries get
    probability 0; empty segments produce all-zero probabilities.  By default
    uses a custom VJP (``p*g - p*sum_seg(p*g)[ids]``) so the backward is one
    segment sum — sorted when the ids are — instead of derived scatter-adds;
    ``higher_order=True`` keeps the plain composition (custom_vjp does not
    support the double backward force models need).
    """
    if higher_order:
        return _segment_softmax_composed(scores, segment_ids, num_segments,
                                         mask, sorted, higher_order=True)
    return sorted_segment_softmax(scores, segment_ids, num_segments, mask, sorted)


def _segment_softmax_composed(scores, segment_ids, num_segments: int, mask=None,
                              sorted: bool = False, higher_order: bool = False):
    """The plain composed forward (kept for the custom-vjp impl + tests).

    With ``higher_order=True`` (the force-model path) the denominator sum and
    the per-edge gathers run through the linear_prims primitives so every
    reverse pass uses the sorted-segment lowering instead of XLA's derived
    unsorted scatter-adds."""
    if higher_order:
        from .linear_prims import segsum_rows, take_rows

        def seg_sum(x):
            return segsum_rows(x, segment_ids, num_segments, sorted=sorted,
                               use_csr=_csr_eligible(x, sorted, False))

        def gather(x):
            return take_rows(x, segment_ids, t_ids=segment_ids,
                             t_sorted=sorted)
    else:
        def seg_sum(x):
            return jax.ops.segment_sum(x, segment_ids,
                                       num_segments=num_segments,
                                       indices_are_sorted=sorted)

        def gather(x):
            return x[segment_ids]

    m = segment_max(scores, segment_ids, num_segments, mask, sorted=sorted)
    m = jnp.where(jnp.isfinite(m), m, 0)  # empty segments -> shift of 0
    m = jax.lax.stop_gradient(m)  # any constant shift: softmax-invariant
    shifted = scores - gather(m)
    if mask is not None:
        # zero the masked entries *before* exp so the untaken branch can't
        # overflow and poison gradients through jnp.where
        emask = _expand(mask, shifted)
        shifted = jnp.where(emask, shifted, 0)
        ex = jnp.where(emask, jnp.exp(shifted), 0)
    else:
        ex = jnp.exp(shifted)
    denom = seg_sum(ex)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, scores.dtype))
    return ex / gather(denom)


def degree(segment_ids, num_segments: int, mask=None, dtype=jnp.float32,
           sorted: bool = False):
    """In-degree per node (torch_geometric.utils.degree equivalent)."""
    ones = jnp.ones(segment_ids.shape, dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                               indices_are_sorted=sorted)


def scaled_scatter_sum(data, segment_ids, num_segments: int, avg_aggregate_num: float, mask=None, sorted: bool = False,
                       higher_order: bool = False):
    """Degree-normalized aggregation: segment-sum / sqrt(avg_aggregate_num).

    Reference ``ScaledScatter`` (graph_attention_transformer.py:693-706).
    """
    return segment_sum(data, segment_ids, num_segments, mask, sorted=sorted,
                       higher_order=higher_order) / (
        avg_aggregate_num ** 0.5
    )


def gather_add(xs, xd, src, dst, num_nodes: int, rev=None,
               higher_order: bool = False):
    """``xs[src] + xd[dst]`` with a segment-sum backward.

    The plain composition's backward emits two unsorted scatter-adds; edges
    from the radius-graph builders are dst-sorted, so the dst cotangent can
    take the cheaper indices_are_sorted segment lowering.  When ``rev`` (the
    reverse-twin permutation of a symmetric edge list) is given, the src
    cotangent rides the sorted lowering too: summing g over src equals
    summing g[rev] over dst.  ``num_nodes`` is static (= xs.shape[0]).

    ``higher_order=True`` (force models) builds the same computation from the
    linear_prims take primitive, whose transpose rules encode the identical
    sorted/rev-twin backward but compose to arbitrary AD order.
    """
    if higher_order:
        from .linear_prims import take_rows

        gs = take_rows(xs, src, t_ids=dst, t_perm=rev, t_sorted=True) \
            if rev is not None else take_rows(xs, src)
        gd = take_rows(xd, dst, t_ids=dst, t_sorted=True)
        return gs + gd
    if rev is None:
        return _gather_add(xs, xd, src, dst, num_nodes)
    return _gather_add_rev(xs, xd, src, dst, rev, num_nodes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_add(xs, xd, src, dst, num_nodes: int):
    return xs[src] + xd[dst]


def _gather_add_fwd(xs, xd, src, dst, num_nodes):
    return xs[src] + xd[dst], (src, dst)


def _gather_add_bwd(num_nodes, res, g):
    src, dst = res
    dxs = jax.ops.segment_sum(g, src, num_segments=num_nodes)
    dxd = segment_sum(g, dst, num_nodes, sorted=True)
    return dxs, dxd, None, None


_gather_add.defvjp(_gather_add_fwd, _gather_add_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gather_add_rev(xs, xd, src, dst, rev, num_nodes: int):
    return xs[src] + xd[dst]


def _gather_add_rev_fwd(xs, xd, src, dst, rev, num_nodes):
    return xs[src] + xd[dst], (src, dst, rev)


def _gather_add_rev_bwd(num_nodes, res, g):
    src, dst, rev = res
    # padded-edge cotangents are zero (downstream ops mask padded edges),
    # so the arbitrary rev mapping on padding contributes nothing
    dxs = segment_sum(g[rev], dst, num_nodes, sorted=True)
    dxd = segment_sum(g, dst, num_nodes, sorted=True)
    return dxs, dxd, None, None, None


_gather_add_rev.defvjp(_gather_add_rev_fwd, _gather_add_rev_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def sorted_segment_softmax(scores, segment_ids, num_segments: int, mask, sorted: bool):
    """segment_softmax whose backward uses the sorted-segment lowering.

    Semantics identical to :func:`segment_softmax`; the VJP is computed as
    ``p * (g - sum_seg(p * g)[ids])`` with a single (sorted) segment-sum
    instead of the scatter-adds XLA derives from the composed forward, and
    the stability shift is a global per-column max (exact up to rounding for
    score spreads < ~80, the attention regime; the composed form keeps the
    per-segment shift for unbounded inputs).
    """
    return _global_shift_softmax(scores, segment_ids, num_segments, mask, sorted)


def _global_shift_softmax(scores, segment_ids, num_segments, mask, sorted):
    """Softmax value with a *global* per-column max shift instead of the
    per-segment one: any constant shift leaves the softmax invariant, and the
    shift carries no gradient, so one jnp.max replaces the segment_max.
    Used only inside the custom-vjp fast path."""
    if mask is not None:
        emask = _expand(mask, scores)
        neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
        masked = jnp.where(emask, scores, neg)
    else:
        emask = None
        masked = scores
    m = jnp.max(masked, axis=0)
    m = jnp.where(jnp.isfinite(m), m, 0)
    shifted = scores - m
    if emask is not None:
        shifted = jnp.where(emask, shifted, 0)
        ex = jnp.where(emask, jnp.exp(shifted), 0)
    else:
        ex = jnp.exp(shifted)
    denom = segment_sum(ex, segment_ids, num_segments, sorted=sorted)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, scores.dtype))
    return ex / denom[segment_ids]


def _sorted_softmax_fwd(scores, segment_ids, num_segments, mask, sorted):
    p = _global_shift_softmax(scores, segment_ids, num_segments, mask, sorted)
    return p, (p, segment_ids)


def _sorted_softmax_bwd(num_segments, sorted, res, g):
    p, segment_ids = res
    pg = p * g
    s = segment_sum(pg, segment_ids, num_segments, sorted=sorted)
    return pg - p * s[segment_ids], None, None


sorted_segment_softmax.defvjp(_sorted_softmax_fwd, _sorted_softmax_bwd)


def active_edge_bound(mask):
    """1 + index of the last real edge (0 if none) — the tile-skipping bound
    for the fused edge kernels.  Correct for ANY mask layout: tail-padded
    lists (the radius-graph builders) get full skipping; interleaved masks
    (PBC top-k) simply skip nothing past the last real edge."""
    E = mask.shape[0]
    return jnp.max(jnp.where(mask, jnp.arange(E, dtype=jnp.int32) + 1, 0))


def _expand(mask, data):
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def _expand_to(x, target):
    return x.reshape(x.shape + (1,) * (target.ndim - x.ndim))
