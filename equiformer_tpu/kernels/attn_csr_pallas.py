"""Fused CSR attention combine (segment softmax + dropout + weighted sum).

Replaces the attention aggregation tail
``p = segment_softmax(alpha, dst); out = segment_sum(p*drop*value, dst)``
(reference torch_geometric.utils.softmax + torch_scatter.scatter at
/root/reference/nets/graph_attention_transformer.py:508-513) for dst-sorted
edge lists with the *unnormalized* formulation

    out_u = (sum_{e: dst_e=u} exp(s_e - m) * drop_e * value_e)
            / (sum_{e: dst_e=u} exp(s_e - m))

so numerator and denominator ride ONE pass of the CSR node-tile segment-sum
kernel (kernels/segment_csr_pallas.py) over ``concat([value * rep(ex*drop),
ex], axis=1)``.  Compared with the composed lowering this removes

* the [E, H] softmax-denominator scatter (too narrow for the CSR kernel on
  its own, so it previously fell to XLA's scatter-add),
* the per-edge probability materialization + denominator gather,

and the backward needs **no scatters at all**: with ``r_u = <gout_u, out_u>``
per head (a per-node elementwise reduction of saved outputs),

    dscore_e = p_e * (drop_e * <value_e, gout[dst_e]> - r[dst_e])
    dvalue_e = p_e * drop_e * gout[dst_e]   (expanded over the head dim)

— only gathers and elementwise math, since the segment structure is already
summarized by the forward's ``denom``/``out``.  The stability shift is a
global per-head max (same contract as graph/segment.sorted_segment_softmax).

First-order AD only (custom_vjp); force models keep the composed ops.

An earlier bespoke single-kernel variant DMA'd the narrow [E, H] score array
in [K, H] chunks and failed Mosaic's lane-tiling check on real TPU
("slice along dimension 1 must be aligned to (128), but is 4"); packing the
per-head exponentials into the (lane-padded anyway) value concat reuses the
already-validated kernel instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .segment_csr_pallas import csr_segment_sum

NEG = -1e30  # masked-edge score: exp underflows to exactly 0 in fp32


def _shift(scores):
    # floor the shift so an all-masked column (scores == NEG everywhere)
    # keeps exp(NEG - m) == 0 instead of exp(0) == 1
    return jnp.maximum(jnp.max(scores, axis=0), NEG * 1e-8)


def _fwd_impl(scores, val, dropmul, dst, num_nodes: int, H: int, K: int,
              interpret):
    E, HD = val.shape
    D = HD // H
    ex = jnp.exp((scores - _shift(scores)).astype(jnp.float32))  # [E, H]
    exv = ex if dropmul is None else ex * dropmul.astype(jnp.float32)
    weighted = (val.astype(jnp.float32) * jnp.repeat(exv, D, axis=1)).astype(
        val.dtype
    )
    cat = jnp.concatenate([weighted, ex.astype(val.dtype)], axis=1)
    s = csr_segment_sum(cat, dst, num_nodes, K=K, interpret=interpret)
    den = jnp.maximum(s[:, HD:].astype(jnp.float32), 1e-16)  # [N, H]
    out = (s[:, :HD].astype(jnp.float32) / jnp.repeat(den, D, axis=1)).astype(
        val.dtype
    )
    return out, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _csr_attention(scores, val, dropmul, dst, num_nodes: int, H: int, K: int,
                   interpret):
    out, _ = _fwd_impl(scores, val, dropmul, dst, num_nodes, H, K, interpret)
    return out


def _csr_attention_fwd(scores, val, dropmul, dst, num_nodes, H, K, interpret):
    out, den = _fwd_impl(scores, val, dropmul, dst, num_nodes, H, K, interpret)
    return out, (scores, val, dropmul, dst, out, den)


def _csr_attention_bwd(num_nodes, H, K, interpret, res, g):
    scores, val, dropmul, dst, out, den = res
    E, HD = val.shape
    D = HD // H
    ex = jnp.exp((scores - _shift(scores)).astype(jnp.float32))  # [E, H]
    p = ex / den[dst]  # [E, H] f32; masked edges (scores=NEG) -> 0
    gd = g[dst]  # [E, HD]
    # r_u[h] = <gout_u, out_u> per head; per-node elementwise, no scatter
    r = jnp.sum((g * out).astype(jnp.float32).reshape(-1, H, D), axis=2)
    q = jnp.sum((val * gd).astype(jnp.float32).reshape(E, H, D), axis=2)
    drop = 1.0 if dropmul is None else dropmul.astype(jnp.float32)
    dscores = (p * (drop * q - r[dst])).astype(scores.dtype)
    pv = (p * drop).astype(val.dtype)
    dvalue = jnp.repeat(pv, D, axis=1) * gd
    ddrop = None if dropmul is None else jnp.zeros_like(dropmul)
    return dscores, dvalue, ddrop, None


_csr_attention.defvjp(_csr_attention_fwd, _csr_attention_bwd)


def csr_attention_combine(
    scores: jnp.ndarray,
    value: jnp.ndarray,
    dst: jnp.ndarray,
    num_nodes: int,
    mask: Optional[jnp.ndarray] = None,
    dropmul: Optional[jnp.ndarray] = None,
    K: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``segment_sum(segment_softmax(scores, dst) * dropmul * value, dst)``
    for non-decreasing ``dst``.

    scores [E, H]; value [E, H, D]; dropmul (optional) [E, H] — the dropout
    keep-mask divided by the keep rate (a constant multiplier, not
    differentiated).  Returns [num_nodes, H, D].
    """
    E, Hh = scores.shape
    D = value.shape[-1]
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, jnp.asarray(NEG, scores.dtype))
    out = _csr_attention(scores, value.reshape(E, Hh * D), dropmul,
                         dst.astype(jnp.int32), num_nodes, Hh, K, interpret)
    return out.reshape(num_nodes, Hh, D)
