"""Head reshaping helpers for equivariant multi-head attention.

Equivalent of Vec2AttnHeads / AttnHeads2Vec
(graph_attention_transformer.py:251-316): flat irreps features with per-block
multiplicity mul*num_heads are reshaped to [N, heads, irreps_head.dim] and
back.  Pure reshapes — XLA fuses them away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.irreps import Irreps


def _csr_attention_enabled() -> bool:
    """Fused softmax+dropout+combine kernel (kernels/attn_csr_pallas.py); on
    by default wherever the CSR scatter is.  EQUIFORMER_TPU_CSR_ATTN=0/1
    overrides (for A/B benchmarking)."""
    import os

    env = os.environ.get("EQUIFORMER_TPU_CSR_ATTN")
    if env is not None:
        return env not in ("0", "false", "False")
    from ..graph.segment import _csr_scatter_enabled

    return _csr_scatter_enabled()


def softmax_dropout_combine(module, alpha, value, edges, num_nodes: int,
                            alpha_drop: float, deterministic: bool,
                            higher_order: bool) -> jnp.ndarray:
    """The attention aggregation tail shared by GraphAttention and
    DotProductAttention: ``p = segment_softmax(alpha, dst)``, alpha dropout,
    ``out = segment_sum(p * value, dst)``  (reference
    graph_attention_transformer.py:508-513).

    ``alpha`` [E, H] are pre-softmax logits; ``value`` [E, H, D].  On TPU with
    first-order AD the whole tail runs as one CSR node-tile kernel whose
    backward needs no scatters (kernels/attn_csr_pallas.py); otherwise the
    composed custom-VJP ops.  Both branches draw the same dropout mask from
    ``module.make_rng('dropout')``, so the A/B is bit-reproducible."""
    from ..graph.segment import segment_softmax, segment_sum

    H, D = value.shape[1], value.shape[2]
    use_fused = (
        not higher_order
        and H * D >= 128  # narrow combines: DMA padding outweighs the fusion
        and _csr_attention_enabled()
    )
    dropmul = None
    if alpha_drop != 0.0 and not deterministic:
        rng = module.make_rng("dropout")
        keep = 1.0 - alpha_drop
        dropmul = jax.random.bernoulli(rng, keep, alpha.shape).astype(
            alpha.dtype
        ) / keep
    if use_fused:
        from ..kernels.attn_csr_pallas import csr_attention_combine

        return csr_attention_combine(
            alpha, value, edges.dst, num_nodes, mask=edges.mask,
            dropmul=dropmul,
        )
    p = segment_softmax(alpha, edges.dst, num_nodes, mask=edges.mask,
                        sorted=True, higher_order=higher_order)
    if dropmul is not None:
        p = p * dropmul
    return segment_sum(value * p[..., None], edges.dst, num_nodes,
                       mask=edges.mask, sorted=True, higher_order=higher_order)


def vec2heads(irreps_head: Irreps, num_heads: int, x: jnp.ndarray) -> jnp.ndarray:
    """[N, sum(mul*H*dim)] -> [N, H, irreps_head.dim] (component-major blocks).

    Flat block layout is [d, H*mul] with heads major in the lane axis; each
    head keeps its copies contiguous: [d, H, mul] -> [H, d, mul].
    """
    pieces = []
    i = 0
    for mul, ir in irreps_head:
        size = mul * ir.dim * num_heads
        blk = x[..., i : i + size]
        blk = blk.reshape(blk.shape[:-1] + (ir.dim, num_heads, mul))
        blk = jnp.swapaxes(blk, -3, -2)  # [..., H, d, mul]
        pieces.append(blk.reshape(blk.shape[:-2] + (ir.dim * mul,)))
        i += size
    return jnp.concatenate(pieces, axis=-1)


def heads2vec(irreps_head: Irreps, x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, irreps_head.dim] -> [N, H*irreps_head.dim] (inverse of vec2heads)."""
    pieces = []
    i = 0
    H = x.shape[-2]
    for mul, ir in irreps_head:
        size = mul * ir.dim
        blk = x[..., i : i + size]
        blk = blk.reshape(blk.shape[:-1] + (ir.dim, mul))  # [..., H, d, mul]
        blk = jnp.swapaxes(blk, -3, -2)  # [..., d, H, mul]
        pieces.append(blk.reshape(blk.shape[:-3] + (ir.dim * H * mul,)))
        i += size
    return jnp.concatenate(pieces, axis=-1)


def heads_irreps(irreps_head: Irreps, num_heads: int) -> Irreps:
    """Flat irreps corresponding to num_heads stacked heads, sorted+simplified
    the way the reference builds irreps_attn_heads
    (graph_attention_transformer.py:434-436)."""
    irr = Irreps(irreps_head) * num_heads
    irr, _, _ = irr.sort_even_first()
    return irr.simplify()


def concat_irreps(irreps_1, irreps_2, x1: jnp.ndarray, x2: jnp.ndarray):
    """Irreps-aligned concatenation of two feature tensors: blocks of the same
    (l, p) are placed adjacently so the result is sorted by (l, even-first).

    Equivalent of the reference ConcatIrrepsTensor
    (graph_attention_transformer.py:319-399).  Returns (features, irreps_out).
    """
    from ..core.irreps import Irreps

    irreps_1, irreps_2 = Irreps(irreps_1), Irreps(irreps_2)
    s1, s2 = irreps_1.slices(), irreps_2.slices()
    lmax = max(irreps_1.lmax, irreps_2.lmax)
    pieces = []
    out = []
    for l in range(lmax + 1):
        for p in (1, -1):
            # component-major blocks merge multiplicities on the lane axis,
            # so gather all matching [., d, mul] views and concat on mul
            views = []
            total_mul = 0
            for irr, sl, x in ((irreps_1, s1, x1), (irreps_2, s2, x2)):
                for bi, (mul, ir) in enumerate(irr):
                    if ir.l == l and ir.p == p:
                        blk = x[..., sl[bi]]
                        views.append(blk.reshape(blk.shape[:-1] + (ir.dim, mul)))
                        total_mul += mul
            if not views:
                continue
            merged = views[0] if len(views) == 1 else jnp.concatenate(views, axis=-1)
            pieces.append(merged.reshape(merged.shape[:-2] + ((2 * l + 1) * total_mul,)))
            out.append((total_mul, (l, p)))
    out_irreps = Irreps(out)
    return jnp.concatenate(pieces, axis=-1), out_irreps
