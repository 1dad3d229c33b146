"""CSR-style segment sum over dst-sorted edges (Pallas TPU kernel).

Replaces XLA's sorted scatter-add lowering for the attention-aggregation
scatters (reference torch_scatter.scatter at
/root/reference/nets/graph_attention_transformer.py:513 and the
EdgeDegreeEmbedding/ScaledScatter sums at :693-706) with a node-tile kernel:

  grid = node tiles of 128.  A scalar-prefetched row-pointer array gives each
  tile its edge range [s, e) in the dst-sorted edge list (padding edges carry
  dst = last node, so dst is globally non-decreasing — graph/radius_graph.py).
  The range is covered by K-aligned edge chunks DMA'd HBM->VMEM with double
  buffering; for each chunk the segment membership matrix
  ``M[u, k] = (dst[k] == tile_base + u)`` is built from a broadcasted iota
  and the partial sum lands on the MXU as ``acc += M @ val_chunk``.  Edges of
  a chunk that belong to neighbouring tiles simply fail the equality test, so
  chunk alignment needs no head/tail masking.

The backward of a segment sum is the gather ``g[dst]`` — XLA's gather with a
custom_vjp wrapper here, so only the forward needs the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(K, C, tstart, val_hbm, dst_hbm, out_ref, vbuf, dbuf, acc, vsem, dsem):
    i = pl.program_id(0)
    base = i * LANE
    kk = jnp.int32(K)
    s = tstart[i]
    e = tstart[i + 1]
    c0 = lax.div(s, kk)
    c1 = lax.div(e + kk - jnp.int32(1), kk)  # exclusive chunk bound

    def start_dma(c, slot):
        pltpu.make_async_copy(
            val_hbm.at[pl.ds(c * K, K), :], vbuf.at[slot], vsem.at[slot]
        ).start()
        # dst is laid out [1, E]: the K-aligned column slice keeps the lane
        # start a multiple of 128 (sublane-dim slices of size 1 are not)
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * K, K)], dbuf.at[slot], dsem.at[slot]
        ).start()

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            val_hbm.at[pl.ds(c * K, K), :], vbuf.at[slot], vsem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * K, K)], dbuf.at[slot], dsem.at[slot]
        ).wait()

    acc[:] = jnp.zeros_like(acc)

    @pl.when(c0 < c1)
    def _():
        start_dma(c0, lax.rem(c0, jnp.int32(2)))

    rows = base + lax.broadcasted_iota(jnp.int32, (LANE, K), 0)

    def body(c, carry):
        slot = lax.rem(c, jnp.int32(2))

        @pl.when(c + 1 < c1)
        def _():
            start_dma(c + 1, lax.rem(c + 1, jnp.int32(2)))

        wait_dma(c, slot)
        m = (dbuf[slot] == rows).astype(vbuf.dtype)  # [LANE, K]
        acc[:] += lax.dot_general(
            m, vbuf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    lax.fori_loop(c0, c1, body, 0)
    out_ref[:] = acc[:].astype(out_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnums=(3, 4))
def _csr_call(val, dst2, tstart, K: int, interpret: bool):
    E, C = val.shape
    n_tiles = tstart.shape[0] - 1
    return pl.pallas_call(
        functools.partial(_kernel, K, C),
        out_shape=jax.ShapeDtypeStruct((n_tiles * LANE, C), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # val stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # dst [1, E]
            ],
            out_specs=pl.BlockSpec((LANE, C), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, K, C), val.dtype),
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.VMEM((LANE, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(tstart, val, dst2)


def _csr_padded_impl(val, dst, num_nodes: int, K: int, interpret: bool):
    """val [E, C] (E % K == 0, C % 128 == 0), dst non-decreasing int32 [E].
    Returns [num_nodes_padded, C] with num_nodes_padded = round_up(num_nodes,
    128); rows past the real node count receive only edges the caller already
    zeroed."""
    n_pad = _round_up(num_nodes, LANE)
    tstart = jnp.searchsorted(
        dst, jnp.arange(0, n_pad + 1, LANE, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    dst2 = dst.reshape(1, val.shape[0])
    return _csr_call(val, dst2, tstart, K, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _csr_segment_sum_padded(val, dst, num_nodes: int, K: int, interpret: bool):
    return _csr_padded_impl(val, dst, num_nodes, K, interpret)


def _csr_fwd(val, dst, num_nodes, K, interpret):
    return _csr_segment_sum_padded(val, dst, num_nodes, K, interpret), dst


def _csr_bwd(num_nodes, K, interpret, dst, g):
    return g[dst], None


_csr_segment_sum_padded.defvjp(_csr_fwd, _csr_bwd)


def _pad_and_call(padded_fn, val, dst, num_nodes, K, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    E, C = val.shape
    Ep, Cp = _round_up(E, K), _round_up(C, LANE)
    if Cp != C:
        val = jnp.pad(val, ((0, 0), (0, Cp - C)))
    if Ep != E:
        val = jnp.pad(val, ((0, Ep - E), (0, 0)))
        dst = jnp.pad(dst, (0, Ep - E), constant_values=num_nodes - 1)
    out = padded_fn(val, dst.astype(jnp.int32), num_nodes, K, interpret)
    return out[:num_nodes, :C]


def csr_segment_sum(
    val: jnp.ndarray,
    dst: jnp.ndarray,
    num_nodes: int,
    mask: Optional[jnp.ndarray] = None,
    K: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Segment sum of ``val`` [E, C] by non-decreasing ``dst`` into
    ``num_nodes`` rows.  Pads E to the chunk size (pad edges get the last
    node id + zero values) and C to the lane width; masked edges are zeroed
    before the kernel (identical to graph/segment.segment_sum).  First-order
    AD (custom_vjp gather backward); arbitrary-order callers go through
    :func:`csr_segment_sum_impl` under graph/linear_prims' segsum primitive."""
    if mask is not None:
        val = jnp.where(mask[:, None], val, 0)
    return _pad_and_call(_csr_segment_sum_padded, val, dst, num_nodes, K,
                         interpret)


def csr_segment_sum_impl(
    val: jnp.ndarray,
    dst: jnp.ndarray,
    num_nodes: int,
    K: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """csr_segment_sum without the custom_vjp wrapper — the lowering body for
    the arbitrary-order segsum primitive (graph/linear_prims.py), whose AD
    rules live at the primitive level."""
    return _pad_and_call(_csr_padded_impl, val, dst, num_nodes, K, interpret)
