"""O(3) tensor products over irreps features — the compute core of the framework.

Re-implements, TPU-first, the semantics the reference gets from
``e3nn.o3.TensorProduct(path_normalization='none')`` wrapped by
``TensorProductRescale`` (/root/reference/nets/tensor_product_rescale.py:15-141):

* per-path coefficient sqrt(2*l_out+1) on the unit-Frobenius Wigner-3j
  ('component' irrep normalization, no path normalization),
* per-output-slice fan-in ``1/sqrt(fan_in)`` weight rescale ("torch.nn.Linear
  style"); for internal weights this is folded into the init stddev, for
  external (per-edge radial) weights it is applied inside ``apply`` — replacing
  the reference's trick of scaling the radial MLP's last layer
  (graph_attention_transformer.py:206-208) with the mathematically intended
  per-instruction scaling,
* bias on even-scalar output slices.

Design: a ``TensorProduct`` is *static metadata* (instructions, CG constants,
slices).  ``apply(x1, x2, weights)`` is a pure function over flat feature
arrays; all loops run at trace time, so XLA sees a flat fused graph of small
einsums which it vectorizes over nodes/edges.  Connection modes implemented:
'uvw' (fully connected) and 'uvu' (depthwise) — the only modes the reference
models use.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .cg import wigner_3j_component
from .irreps import Irrep, Irreps, MulIrrep


@dataclasses.dataclass(frozen=True)
class Instruction:
    i_in1: int
    i_in2: int
    i_out: int
    mode: str  # 'uvw' | 'uvu'
    has_weight: bool
    path_weight: float = 1.0

    def path_shape(self, irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps):
        m1 = irreps_in1[self.i_in1].mul
        m2 = irreps_in2[self.i_in2].mul
        mo = irreps_out[self.i_out].mul
        if self.mode == "uvw":
            return (m1, m2, mo)
        if self.mode == "uvu":
            if mo != m1:
                raise ValueError("uvu requires mul_out == mul_in1")
            return (m1, m2)
        raise ValueError(f"unsupported connection mode {self.mode}")


def _fan_in(ins: Instruction, irreps_in1: Irreps, irreps_in2: Irreps) -> int:
    """Reference fan-in table, tensor_product_rescale.py:42-52."""
    if ins.mode == "uvw":
        return irreps_in1[ins.i_in1].mul * irreps_in2[ins.i_in2].mul
    if ins.mode == "uvu":
        return irreps_in2[ins.i_in2].mul
    raise ValueError(ins.mode)


def _split(x: jnp.ndarray, irreps: Irreps) -> List[jnp.ndarray]:
    """Split flat [..., dim] into per-block [..., 2l+1, mul] views.

    LAYOUT CONTRACT (TPU-first): this framework stores irreps features
    *component-major*: within each (mul, ir) block the flat order is
    (component, copy), i.e. a [d_ir, mul] matrix.  The multiplicity therefore
    always lands on the last (lane) axis of every intermediate, so XLA tiles
    pad an 8-sublane axis of size 2l+1 instead of a 128-lane axis — avoiding
    up to 25x memory/compute inflation that the e3nn-style [mul, d] layout
    costs on TPU.
    """
    out = []
    i = 0
    for mul, ir in irreps:
        blk = x[..., i : i + mul * ir.dim]
        out.append(blk.reshape(blk.shape[:-1] + (ir.dim, mul)))
        i += mul * ir.dim
    return out


def _merge(blocks: List[jnp.ndarray], irreps: Irreps) -> jnp.ndarray:
    """Inverse of _split: [..., d, mul] blocks -> flat [..., dim]."""
    flat = [
        b.reshape(b.shape[:-2] + (mi.dim,)) for b, mi in zip(blocks, irreps)
    ]
    return jnp.concatenate(flat, axis=-1) if len(flat) > 1 else flat[0]


class TensorProduct:
    """Static tensor-product plan between two irreps inputs.

    Weights are a single flat vector (shared) or array [..., weight_numel]
    (per-sample, e.g. per-edge radial weights), laid out per instruction in
    order, matching e3nn's flat weight layout.
    """

    def __init__(
        self,
        irreps_in1: Irreps,
        irreps_in2: Irreps,
        irreps_out: Irreps,
        instructions: Sequence[Tuple],
        rescale: bool = True,
    ):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)
        self.instructions: List[Instruction] = [
            ins if isinstance(ins, Instruction) else Instruction(*ins)
            for ins in instructions
        ]
        self.rescale = rescale

        # fan-in per output slice = sum over instructions writing to it
        # (tensor_product_rescale.py:86-99).
        fan_in: Dict[int, int] = {}
        for ins in self.instructions:
            fan_in[ins.i_out] = fan_in.get(ins.i_out, 0) + _fan_in(
                ins, self.irreps_in1, self.irreps_in2
            )
        self.slice_sqrt_k: Dict[int, float] = {
            i: (1.0 / math.sqrt(f) if rescale else 1.0) for i, f in fan_in.items()
        }

        # flat weight layout
        self._offsets: List[int] = []
        self._shapes: List[Tuple[int, ...]] = []
        n = 0
        for ins in self.instructions:
            shape = ins.path_shape(self.irreps_in1, self.irreps_in2, self.irreps_out)
            self._offsets.append(n)
            self._shapes.append(shape)
            if ins.has_weight:
                n += int(np.prod(shape))
        self.weight_numel = n

        # CG constants with the component-normalization coefficient folded in.
        self._cg: List[np.ndarray] = []
        for ins in self.instructions:
            l1 = self.irreps_in1[ins.i_in1].ir.l
            l2 = self.irreps_in2[ins.i_in2].ir.l
            l3 = self.irreps_out[ins.i_out].ir.l
            C = wigner_3j_component(l1, l2, l3) * ins.path_weight
            self._cg.append(C)

    # ------------------------------------------------------------------ init
    def weight_std_flat(self) -> np.ndarray:
        """Per-element init stddev for internal weights (fan-in rescaled).

        Reference: e3nn randn init followed by ``weight.data.mul_(sqrt_k)``
        (tensor_product_rescale.py:102-110).
        """
        std = np.ones((self.weight_numel,), dtype=np.float64)
        for ins, off, shape in zip(self.instructions, self._offsets, self._shapes):
            if ins.has_weight:
                std[off : off + int(np.prod(shape))] = self.slice_sqrt_k[ins.i_out]
        return std

    def external_weight_scale(self) -> np.ndarray:
        """Per-element scale applied to externally supplied flat weights."""
        return self.weight_std_flat()

    # --------------------------------------------------------------- forward
    def apply(
        self,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
        scale_weights: bool = False,
    ) -> jnp.ndarray:
        """Compute the tensor product.

        x1: [..., irreps_in1.dim]; x2: [..., irreps_in2.dim];
        weights: flat [weight_numel] (shared) or [..., weight_numel] (per-sample).
        ``scale_weights=True`` applies the fan-in rescale to the supplied
        weights (use for raw radial-MLP outputs; internal params are already
        init-scaled).
        """
        dtype = x1.dtype
        b1 = _split(x1, self.irreps_in1)
        b2 = _split(x2, self.irreps_in2)
        contrib: Dict[int, List[jnp.ndarray]] = {}
        for idx, ins in enumerate(self.instructions):
            u = b1[ins.i_in1]  # [..., mul1, d1]
            v = b2[ins.i_in2]  # [..., mul2, d2]
            C = jnp.asarray(self._cg[idx], dtype=dtype)
            w = None
            if ins.has_weight:
                off, shape = self._offsets[idx], self._shapes[idx]
                numel = int(np.prod(shape))
                w = weights[..., off : off + numel]
                w = w.reshape(w.shape[:-1] + shape)
                if scale_weights:
                    w = w * jnp.asarray(self.slice_sqrt_k[ins.i_out], dtype=dtype)
            res = self._path(ins, u, v, C, w, self._cg[idx])
            contrib.setdefault(ins.i_out, []).append(res)

        pieces = []
        for i_out, (mul, ir) in enumerate(self.irreps_out):
            if i_out in contrib:
                terms = contrib[i_out]
                acc = terms[0]
                for t in terms[1:]:
                    acc = acc + t
                pieces.append(acc.reshape(acc.shape[:-2] + (mul * ir.dim,)))
            else:
                shape = jnp.broadcast_shapes(x1.shape[:-1], x2.shape[:-1])
                pieces.append(jnp.zeros(shape + (mul * ir.dim,), dtype=dtype))
        return jnp.concatenate(pieces, axis=-1)

    @staticmethod
    def _path(ins, u, v, C, w, cg_np):
        """One instruction; u: [..., d1, mul1], v: [..., d2, mul2] (component-
        major) -> [..., d3, mul_out].  Keeps multiplicities on the lane axis."""
        d1, d2, d3 = C.shape
        if ins.mode == "uvw":
            if d2 == 1 and d1 == d3:
                # l (x) 0 -> l : component-normalized CG is c * identity, so
                # this path is a pure (per-irrep) matmul that lands on the MXU.
                scal = v[..., 0, :]  # [..., mul2]
                c = float(cg_np[0, 0, 0])
                if v.shape[-1] == 1:
                    # single scalar copy (the constant '1x0e' node attr): one
                    # clean [.., d, mul_in] x [mul_in, mul_out] matmul scaled
                    # by the scalar — the FFN/linear-shortcut hot path.
                    W = w[..., :, 0, :]  # [(..,) mul1, mul_out]
                    eq = "...iu,...uw->...iw" if w.ndim > 3 else "...iu,uw->...iw"
                    out = jnp.einsum(eq, u, W)
                    return out * (c * scal)[..., None, :]
                tmp = jnp.einsum("...iu,...v->...iuv", u, scal) * c
                eq = "...iuv,...uvw->...iw" if w.ndim > 3 else "...iuv,uvw->...iw"
                return jnp.einsum(eq, tmp, w)
            tmp = jnp.einsum("...iu,...jv,ijk->...kuv", u, v, C)
            eq = "...kuv,...uvw->...kw" if w.ndim > 3 else "...kuv,uvw->...kw"
            return jnp.einsum(eq, tmp, w)
        if ins.mode == "uvu":
            if v.shape[-1] == 1:
                # depthwise with single-copy second input (the SH case):
                # per-sample small matrix M = C . v, then a batched matmul
                # [d3, d1] x [d1, mul] with mul on lanes.
                vv = v[..., :, 0]  # [..., d2]
                M = jnp.einsum("...j,ijk->...ki", vv, C)  # [..., d3, d1]
                tmp = jnp.einsum("...ki,...iu->...ku", M, u)
                if w is None:
                    return tmp
                return tmp * w[..., None, :, 0]  # w: [..., mul1, 1]
            tmp = jnp.einsum("...iu,...jv,ijk->...kuv", u, v, C)
            if w is None:
                return jnp.sum(tmp, axis=-1)
            eq = "...kuv,...uv->...ku" if w.ndim > 2 else "...kuv,uv->...ku"
            return jnp.einsum(eq, tmp, w)
        raise ValueError(ins.mode)


# ---------------------------------------------------------------- factories
def fully_connected_instructions(
    irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps
) -> List[Instruction]:
    """All allowed uvw paths (tensor_product_rescale.py:151-157)."""
    return [
        Instruction(i1, i2, io, "uvw", True)
        for i1, (_, ir1) in enumerate(irreps_in1)
        for i2, (_, ir2) in enumerate(irreps_in2)
        for io, (_, iro) in enumerate(irreps_out)
        if iro in ir1 * ir2
    ]


def fully_connected_tp(
    irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps, rescale: bool = True
) -> TensorProduct:
    return TensorProduct(
        irreps_in1,
        irreps_in2,
        irreps_out,
        fully_connected_instructions(
            Irreps(irreps_in1), Irreps(irreps_in2), Irreps(irreps_out)
        ),
        rescale=rescale,
    )


def depthwise_tp(
    irreps_node: Irreps, irreps_edge: Irreps, irreps_target: Irreps, rescale: bool = True
) -> TensorProduct:
    """Depthwise ('uvu') TP whose output irreps are derived by filtering
    ir_node x ir_edge against ``irreps_target`` (plus 0e always kept), sorted
    even-first — reference DepthwiseTensorProduct
    (graph_attention_transformer.py:157-183)."""
    irreps_node = Irreps(irreps_node)
    irreps_edge = Irreps(irreps_edge)
    irreps_target = Irreps(irreps_target)
    out_blocks: List[MulIrrep] = []
    instructions: List[Tuple] = []
    for i, (mul, ir_in) in enumerate(irreps_node):
        for j, (_, ir_edge) in enumerate(irreps_edge):
            for ir_out in ir_in * ir_edge:
                if ir_out in irreps_target or ir_out == Irrep(0, 1):
                    k = len(out_blocks)
                    out_blocks.append(MulIrrep(mul, ir_out))
                    instructions.append([i, j, k, "uvu", True])
    irreps_out = Irreps(out_blocks)
    irreps_out, p, _ = irreps_out.sort_even_first()
    instructions = [
        Instruction(i1, i2, p[io], mode, train)
        for i1, i2, io, mode, train in instructions
    ]
    return TensorProduct(irreps_node, irreps_edge, irreps_out, instructions, rescale)


def elementwise_multiply(irreps: Irreps, x: jnp.ndarray, scalars: jnp.ndarray):
    """Elementwise product of features with one even scalar per irrep copy.

    Equivalent of ``o3.ElementwiseTensorProduct(irreps, '{num_irreps}x0e')`` as
    used by Gate and EquivariantDropout (fast_activation.py:122, drop.py:77-79):
    for l (x) 0e -> l the component-normalized coefficient is exactly 1, so this
    is a plain per-channel broadcast multiply.
    """
    pieces = []
    i = 0
    s = 0
    for mul, ir in irreps:
        blk = x[..., i : i + mul * ir.dim].reshape(x.shape[:-1] + (ir.dim, mul))
        g = scalars[..., s : s + mul]
        pieces.append((blk * g[..., None, :]).reshape(x.shape[:-1] + (mul * ir.dim,)))
        i += mul * ir.dim
        s += mul
    return jnp.concatenate(pieces, axis=-1)
