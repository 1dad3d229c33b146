"""Flax modules around the core tensor products.

* ``FCTP`` — fully-connected TP with internal weights + scalar bias
  (reference FullyConnectedTensorProductRescale).
* ``FCTPSwishGate`` — FCTP into a SiLU/sigmoid Gate
  (FullyConnectedTensorProductRescaleSwishGate, tensor_product_rescale.py:195-221).
* ``SeparableFCTP`` — depthwise TP (per-edge weights from a RadialProfile) ->
  irreps linear -> optional norm -> optional gate
  (graph_attention_transformer.py:186-248).
* ``NodeEmbedding`` / ``EdgeDegreeEmbedding`` / ``scaled_scatter``
  (graph_attention_transformer.py:670-733).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.irreps import Irrep, Irreps
from ..core.tensor_product import TensorProduct, depthwise_tp, fully_connected_tp
from ..graph.segment import active_edge_bound, scaled_scatter_sum
from .activation import Activation, Gate, gate_for, irreps2gate
from .linear import IrrepsLinear
from .norms import get_norm_layer
from .radial import RadialProfile


def _tp_weight_init(tp: TensorProduct):
    std = tp.weight_std_flat()

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def _scalar_bias(module: nn.Module, x: jnp.ndarray, irreps: Irreps, name="bias"):
    """Add a learnable bias (init 0) to every even-scalar block."""
    num_scalar = sum(mi.mul for mi in irreps if mi.ir.is_scalar())
    if num_scalar == 0:
        return x
    b = module.param(name, nn.initializers.zeros, (num_scalar,))
    pieces = []
    i = bi = 0
    for mul, ir in irreps:
        blk = x[..., i : i + mul * ir.dim]
        if ir.is_scalar():
            blk = blk + b[bi : bi + mul].astype(x.dtype)
            bi += mul
        pieces.append(blk)
        i += mul * ir.dim
    return jnp.concatenate(pieces, axis=-1)


class FCTP(nn.Module):
    """Fully-connected tensor product with internal weights and scalar bias."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    use_bias: bool = True
    rescale: bool = True

    @nn.compact
    def __call__(self, x1, x2):
        tp = fully_connected_tp(
            Irreps(self.irreps_in1),
            Irreps(self.irreps_in2),
            Irreps(self.irreps_out),
            rescale=self.rescale,
        )
        w = self.param("w", _tp_weight_init(tp), (tp.weight_numel,))
        out = tp.apply(x1, x2, w.astype(x1.dtype))
        if self.use_bias:
            out = _scalar_bias(self, out, tp.irreps_out)
        return out


class FCTPSwishGate(nn.Module):
    """FCTP whose output feeds a SiLU/sigmoid Gate (output irreps = target)."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    use_bias: bool = True

    @nn.compact
    def __call__(self, x1, x2):
        gate, irreps_gate_in = gate_for(Irreps(self.irreps_out))
        out = FCTP(
            Irreps(self.irreps_in1),
            Irreps(self.irreps_in2),
            irreps_gate_in,
            use_bias=self.use_bias,
            name="fctp",
        )(x1, x2)
        return gate(out)


def _pallas_enabled() -> bool:
    import os

    env = os.environ.get("EQUIFORMER_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax

    return jax.default_backend() == "tpu"


def _fused_dtplin_enabled() -> bool:
    """The fused DTP+linear kernel (kernels/dtp_lin_pallas.py); on by default
    wherever Pallas is, opt out with EQUIFORMER_TPU_FUSED_DTPLIN=0."""
    import os

    env = os.environ.get("EQUIFORMER_TPU_FUSED_DTPLIN")
    if env is not None:
        return env not in ("0", "false", "False")
    return True


def _radial_fold_enabled() -> bool:
    """Fold the radial MLP's final linear into the fused kernel (the per-edge
    operand shrinks from weight_numel to the hidden width and the w align
    phase becomes MXU dots).  OFF by default — a measured negative result:
    the packed Wr fill dots do dense MXU work over a block-sparse layout
    (only mul of each slot's LANE columns and hd+1 of p*hp rows are real,
    ~4x the FLOPs of XLA's exact [E, hd] @ [hd, weight_numel] matmul) and
    run in BOTH fwd and bwd, vs XLA computing w once and saving it.  On-chip
    A/Bs: QM9 2065.8 folded vs 2329.5 unfolded (-11%); MD17 99.2 vs 162.4
    (-39%, the fold's Wr VMEM also forces tile 64 on L3 plans).
    EQUIFORMER_TPU_FOLD_RADIAL=1 re-enables for A/Bs."""
    return os.environ.get("EQUIFORMER_TPU_FOLD_RADIAL", "0") not in ("0", "false")


def _make_fused_plan(plan, head_irreps, internal_weights, higher_order_grads,
                     radial_hd=None):
    """Build the fused DTP+linear op when supported, else None.

    First-order models get the custom-vjp kernel (single fused backward,
    save-z); force models (higher_order_grads) get the leg-primitive family
    (kernels/dtp_lin_ho.py) whose JVP/transpose rules keep the fusion at
    every AD order.  ``radial_hd`` (the radial MLP's last hidden width)
    requests radial folding when enabled."""
    if not (_pallas_enabled() and _fused_dtplin_enabled()):
        return None, None
    try:
        from ..kernels.dtp_lin_pallas import DTPLinPlan, make_fused_dtp_lin

        rad_fold = (
            radial_hd if (radial_hd and not internal_weights
                          and _radial_fold_enabled()) else None
        )
        if higher_order_grads:
            # separate opt-out for A/B benchmarking the force path
            if os.environ.get("EQUIFORMER_TPU_FUSED_HO", "1") in ("0", "false"):
                return None, None
            from ..kernels.dtp_lin_ho import auto_tile, make_fused_dtp_lin_ho

            # radial folding is OFF by default on the higher-order path: the
            # leg kernels re-materialize w from h at EVERY AD order and the
            # Wr blocks' VMEM forces tile 64 for L3 plans — on-chip MD17 A/B
            # measured 99.15 g/s folded vs 162.4 unfolded.  The first-order
            # path (below) keeps it on: one fwd + one fused bwd, w operand
            # shrinks in both.  EQUIFORMER_TPU_FOLD_RADIAL_HO=1 re-enables.
            if os.environ.get("EQUIFORMER_TPU_FOLD_RADIAL_HO", "0") in (
                "0", "false",
            ):
                rad_fold = None
            fplan = DTPLinPlan(
                plan,
                head_irreps,
                fold_rescale=not internal_weights,
                shared_weights=internal_weights,
                # force models differentiate through the SH of edge vectors
                needs_dsh=True,
                tile=128,
                radial_fold=rad_fold,
            )
            # HO leg kernels carry no save-z output double-buffering, so
            # wider tiles than the first-order kernel fit: budget 11M keeps
            # tile 128 for the L3 plans (10.0-10.7M estimate, on-chip A/B
            # 162.4 vs 155.8 g/s at 64) while the wider E3 variants (15.1M)
            # still shrink to 64.  EQUIFORMER_TPU_HO_TILE overrides for A/Bs.
            tile = int(os.environ.get("EQUIFORMER_TPU_HO_TILE", "0"))
            return fplan, make_fused_dtp_lin_ho(
                fplan, tile=tile or auto_tile(fplan, budget=11 * 2**20)
            )
        # folded shared-weight kernels carry no w scratch, so a 256 tile fits
        # VMEM and measures fastest (tile_sweep.py); external-weight kernels
        # stay at 128 (256 exceeds VMEM); wide (L3) plans auto-shrink — the
        # L3 external plan at tile 128 measured a 16.43M scoped-vmem OOM.
        # EQUIFORMER_TPU_FO_TILE overrides the external-weight tile for A/Bs
        # (the compact fan layout + save-z halved the calibration-era VMEM).
        fo_tile = int(os.environ.get("EQUIFORMER_TPU_FO_TILE", "0"))
        tile = 256 if internal_weights else (fo_tile or 128)
        # kron-basis MXU cast (A/B): the CG contraction rides the MXU as
        # per-(group, k) dots against a coefficient-folded G built from the
        # packed W in XLA — no z scratch, no save-z residual.  Incompatible
        # with radial folding (G replaces the packed W entirely), so KRON_G
        # overrides FOLD_RADIAL; checked before any plan is built.
        if os.environ.get("EQUIFORMER_TPU_KRON_G", "0") not in ("0", "false"):
            if rad_fold is not None:
                import warnings

                warnings.warn(
                    "EQUIFORMER_TPU_KRON_G overrides EQUIFORMER_TPU_FOLD_RADIAL:"
                    " the kron path folds the packed W into G and cannot also"
                    " fold the radial linear; radial folding is disabled.",
                    stacklevel=2,
                )
            from ..kernels.dtp_lin_kron import (
                make_fused_dtp_lin_kron,
                kron_auto_tile,
                KronMeta,
            )

            kplan = DTPLinPlan(
                plan,
                head_irreps,
                fold_rescale=not internal_weights,
                shared_weights=internal_weights,
                needs_dsh=False,
                tile=tile,
            )
            ktile = kron_auto_tile(KronMeta(kplan), fo_tile or tile)
            return kplan, make_fused_dtp_lin_kron(kplan, tile=ktile)
        fplan = DTPLinPlan(
            plan,
            head_irreps,
            fold_rescale=not internal_weights,
            shared_weights=internal_weights,
            # first-order models never differentiate wrt positions: skip the
            # dsh transpose
            needs_dsh=False,
            tile=tile,
            # external-weight (radial-profile) call sites fold the radial
            # MLP's final linear into the kernel: the [E, weight_numel]
            # operand shrinks to the hidden width in fwd AND bwd
            radial_fold=rad_fold,
        )
        from ..kernels.dtp_lin_ho import auto_tile

        # an explicit FO_TILE bypasses the budget heuristic (A/B runs)
        if not (fo_tile and not internal_weights):
            tile = auto_tile(fplan, tile, budget=9 * 2**20)
        return fplan, make_fused_dtp_lin(fplan, tile=tile)
    except (ValueError, AssertionError) as exc:
        # unsupported plan shapes fall back to the einsum path; when an A/B
        # path was explicitly requested via env, say so instead of silently
        # benchmarking the fallback
        if os.environ.get("EQUIFORMER_TPU_KRON_G", "0") not in ("0", "false"):
            import warnings

            warnings.warn(
                f"EQUIFORMER_TPU_KRON_G requested but the kron plan failed"
                f" ({exc!r}); falling back to the einsum path.",
                stacklevel=2,
            )
        return None, None


class DTPLayer(nn.Module):
    """Depthwise TP with either internal weights or externally supplied flat
    per-edge weights; no bias (all reference DTP call sites use bias=False).

    On TPU the fused Pallas kernel (kernels/dtp_pallas.py) replaces the einsum
    path (override with EQUIFORMER_TPU_PALLAS=0/1)."""

    irreps_node: Irreps
    irreps_edge: Irreps
    irreps_target: Irreps
    internal_weights: bool = False
    higher_order_grads: bool = True  # False -> fused single-kernel backward

    def setup(self):
        self.plan = depthwise_tp(
            Irreps(self.irreps_node), Irreps(self.irreps_edge), Irreps(self.irreps_target)
        )
        if self.internal_weights:
            self.w = self.param(
                "w", _tp_weight_init(self.plan), (self.plan.weight_numel,)
            )
        self._kernel = None
        if _pallas_enabled():
            try:
                from ..kernels.dtp_pallas import PallasDTP

                import os

                # the fused single-kernel backward measured *slower* than the
                # composed primitive backward on v5e (VMEM pressure breaks
                # pipelining) — keep it opt-in
                fused = (
                    not self.higher_order_grads
                    and os.environ.get("EQUIFORMER_TPU_FUSED_BWD", "0") == "1"
                )
                self._kernel = PallasDTP(
                    self.plan,
                    fold_rescale=not self.internal_weights,
                    shared_weights=self.internal_weights,
                    first_order=fused,
                )
            except ValueError:
                self._kernel = None  # unsupported plan shape -> einsum fallback

    @property
    def irreps_out(self) -> Irreps:
        return self.plan.irreps_out

    @property
    def weight_numel(self) -> int:
        return self.plan.weight_numel

    def internal_weights_value(self) -> jnp.ndarray:
        """Raw internal weight vector (for fused DTP+linear callers)."""
        return self.w

    def __call__(self, node_on_edge, edge_attr, weights: Optional[jnp.ndarray] = None):
        if self.internal_weights:
            w = self.w.astype(node_on_edge.dtype)
            if self._kernel is not None:
                return self._kernel(node_on_edge, edge_attr, w)
            return self.plan.apply(node_on_edge, edge_attr, w)
        # external raw weights (e.g. radial MLP output): fan-in scale folded in
        if self._kernel is not None:
            return self._kernel(node_on_edge, edge_attr, weights)
        return self.plan.apply(node_on_edge, edge_attr, weights, scale_weights=True)


class SeparableFCTP(nn.Module):
    """Depthwise + pointwise separable equivariant convolution on edges.

    When Pallas is enabled and only first-order gradients are needed, the
    DTP and the following per-irrep linear run as one fused kernel
    (kernels/dtp_lin_pallas.py); ``extra_head_irreps`` declares additional
    linear heads reading the same unsimplified DTP output (the nonlinear
    message path's ``sep_alpha``) so they join the fused matmul."""

    irreps_node: Irreps
    irreps_edge: Irreps
    irreps_out: Irreps
    fc_neurons: Optional[Tuple[int, ...]] = None  # [input dim] + hidden dims (ref ch_list)
    use_activation: bool = False
    norm_layer: Optional[str] = None
    internal_weights: bool = False
    higher_order_grads: bool = True
    extra_head_irreps: Tuple = ()

    def setup(self):
        irreps_out = Irreps(self.irreps_out)
        self.dtp = DTPLayer(
            Irreps(self.irreps_node),
            Irreps(self.irreps_edge),
            irreps_out,
            internal_weights=self.internal_weights,
            higher_order_grads=self.higher_order_grads,
        )
        plan = depthwise_tp(
            Irreps(self.irreps_node), Irreps(self.irreps_edge), irreps_out
        )
        if self.fc_neurons is not None:
            # fc_neurons[0] is the INPUT width (reference RadialProfile ch_list
            # semantics, radial_func.py:10-27): layers are fc_neurons[1:] + out
            self.dtp_rad = RadialProfile(
                features=tuple(self.fc_neurons[1:]) + (plan.weight_numel,)
            )
        scalars, gates, gated = irreps2gate(irreps_out)
        if self.use_activation:
            irreps_lin_output = (scalars + gates + gated).simplify()
        else:
            irreps_lin_output = irreps_out
        self.lin = IrrepsLinear(plan.irreps_out, irreps_lin_output, name="lin")
        self._fused_plan, self._fused = _make_fused_plan(
            plan,
            [irreps_lin_output] + [Irreps(h) for h in self.extra_head_irreps],
            self.internal_weights,
            self.higher_order_grads,
            radial_hd=(self.fc_neurons[-1] if self.fc_neurons else None),
        )
        if self.norm_layer is not None:
            self.norm = get_norm_layer(self.norm_layer)(irreps_lin_output)
        if self.use_activation:
            if gated.num_irreps == 0:
                self.gate = Activation(irreps_out, ["silu"])
            else:
                self.gate = Gate(scalars, gates, gated)

    def dtp_lin(self, node_on_edge, edge_attr, weights, extra_heads=(),
                n_edges=None):
        """dtp -> (lin, *extra_head linears), fused into one kernel when
        available.  ``extra_heads`` are bound IrrepsLinear modules matching
        ``extra_head_irreps``.  Returns a single array (no extra heads) or a
        list of per-head outputs."""
        heads = [self.lin] + list(extra_heads)
        assert len(heads) == 1 + len(self.extra_head_irreps)
        if self._fused is not None:
            dtype = node_on_edge.dtype
            if self.internal_weights:
                weights = self.dtp.internal_weights_value().astype(dtype)
            head_ws = [
                [None if w is None else w.astype(dtype) for w in h.weight_list()]
                for h in heads
            ]
            Ws = self._fused_plan.pack_weights(head_ws)
            out_flat = self._fused(node_on_edge, edge_attr, weights, Ws,
                                   n_edges=n_edges)
            outs = self._fused_plan.split_output(out_flat)
            outs = [h.add_bias(o) for h, o in zip(heads, outs)]
        else:
            z = self.dtp(node_on_edge, edge_attr, weights)
            outs = [h(z) for h in heads]
        return outs if extra_heads else outs[0]

    def __call__(
        self,
        node_on_edge,
        edge_attr,
        edge_scalars=None,
        batch=None,
        num_graphs=None,
        apply_gate: bool = True,
        n_edges=None,
        weights=None,
    ):
        # ``weights``: precomputed raw radial-MLP output (the batched-radial
        # path, models/equiformer._batch_radial_enabled) — same tensor
        # dtp_weights would return, computed once for all blocks
        w = weights
        if w is None and self.fc_neurons is not None and edge_scalars is not None:
            w = self.dtp_weights(edge_scalars)
        out = self.dtp_lin(node_on_edge, edge_attr, w, n_edges=n_edges)
        if self.norm_layer is not None:
            out = self.norm(out, batch=batch, num_graphs=num_graphs)
        if self.use_activation and apply_gate:
            out = self.gate(out)
        return out

    # Pieces exposed for the nonlinear-message attention path
    def dtp_weights(self, edge_scalars):
        """Per-edge TP weights — or, on the radial-folded fused path, the
        ``(hidden, packed Wr)`` pair the fused op consumes directly."""
        if self._fused_plan is not None and self._fused_plan.radial_fold is not None:
            h, Wr, offset = self.dtp_rad(edge_scalars, fold_final=True)
            Wrs = self._fused_plan.pack_radial(Wr, offset)
            return (h, Wrs)
        return self.dtp_rad(edge_scalars)

    def apply_dtp(self, node_on_edge, edge_attr, weights):
        return self.dtp(node_on_edge, edge_attr, weights)

    def apply_lin(self, x):
        return self.lin(x)

    def apply_gate_fn(self, x):
        return self.gate(x)


class NodeEmbedding(nn.Module):
    """One-hot atom type -> irreps embedding, weights scaled by sqrt(num_types).

    Returns (embedding, onehot) — the onehot doubles as node_attr in the
    reference (graph_attention_transformer.py:670-690).
    """

    irreps_out: Irreps
    max_atom_type: int

    @nn.compact
    def __call__(self, species: jnp.ndarray, dtype=jnp.float32):
        onehot = jax.nn.one_hot(species, self.max_atom_type, dtype=dtype)
        emb = IrrepsLinear(
            Irreps(f"{self.max_atom_type}x0e"),
            Irreps(self.irreps_out),
            weight_init_scale=float(np.sqrt(self.max_atom_type)),
            name="lin",
        )(onehot)
        return emb, onehot


class EdgeDegreeEmbedding(nn.Module):
    """Degree-aware initial node features: constant scalar -> linear -> DTP with
    SH weighted by a radial MLP -> linear -> scaled scatter onto destinations."""

    irreps_out: Irreps
    irreps_edge: Irreps
    fc_neurons: Tuple[int, ...]
    avg_degree: float
    higher_order_grads: bool = True

    def setup(self):
        irreps_out = Irreps(self.irreps_out)
        self.exp = IrrepsLinear(Irreps("1x0e"), irreps_out, name="exp")
        self.dw = DTPLayer(
            irreps_out, Irreps(self.irreps_edge), irreps_out, internal_weights=False,
            higher_order_grads=self.higher_order_grads,
        )
        plan = depthwise_tp(irreps_out, Irreps(self.irreps_edge), irreps_out)
        self.rad = RadialProfile(features=tuple(self.fc_neurons[1:]) + (plan.weight_numel,))
        self.proj = IrrepsLinear(plan.irreps_out, irreps_out, name="proj")
        self._fused_plan, self._fused = _make_fused_plan(
            plan, [irreps_out], False, self.higher_order_grads,
            radial_hd=self.fc_neurons[-1],
        )

    def __call__(self, edge_attr, edge_scalars, edge_src, edge_dst, edge_mask, num_nodes):
        # every node's expanded feature is the same linear image of the
        # constant scalar 1, so the per-edge gather feat[edge_src] is a
        # broadcast — identical forward AND gradients (the exp weight
        # cotangent sums over all edges either way), but the backward is a
        # regular sum instead of a scatter-add
        num_edges = edge_src.shape[0]
        feat1 = self.exp(jnp.ones((1, 1), edge_attr.dtype))
        feat_e = jnp.broadcast_to(feat1, (num_edges, feat1.shape[-1]))
        if self._fused_plan is not None and self._fused_plan.radial_fold is not None:
            h, Wr, offset = self.rad(edge_scalars, fold_final=True)
            w = (h, self._fused_plan.pack_radial(Wr, offset))
        else:
            w = self.rad(edge_scalars)
        if self._fused is not None:
            dtype = edge_attr.dtype
            head_ws = [[None if x is None else x.astype(dtype)
                        for x in self.proj.weight_list()]]
            Ws = self._fused_plan.pack_weights(head_ws)
            n_edges = active_edge_bound(edge_mask) if edge_mask is not None else None
            out_flat = self._fused(feat_e, edge_attr, w, Ws, n_edges=n_edges)
            edge_feat = self.proj.add_bias(self._fused_plan.split_output(out_flat)[0])
        else:
            edge_feat = self.dw(feat_e, edge_attr, w)
            edge_feat = self.proj(edge_feat)
        return scaled_scatter_sum(
            edge_feat, edge_dst, num_nodes, self.avg_degree, mask=edge_mask,
            sorted=True, higher_order=self.higher_order_grads,
        )
