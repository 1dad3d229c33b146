"""Equivariant activations: scalar activations, Gate, SmoothLeakyReLU.

Semantics follow the reference fast_activation.py (Activation/Gate) including
e3nn's ``normalize2mom`` second-moment normalization: every scalar activation
is scaled by a constant so that E[act(z)^2] = 1 for z ~ N(0,1).  Constants are
computed once by numerical quadrature (numpy), so JAX sees literals.

Gate layout (fast_activation.py:90-160): input = [scalars | gates | gated];
scalars (0e) -> act; gates (0e) -> sigmoid; gated (l>0 and 0o) multiplied
per-channel by their gate.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.irreps import Irrep, Irreps
from ..core.tensor_product import elementwise_multiply


# ------------------------------------------------------------ normalize2mom
@functools.lru_cache(maxsize=None)
def _moment_and_parity(name: str) -> Tuple[float, int]:
    """(1/sqrt(E[act^2]), parity) for z~N(0,1); parity in {1,-1,0}."""
    z = np.linspace(-12.0, 12.0, 480001)
    w = np.exp(-0.5 * z * z)
    w /= np.sum(w)
    f = _np_act(name)
    vals = f(z)
    second = np.sum(w * vals * vals)
    factor = 1.0 / np.sqrt(second)
    # parity inference on [0, 10] like the reference (fast_activation.py:36-42)
    x = np.linspace(0.0, 10.0, 256)
    a1, a2 = f(x), f(-x)
    if np.max(np.abs(a1 - a2)) < 1e-5:
        parity = 1
    elif np.max(np.abs(a1 + a2)) < 1e-5:
        parity = -1
    else:
        parity = 0
    return float(factor), parity


def _np_act(name: str) -> Callable[[np.ndarray], np.ndarray]:
    if name == "silu":
        return lambda x: x / (1.0 + np.exp(-x))
    if name == "sigmoid":
        return lambda x: 1.0 / (1.0 + np.exp(-x))
    if name == "tanh":
        return np.tanh
    if name.startswith("smooth_leaky_relu"):
        alpha = float(name.split(":")[1]) if ":" in name else 0.2
        sig = lambda x: 1.0 / (1.0 + np.exp(-x))
        return lambda x: ((1 + alpha) / 2.0) * x + ((1 - alpha) / 2.0) * x * (
            2.0 * sig(x) - 1.0
        )
    if name == "identity":
        return lambda x: x
    raise ValueError(f"unknown activation {name}")


def _jnp_act(name: str) -> Callable:
    if name == "silu":
        return lambda x: x * jnp.reciprocal(1.0 + jnp.exp(-x))
    if name == "sigmoid":
        return lambda x: jnp.reciprocal(1.0 + jnp.exp(-x))
    if name == "tanh":
        return jnp.tanh
    if name.startswith("smooth_leaky_relu"):
        alpha = float(name.split(":")[1]) if ":" in name else 0.2
        def f(x):
            sig = jnp.reciprocal(1.0 + jnp.exp(-x))
            return ((1 + alpha) / 2.0) * x + ((1 - alpha) / 2.0) * x * (2.0 * sig - 1.0)
        return f
    if name == "identity":
        return lambda x: x
    raise ValueError(f"unknown activation {name}")


def normalized_activation(name: str) -> Callable:
    """Activation scaled so its second moment under N(0,1) is 1 (normalize2mom)."""
    factor, _ = _moment_and_parity(name)
    raw = _jnp_act(name)
    return lambda x: raw(x) * factor


def smooth_leaky_relu(x, negative_slope: float = 0.2):
    """Reference SmoothLeakyReLU (graph_attention_transformer.py:54-63), raw."""
    return _jnp_act(f"smooth_leaky_relu:{negative_slope}")(x)


# ---------------------------------------------------------------- Activation
class Activation:
    """Apply per-block scalar activations to an irreps feature.

    ``acts[i]`` is an activation name or None for each block of ``irreps``.
    Activations may only act on l=0 blocks; parity is checked/propagated like
    the reference (fast_activation.py:29-50).  Pure callable, no params.
    """

    def __init__(self, irreps: Irreps, acts: Sequence[Optional[str]]):
        irreps = Irreps(irreps)
        if len(acts) == 1 and len(irreps) > 1:
            acts = list(acts) * len(irreps)
        if len(irreps) != len(acts):
            raise ValueError("need one activation (or None) per irreps block")
        self.irreps_in = irreps
        self.acts = tuple(acts)
        out = []
        for (mul, ir), act in zip(irreps, acts):
            if act is None:
                out.append((mul, ir))
                continue
            if ir.l != 0:
                raise ValueError("cannot apply scalar activation to l>0 block")
            _, p_act = _moment_and_parity(act)
            p_out = p_act if ir.p == -1 else ir.p
            if p_out == 0:
                raise ValueError(
                    f"activation {act} on odd scalar violates parity"
                )
            out.append((mul, Irrep(0, p_out)))
        self.irreps_out = Irreps(out)
        self._fns = tuple(
            normalized_activation(a) if a is not None else None for a in self.acts
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if len(self._fns) == 1 and self._fns[0] is not None:
            return self._fns[0](x)
        pieces = []
        i = 0
        for (mul, ir), fn in zip(self.irreps_in, self._fns):
            blk = x[..., i : i + mul * ir.dim]
            pieces.append(fn(blk) if fn is not None else blk)
            i += mul * ir.dim
        return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]


# ---------------------------------------------------------------------- Gate
def irreps2gate(irreps: Irreps):
    """Split into (scalars [0e], gates [0e per gated copy], gated [rest]).

    Reference tensor_product_rescale.py:177-192 — note 0o scalars count as
    *gated*, not scalars.
    """
    irreps = Irreps(irreps)
    scalars = Irreps([mi for mi in irreps if mi.ir.is_scalar()]).simplify()
    gated = Irreps([mi for mi in irreps if not mi.ir.is_scalar()]).simplify()
    if gated.dim > 0:
        gates = Irreps([(mi.mul, Irrep(0, 1)) for mi in gated]).simplify()
    else:
        gates = Irreps("")
    return scalars, gates, gated


class Gate:
    """Equivariant gated nonlinearity.

    Input layout [scalars | gates | gated]; output [act(scalars) | gated*sig(gates)].
    ``irreps_in``/``irreps_out`` exposed like the reference Gate.
    """

    def __init__(
        self,
        irreps_scalars: Irreps,
        irreps_gates: Irreps,
        irreps_gated: Irreps,
        act_scalars: str = "silu",
        act_gates: str = "sigmoid",
    ):
        self.irreps_scalars = Irreps(irreps_scalars)
        self.irreps_gates = Irreps(irreps_gates)
        self.irreps_gated = Irreps(irreps_gated)
        if self.irreps_gates.num_irreps != self.irreps_gated.num_irreps:
            raise ValueError("one gate scalar needed per gated irrep copy")
        self.irreps_in = (
            self.irreps_scalars + self.irreps_gates + self.irreps_gated
        ).simplify()
        self.act_scalars = (
            Activation(self.irreps_scalars, [act_scalars])
            if self.irreps_scalars.dim > 0
            else None
        )
        self.act_gates = (
            Activation(self.irreps_gates, [act_gates])
            if self.irreps_gates.dim > 0
            else None
        )
        self.irreps_out = (
            (self.act_scalars.irreps_out if self.act_scalars else Irreps(""))
            + self.irreps_gated
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ds = self.irreps_scalars.dim
        dg = self.irreps_gates.dim
        scalars = x[..., :ds]
        gates = x[..., ds : ds + dg]
        gated = x[..., ds + dg :]
        if self.act_scalars is not None:
            scalars = self.act_scalars(scalars)
        if dg == 0:
            return scalars
        gates = self.act_gates(gates)
        gated = elementwise_multiply(self.irreps_gated, gated, gates)
        return jnp.concatenate([scalars, gated], axis=-1)


def gate_for(irreps_out: Irreps) -> Tuple[object, Irreps]:
    """Build the standard SiLU/sigmoid gate (or plain Activation when nothing
    to gate) for a target output irreps; returns (callable, irreps_in).

    Mirrors FullyConnectedTensorProductRescaleSwishGate construction
    (tensor_product_rescale.py:195-215).
    """
    scalars, gates, gated = irreps2gate(irreps_out)
    if gated.num_irreps == 0:
        act = Activation(Irreps(irreps_out), ["silu"])
        return act, Irreps(irreps_out)
    g = Gate(scalars, gates, gated)
    return g, g.irreps_in
