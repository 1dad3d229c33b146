"""Irreducible-representation (irreps) metadata for O(3)-equivariant features.

Trace-time-only metadata describing how a flat feature axis of size ``irreps.dim``
decomposes into irreps of O(3).  Features are stored exactly like e3nn lays them
out: for each ``(mul, ir)`` entry, a contiguous block of ``mul * (2l+1)`` channels
with the component index fastest-varying, i.e. block shape ``[mul, 2l+1]``.

This module is pure Python (hashable, static) so it can parameterize jitted
functions without retracing hazards.

Reference parity: e3nn ``o3.Irrep`` / ``o3.Irreps`` as used throughout
/root/reference/nets (e.g. tensor_product_rescale.py:224-231
``sort_irreps_even_first``), re-implemented from scratch for JAX.
"""

from __future__ import annotations

import dataclasses
import itertools
import re
from typing import Iterator, List, Sequence, Tuple, Union


@dataclasses.dataclass(frozen=True, order=True)
class Irrep:
    """A single irreducible representation of O(3): degree ``l`` and parity ``p``.

    ``p`` is +1 ('e', even) or -1 ('o', odd).  ``dim = 2l + 1``.
    """

    l: int
    p: int

    def __post_init__(self):
        if self.l < 0:
            raise ValueError(f"l must be >= 0, got {self.l}")
        if self.p not in (1, -1):
            raise ValueError(f"p must be +1 or -1, got {self.p}")

    @property
    def dim(self) -> int:
        return 2 * self.l + 1

    @staticmethod
    def parse(s: Union[str, "Irrep", Tuple[int, int]]) -> "Irrep":
        if isinstance(s, Irrep):
            return s
        if isinstance(s, tuple):
            return Irrep(int(s[0]), int(s[1]))
        s = s.strip()
        m = re.fullmatch(r"(\d+)([eo])", s)
        if not m:
            raise ValueError(f"cannot parse irrep {s!r}")
        return Irrep(int(m.group(1)), 1 if m.group(2) == "e" else -1)

    def __str__(self) -> str:
        return f"{self.l}{'e' if self.p == 1 else 'o'}"

    def __repr__(self) -> str:
        return str(self)

    def __mul__(self, other: "Irrep") -> Iterator["Irrep"]:
        """Selection rule: irreps appearing in the tensor product self (x) other."""
        other = Irrep.parse(other)
        p = self.p * other.p
        for l in range(abs(self.l - other.l), self.l + other.l + 1):
            yield Irrep(l, p)

    def __contains__(self, other) -> bool:  # pragma: no cover - parity helper
        raise TypeError

    def is_scalar(self) -> bool:
        return self.l == 0 and self.p == 1


@dataclasses.dataclass(frozen=True)
class MulIrrep:
    mul: int
    ir: Irrep

    @property
    def dim(self) -> int:
        return self.mul * self.ir.dim

    def __str__(self) -> str:
        return f"{self.mul}x{self.ir}"

    def __repr__(self) -> str:
        return str(self)

    def __iter__(self):
        # Allows ``mul, ir = mul_irrep`` unpacking like e3nn.
        yield self.mul
        yield self.ir


IrrepsLike = Union[str, "Irreps", Sequence]


class Irreps(tuple):
    """An ordered sequence of ``(mul, Irrep)`` blocks, e.g. ``"128x0e+64x1e+32x2e"``.

    Immutable and hashable, usable as a static argument of jitted functions.
    """

    def __new__(cls, irreps: IrrepsLike = None):
        if irreps is None:
            return super().__new__(cls, ())
        if isinstance(irreps, Irreps):
            return super().__new__(cls, tuple(irreps))
        if isinstance(irreps, Irrep):
            return super().__new__(cls, (MulIrrep(1, irreps),))
        if isinstance(irreps, str):
            items = []
            s = irreps.strip()
            if s:
                for part in s.split("+"):
                    part = part.strip()
                    if "x" in part:
                        mul_s, ir_s = part.split("x")
                        items.append(MulIrrep(int(mul_s), Irrep.parse(ir_s)))
                    else:
                        items.append(MulIrrep(1, Irrep.parse(part)))
            return super().__new__(cls, tuple(items))
        # sequence of (mul, ir)-likes
        items = []
        for entry in irreps:
            if isinstance(entry, MulIrrep):
                items.append(entry)
            else:
                mul, ir = entry
                items.append(MulIrrep(int(mul), Irrep.parse(ir)))
        return super().__new__(cls, tuple(items))

    # ------------------------------------------------------------------ props
    @property
    def dim(self) -> int:
        return sum(mi.dim for mi in self)

    @property
    def num_irreps(self) -> int:
        """Total multiplicity (number of irrep copies), summed over blocks."""
        return sum(mi.mul for mi in self)

    @property
    def lmax(self) -> int:
        if len(self) == 0:
            raise ValueError("empty irreps has no lmax")
        return max(mi.ir.l for mi in self)

    @property
    def ls(self) -> List[int]:
        return [mi.ir.l for mi in self for _ in range(mi.mul)]

    # ------------------------------------------------------------- structure
    def slices(self) -> List[slice]:
        out, i = [], 0
        for mi in self:
            out.append(slice(i, i + mi.dim))
            i += mi.dim
        return out

    def simplify(self) -> "Irreps":
        """Merge consecutive blocks with identical irrep; drop zero multiplicities."""
        out: List[MulIrrep] = []
        for mi in self:
            if mi.mul == 0:
                continue
            if out and out[-1].ir == mi.ir:
                out[-1] = MulIrrep(out[-1].mul + mi.mul, mi.ir)
            else:
                out.append(mi)
        return Irreps(out)

    def sort(self) -> Tuple["Irreps", Tuple[int, ...], Tuple[int, ...]]:
        """Sort blocks by (l, p) with odd parity first within an l (e3nn order)."""
        return self._sorted(key=lambda lp: (lp[0], lp[1]))

    def sort_even_first(self) -> Tuple["Irreps", Tuple[int, ...], Tuple[int, ...]]:
        """Sort blocks by (l, even-before-odd).

        Mirrors reference ``sort_irreps_even_first``
        (tensor_product_rescale.py:224-231).  Returns ``(irreps, p, inv)`` where
        ``p`` maps old block index -> new block index and ``inv`` is its inverse.
        """
        return self._sorted(key=lambda lp: (lp[0], -lp[1]))

    def _sorted(self, key):
        order = sorted(range(len(self)), key=lambda i: key((self[i].ir.l, self[i].ir.p)))
        inv = tuple(order)  # inv[new] = old
        p = tuple(inv.index(i) for i in range(len(self)))  # p[old] = new
        irreps = Irreps([self[i] for i in inv])
        return irreps, p, inv

    # ------------------------------------------------------------ operators
    def __add__(self, other) -> "Irreps":
        return Irreps(tuple(self) + tuple(Irreps(other)))

    def __radd__(self, other) -> "Irreps":
        return Irreps(tuple(Irreps(other)) + tuple(self))

    def __mul__(self, n: int) -> "Irreps":
        if not isinstance(n, int):
            raise TypeError("Irreps can only be multiplied by int")
        return Irreps(tuple(self) * n)

    __rmul__ = __mul__

    def __contains__(self, ir) -> bool:
        ir = Irrep.parse(ir)
        return any(mi.ir == ir for mi in self)

    def count(self, ir) -> int:
        ir = Irrep.parse(ir)
        return sum(mi.mul for mi in self if mi.ir == ir)

    def __repr__(self) -> str:
        return "+".join(str(mi) for mi in self) if len(self) else "(empty)"

    # --------------------------------------------------------------- helpers
    def randn(self, rng, *leading, dtype=None):
        """Random normal features with this layout (testing convenience)."""
        import jax

        return jax.random.normal(rng, tuple(leading) + (self.dim,), dtype=dtype)

    def filter_scalars_even(self) -> "Irreps":
        return Irreps([mi for mi in self if mi.ir.is_scalar()])


def spherical_harmonics_irreps(lmax: int, p: int = -1) -> Irreps:
    """Irreps of spherical harmonics 0..lmax.

    ``p=-1`` gives true parity (l odd -> odd); ``p=1`` gives the SE(3) variant
    where all SH are declared even (reference models with irreps_sh like
    '1x0e+1x1e+1x2e', graph_attention_transformer.py:908).
    """
    return Irreps([(1, Irrep(l, p ** l if p == -1 else 1)) for l in range(lmax + 1)])
