"""Label monoid and object-valued (label) semirings.

The reference attaches labels to *states* (a SequenceMonoid element per state,
reference src/fsm.jl:3-5) and lifts label *sets* into semirings for
determinization and total-label sums (UnionConcatSemiring, reference
src/fsmops.jl:162, src/algorithms.jl:43-51).

Here a label is simply a python tuple of atoms (str/int); monoid product is
tuple concatenation; ``Label()`` is the empty tuple (monoid identity).  The
union-concat semiring value is a frozenset of such tuples with
⊕ = set-union and ⊗ = pairwise concatenation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

__all__ = [
    "Label",
    "label_mul",
    "show_label",
    "LabelSet",
    "PySemiring",
    "UNION_CONCAT",
]


def Label(*atoms) -> tuple:
    """Construct a label (SequenceMonoid element).  ``Label()`` is identity."""
    out = []
    for a in atoms:
        if isinstance(a, (tuple, list)):
            out.extend(a)
        else:
            out.append(a)
    return tuple(out)


def label_mul(a: tuple, b: tuple) -> tuple:
    """Monoid product = sequence concatenation."""
    return tuple(a) + tuple(b)


def show_label(label: tuple) -> str:
    """Mirror of the reference's ``showlabel`` (src/fsm.jl:99)."""
    return ":".join(str(a) for a in label)


class LabelSet(frozenset):
    """A set of label sequences — value type of the union-concat semiring."""

    def __repr__(self):  # pragma: no cover - debugging aid
        return "LabelSet({%s})" % ", ".join(sorted(map(show_label, self)))


@dataclasses.dataclass(frozen=True)
class PySemiring:
    """A semiring over arbitrary python objects (scalar, non-vectorized).

    Used by the host graph compiler for label-lifted computations
    (determinize / totallabelsum / n-gram counting oracles).
    """

    name: str
    add: Callable[[Any, Any], Any]
    mul: Callable[[Any, Any], Any]
    zero: Any
    one: Any

    def is_zero(self, x) -> bool:
        return x == self.zero

    def add_reduce(self, xs: Iterable[Any]):
        out = self.zero
        for x in xs:
            out = self.add(out, x)
        return out

    def dot(self, xs, ys):
        out = self.zero
        for x, y in zip(xs, ys):
            out = self.add(out, self.mul(x, y))
        return out


def _union(a: LabelSet, b: LabelSet) -> LabelSet:
    return LabelSet(frozenset(a) | frozenset(b))


def _concat_all(a: LabelSet, b: LabelSet) -> LabelSet:
    return LabelSet(label_mul(x, y) for x in a for y in b)


# UnionConcatSemiring{SequenceMonoid} analog: ⊕ = union, ⊗ = pairwise concat,
# zero = {} (empty set), one = {()} (set holding the empty label).
UNION_CONCAT = PySemiring(
    name="union_concat",
    add=_union,
    mul=_concat_all,
    zero=LabelSet(),
    one=LabelSet([()]),
)
