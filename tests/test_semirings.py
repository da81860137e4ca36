"""Semiring axioms and basic algebra (host numpy path)."""
import numpy as np
import pytest

from markovmodels_tpu.semiring import BOOL, LOG, PROB, TROPICAL, get_semiring
from markovmodels_tpu.labels import UNION_CONCAT, Label, LabelSet

NUMERIC = [LOG, TROPICAL, PROB, BOOL]


def sample_values(sr, rng):
    if sr.name == "bool":
        return rng.integers(0, 2, size=8).astype(np.float64)
    if sr.name == "prob":
        return rng.uniform(0, 2, size=8)
    return rng.uniform(-5, 2, size=8)


@pytest.mark.parametrize("sr", NUMERIC, ids=lambda s: s.name)
def test_axioms(sr):
    rng = np.random.default_rng(0)
    x, y, z = (sample_values(sr, rng) for _ in range(3))
    # associativity / commutativity of ⊕
    np.testing.assert_allclose(sr.add(sr.add(x, y), z), sr.add(x, sr.add(y, z)))
    np.testing.assert_allclose(sr.add(x, y), sr.add(y, x))
    # identity elements
    np.testing.assert_allclose(sr.add(x, sr.zero), x)
    np.testing.assert_allclose(sr.mul(x, sr.one), x)
    # annihilation: zero ⊗ x = zero
    np.testing.assert_allclose(sr.mul(sr.zeros(8), x), sr.zeros(8))
    # distributivity
    np.testing.assert_allclose(
        sr.mul(x, sr.add(y, z)), sr.add(sr.mul(x, y), sr.mul(x, z)), atol=1e-12
    )


@pytest.mark.parametrize("sr", NUMERIC, ids=lambda s: s.name)
def test_reduce_matches_fold(sr):
    rng = np.random.default_rng(1)
    x = sample_values(sr, rng)
    acc = sr.zero
    for v in x:
        acc = sr.add(acc, v)
    np.testing.assert_allclose(sr.add_reduce(x), acc, atol=1e-12)


def test_registry_aliases():
    assert get_semiring("LogSemiring{Float32}") is LOG
    assert get_semiring("tropical") is TROPICAL
    with pytest.raises(ValueError):
        get_semiring("nope")


def test_divisible_trait():
    assert LOG.divisible and PROB.divisible and TROPICAL.divisible
    assert not BOOL.divisible


def test_union_concat_semiring():
    L = UNION_CONCAT
    a = LabelSet([Label("a"), Label("b")])
    b = LabelSet([Label("c")])
    assert L.add(a, L.zero) == a
    assert L.mul(a, L.one) == a
    assert L.mul(L.zero, a) == L.zero
    assert L.mul(a, b) == LabelSet([("a", "c"), ("b", "c")])
    # distributivity
    c = LabelSet([Label("d")])
    assert L.mul(a, L.add(b, c)) == L.add(L.mul(a, b), L.mul(a, c))
