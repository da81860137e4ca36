"""FSM constructor + graph-op tests over the semiring grid.

Mirrors reference test/test_fsms.jl: each op checked with the algebraic
``fsmequal`` oracle plus nnz-count equality (stored-zero regressions)."""
import numpy as np
import pytest

import markovmodels_tpu as mm
from markovmodels_tpu.labels import Label

SRS = [mm.BOOL, mm.LOG, mm.PROB, mm.TROPICAL]
DIVISIBLE = [mm.LOG, mm.PROB, mm.TROPICAL]


def chain_fsm(sr, labels, w=None):
    """Left-to-right FSM with self-loops (the reference's standard fixture)."""
    w = sr.one if w is None else w
    n = len(labels)
    arcs = []
    for i in range(n):
        arcs.append(((i, i), w))
        if i + 1 < n:
            arcs.append(((i, i + 1), w))
    return mm.FSM.from_pairs(
        [(0, sr.one)], arcs, [(n - 1, sr.one)], [Label(l) for l in labels], sr
    )


def two(sr):
    return sr.add(sr.one, sr.one)


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_constructor_and_json_roundtrip(sr):
    fsm1 = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((1, 1), sr.one), ((1, 0), sr.one)],
        [(1, sr.one)],
        [Label(1), Label(2)],
        sr,
    )
    fsm3 = mm.from_json(mm.to_json(fsm1))
    assert mm.fsmequal(fsm1, fsm3)
    # single state, no arcs
    fsm = mm.FSM.from_pairs([(0, sr.one)], [], [(0, sr.one)], [Label(1)], sr)
    assert mm.fsmequal(fsm, mm.from_json(mm.to_json(fsm)))


def test_json_reference_format():
    # the reference's 1-based Julia JSON with the Julia semiring type name
    fsm = mm.from_json(
        """
        {"semiring": "LogSemiring{Float32}",
         "initstates": [[1, 0.0]],
         "arcs": [[1, 2, 0.0]],
         "finalstates": [[2, 0.0]],
         "labels": [1, 2]}
        """
    )
    assert fsm.sr is mm.LOG
    assert fsm.num_states == 2
    assert fsm.arcs() == [(0, 1, 0.0)]


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_union(sr):
    fsm1 = chain_fsm(sr, [1, 2, 3])
    fsm2 = chain_fsm(sr, [4, 5, 6])
    fsm3 = mm.FSM.from_pairs(
        [(0, sr.one), (3, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((1, 1), sr.one), ((1, 2), sr.one),
         ((2, 2), sr.one), ((3, 3), sr.one), ((3, 4), sr.one), ((4, 4), sr.one),
         ((4, 5), sr.one), ((5, 5), sr.one)],
        [(2, sr.one), (5, sr.one)],
        [Label(i) for i in (1, 2, 3, 4, 5, 6)],
        sr,
    )
    fsm = mm.union(fsm1, fsm2)
    assert mm.fsmequal(fsm, fsm3)
    assert fsm.T.nnz == fsm3.T.nnz


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_concat(sr):
    fsm1 = chain_fsm(sr, [1, 2, 3])
    fsm2 = chain_fsm(sr, [4, 5, 6])
    fsm3 = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((1, 1), sr.one), ((1, 2), sr.one),
         ((2, 2), sr.one), ((2, 3), sr.one), ((3, 3), sr.one), ((3, 4), sr.one),
         ((4, 4), sr.one), ((4, 5), sr.one), ((5, 5), sr.one)],
        [(5, sr.one)],
        [Label(i) for i in (1, 2, 3, 4, 5, 6)],
        sr,
    )
    fsm = mm.concat(fsm1, fsm2)
    assert mm.fsmequal(fsm, fsm3)
    assert fsm.T.nnz == fsm3.T.nnz


@pytest.mark.parametrize("sr", DIVISIBLE, ids=lambda s: s.name)
def test_renorm(sr):
    Z = two(sr)
    fsm1 = mm.FSM.from_pairs(
        [(0, Z)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((1, 1), sr.one), ((1, 2), sr.one),
         ((2, 2), sr.one)],
        [(2, sr.one)],
        [Label(i) for i in (1, 2, 3)],
        sr,
    )
    inv = sr.divide(sr.one, Z)
    fsm2 = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), inv), ((0, 1), inv), ((1, 1), inv), ((1, 2), inv),
         ((2, 2), inv)],
        [(2, inv)],
        [Label(i) for i in (1, 2, 3)],
        sr,
    )
    fsm = mm.renorm(fsm1)
    assert mm.fsmequal(fsm, fsm2)
    assert fsm.T.nnz == fsm2.T.nnz


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_reversal(sr):
    fsm1 = chain_fsm(sr, [1, 2, 3])
    fsm2 = mm.FSM.from_pairs(
        [(2, sr.one)],
        [((0, 0), sr.one), ((1, 0), sr.one), ((1, 1), sr.one), ((2, 1), sr.one),
         ((2, 2), sr.one)],
        [(0, sr.one)],
        [Label(i) for i in (1, 2, 3)],
        sr,
    )
    fsm = mm.reverse(fsm1)
    assert mm.fsmequal(fsm, fsm2)
    assert mm.fsmequal(mm.reverse(fsm), fsm1)  # involution


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_compose(sr):
    fsm1 = chain_fsm(sr, [1, 2, 3])
    fsm2 = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((1, 1), sr.one), ((1, 0), sr.one)],
        [(1, sr.one)],
        [Label("a"), Label("b")],
        sr,
    )
    fsm3 = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((1, 1), sr.one), ((1, 2), sr.one),
         ((2, 2), sr.one), ((3, 3), sr.one), ((3, 4), sr.one), ((4, 4), sr.one),
         ((4, 5), sr.one), ((5, 5), sr.one), ((2, 0), sr.one), ((2, 3), sr.one),
         ((5, 0), sr.one), ((5, 3), sr.one)],
        [(5, sr.one)],
        [Label("a", 1), Label("a", 2), Label("a", 3),
         Label("b", 1), Label("b", 2), Label("b", 3)],
        sr,
    )
    fsm = mm.compose(fsm2, [fsm1, fsm1])
    assert mm.fsmequal(fsm, fsm3)
    assert fsm.T.nnz == fsm3.T.nnz

    fsm = mm.compose(fsm2, {Label("a"): fsm1, Label("b"): fsm1})
    assert mm.fsmequal(fsm, fsm3)
    assert fsm.T.nnz == fsm3.T.nnz


@pytest.mark.parametrize("sr", [mm.LOG, mm.PROB], ids=lambda s: s.name)
def test_propagate(sr):
    v1, v2 = sr.one, two(sr)
    fsm1 = mm.FSM.from_pairs(
        [(0, v2)],
        [((0, 1), v1), ((0, 2), v1), ((1, 3), v1), ((2, 3), v2)],
        [(3, v1)],
        [Label(l) for l in "abcd"],
        sr,
    )
    m = sr.mul
    fsm2 = mm.FSM.from_pairs(
        [(0, v2)],
        [((0, 1), m(v2, v1)), ((0, 2), m(v2, v1)),
         ((1, 3), m(m(v2, v1), v1)), ((2, 3), m(m(v2, v1), v2))],
        [(3, sr.add(m(m(v2, v1), v1), m(m(v2, v1), v2)))],
        [Label(l) for l in "abcd"],
        sr,
    )
    assert mm.fsmequal(mm.propagate(fsm1), fsm2)

    fsm = mm.FSM.from_pairs([(0, sr.one)], [], [(0, sr.one)], [Label(1)], sr)
    assert mm.fsmequal(mm.propagate(fsm), fsm)


@pytest.mark.parametrize("sr", DIVISIBLE, ids=lambda s: s.name)
def test_determinize(sr):
    base = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((0, 2), sr.one),
         ((1, 3), sr.one), ((2, 3), sr.one)],
        [(3, sr.one)],
        [Label(l) for l in "abcd"],
        sr,
    )
    fsm1 = mm.union(base, base)
    fsm2 = mm.determinize(fsm1)
    assert fsm2.num_states < fsm1.num_states
    assert mm.fsmequal(mm.renorm(fsm2), mm.renorm(fsm1))

    cfsm1 = mm.compose(fsm1, [fsm1] * fsm1.num_states)
    cfsm2 = mm.determinize(cfsm1)
    assert set(cfsm1.labels) == set(cfsm2.labels)


@pytest.mark.parametrize("sr", DIVISIBLE, ids=lambda s: s.name)
def test_minimize(sr):
    base = mm.FSM.from_pairs(
        [(0, sr.one)],
        [((0, 0), sr.one), ((0, 1), sr.one), ((0, 2), sr.one),
         ((1, 3), sr.one), ((2, 3), sr.one)],
        [(3, sr.one)],
        [Label(l) for l in "abcd"],
        sr,
    )
    fsm1 = mm.union(base, base)
    fsm2 = mm.minimize(fsm1)
    assert fsm2.num_states < fsm1.num_states
    assert mm.fsmequal(mm.renorm(fsm2), mm.renorm(fsm1))


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_rawunion_structure(sr):
    fsm1 = chain_fsm(sr, [1, 2])
    fsm2 = chain_fsm(sr, [3, 4])
    raw = mm.rawunion(fsm1, fsm2)
    # two independent extended blocks: each keeps its own phony final state
    assert len(raw.alpha_hat) == 6
    assert raw.T_hat.shape == (6, 6)
    assert raw.T_hat.nnz == fsm1.T_hat.nnz + fsm2.T_hat.nnz
