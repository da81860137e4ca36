"""N-gram counting + LM FSM construction (reference src/lmfsm.jl has no
in-repo tests — SURVEY §4 flags this gap; closed here with hand-computed
oracles)."""
import numpy as np
import pytest

import markovmodels_tpu as mm
from markovmodels_tpu.labels import Label


def linear_sentence(sr, words):
    n = len(words)
    arcs = [((i, i + 1), sr.one) for i in range(n - 1)]
    return mm.FSM.from_pairs(
        [(0, sr.one)], arcs, [(n - 1, sr.one)], [Label(w) for w in words], sr
    )


def test_bigram_counts_log():
    sr = mm.LOG
    fsm = linear_sentence(sr, ["a", "b", "a"])
    ngrams = mm.totalngramsum(fsm, order=2)
    # windows of exactly 2 states on pad(1)+sentence:
    #   [p, a]  -> ("a",)      iw = one, w = one, fw = zero
    #   [a, b]  -> ("a", "b")  iw = zero, w = one, fw = zero
    #   [b, a]  -> ("b", "a")  iw = zero, w = one, fw = one
    assert set(ngrams) == {("a",), ("a", "b"), ("b", "a")}
    iw, w, fw = ngrams[("a",)]
    assert iw == sr.one and w == sr.one and fw == sr.zero
    iw, w, fw = ngrams[("a", "b")]
    assert iw == sr.zero and w == sr.one and fw == sr.zero
    iw, w, fw = ngrams[("b", "a")]
    assert iw == sr.zero and w == sr.one and fw == sr.one


def test_trigram_counts():
    sr = mm.LOG
    fsm = linear_sentence(sr, ["a", "b", "c"])
    ngrams = mm.totalngramsum(fsm, order=3)
    assert set(ngrams) == {("a",), ("a", "b"), ("a", "b", "c")}
    iw, w, fw = ngrams[("a",)]
    assert iw == sr.one and fw == sr.zero
    iw, w, fw = ngrams[("a", "b")]
    assert iw == sr.zero and fw == sr.zero
    iw, w, fw = ngrams[("a", "b", "c")]
    assert iw == sr.zero and w == sr.one and fw == sr.one


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dp_matches_label_semiring_lift_on_cyclic_graph(order):
    """The DP redesign (totalngramsum) vs the reference's own construction
    (totalngramsum_lifted: AppendConcat/Product label semirings + totalsum,
    reference src/lmfsm.jl:37-52) on a *cyclic weighted* FSM — loops with
    unequal weights and multiple paths realizing the same n-gram are
    exactly where the two could diverge."""
    sr = mm.LOG
    rng = np.random.default_rng(31)
    # 4 states, cycles: self-loop on 1, back edge 2->0, two initial states
    arcs = [
        ((0, 1), np.log(0.5)),
        ((1, 1), np.log(0.3)),  # self-loop
        ((1, 2), np.log(0.4)),
        ((2, 0), np.log(0.6)),  # back edge (cycle 0->1->2->0)
        ((2, 3), np.log(0.2)),
        ((3, 1), np.log(0.7)),  # second cycle 1->2->3->1
    ]
    fsm = mm.FSM.from_pairs(
        [(0, np.log(0.8)), (1, np.log(0.2))],
        arcs,
        [(2, np.log(0.3)), (3, np.log(0.5))],
        [Label(w) for w in ["a", "b", "a", "c"]],
        sr,
    )
    dp = mm.totalngramsum(fsm, order=order)
    from markovmodels_tpu.lmfsm import totalngramsum_lifted

    lifted = totalngramsum_lifted(fsm, order=order)
    assert set(dp) == set(lifted)
    for g in dp:
        np.testing.assert_allclose(
            np.asarray(dp[g], dtype=np.float64),
            np.asarray(lifted[g], dtype=np.float64),
            atol=1e-10,
            err_msg=f"ngram {g}",
        )


def test_ngram_merge_counts_multiplicity():
    sr = mm.PROB  # counts are literal in the prob semiring
    s1 = mm.totalngramsum(linear_sentence(sr, ["a", "b"]), order=2)
    s2 = mm.totalngramsum(linear_sentence(sr, ["a", "b"]), order=2)
    merged = mm.merge_ngrams(s1, s2, sr)
    iw, w, fw = merged[("a", "b")]
    assert w == 2.0 and fw == 2.0
    iw, w, fw = merged[("a",)]
    assert iw == 2.0


def test_language_model_fsm_bigram():
    sr = mm.PROB
    stats = {}
    for words in [["a", "b", "a"], ["a", "b"], ["b", "a"]]:
        stats = mm.merge_ngrams(
            stats, mm.totalngramsum(linear_sentence(sr, words), order=2), sr
        )
    lm = mm.language_model_fsm(stats, sr)
    # states: ("a",) and ("b",); renormalized per state
    assert lm.num_states == 2
    labels = {tuple(l) for l in lm.labels}
    assert labels == {("a",), ("b",)}
    ia = lm.labels.index(("a",))
    ib = lm.labels.index(("b",))
    alpha = lm.alpha
    # initial mass normalized over sentence-start counts: a: 2, b: 1
    np.testing.assert_allclose(alpha[ia], 2 / 3, atol=1e-12)
    np.testing.assert_allclose(alpha[ib], 1 / 3, atol=1e-12)
    # per-state renorm: outgoing ⊕ final = one
    T = lm.T.to_dense(sr)
    omega = lm.omega
    row_tot = T.sum(axis=1) + omega
    np.testing.assert_allclose(row_tot, np.ones(2), atol=1e-12)


def test_lm_fsm_composes_with_hmms():
    """Denominator construction shape: LM ∘ per-unit HMMs
    (reference examples/prepare-lfmmi-graphs.jl:219)."""
    sr = mm.LOG
    stats = {}
    for words in [["a", "b"], ["b", "a"], ["a", "a"]]:
        stats = mm.merge_ngrams(
            stats, mm.totalngramsum(linear_sentence(sr, words), order=2), sr
        )
    lm = mm.language_model_fsm(stats, sr)
    # 3-state left-to-right HMM per unit
    def hmm(unit, pdf0):
        arcs = []
        for i in range(3):
            arcs.append(((i, i), np.log(0.5)))
            if i < 2:
                arcs.append(((i, i + 1), np.log(0.5)))
        return mm.FSM.from_pairs(
            [(0, sr.one)], arcs, [(2, np.log(0.5))],
            [Label(pdf0 + k) for k in range(3)], sr
        )

    hmms = {Label("a"): hmm("a", 0), Label("b"): hmm("b", 3)}
    den = mm.compose(lm, hmms)
    assert den.num_states == lm.num_states * 3
    # every LM state expanded: labels concatenate history + pdf id
    assert all(len(l) >= 2 for l in den.labels)
