"""The benchmark's pre-laid-out 2M-arc graph equals an LM ∘ HMM built
through the graph compiler (``compose``) — proving the pipeline route
(reference examples/prepare-lfmmi-graphs.jl:218-223) produces the same
denominator, and that the vectorized compose bridge handles LM-scale arc
counts.  Equality is checked EXACTLY under the known state permutation
(compose lays sub-FSMs out h-major, the workload plane-major) — the
``fsmequal`` label-sum oracle is infeasible here because label-path sets
grow exponentially on cyclic LM graphs."""
import time

import numpy as np

import markovmodels_tpu as mm
from markovmodels_tpu import hostsparse as hs
from markovmodels_tpu.fsm import FSM
from markovmodels_tpu.fsmops import compose
from markovmodels_tpu.labels import Label
from markovmodels_tpu.semiring import LOG
from markovmodels_tpu.workloads import make_lm_hmm_graph


def lm_hmm_via_compose(V: int, hmm_states: int = 3, seed: int = 0):
    """Same stochastic trigram LM ∘ left-to-right HMMs as
    workloads.make_lm_hmm_graph, but built through the compiler: an H-state
    LM FSM (one state per history) composed with per-history HMM sub-FSMs."""
    rng = np.random.default_rng(seed)
    H = V * V
    K = hmm_states

    # LM over histories h=(a,b): arcs (a,b) -> (b,c) with 0.45*P(c|a,b)
    a_g, b_g, c_g = np.meshgrid(
        np.arange(V), np.arange(V), np.arange(V), indexing="ij"
    )
    src_h = (a_g * V + b_g).ravel()
    dst_h = (b_g * V + c_g).ravel()
    logp = np.log(rng.dirichlet(np.ones(V), size=H).astype(np.float64)).ravel()
    T = hs.spmat_from_coo(
        src_h, dst_h, np.log(0.45) + logp, (H, H), LOG
    )
    alpha = np.full(H, -np.inf)
    alpha[: V] = -np.log(V)  # histories (0, c)
    omega = np.full(H, np.log(0.05))
    # LM labels are the identity so composed labels equal the HMM pdf labels
    lm = FSM.from_parts(alpha, T, omega, [Label()] * H, LOG)

    # one left-to-right HMM per history, emitting pdfs second(h)*K + k
    second = np.tile(np.arange(V), V)
    hmm_rows = np.concatenate(
        [np.arange(K), np.arange(K - 1)]
    )
    hmm_cols = np.concatenate([np.arange(K), np.arange(1, K)])
    hmm_w = np.full(2 * K - 1, np.log(0.5))
    Th = hs.spmat_from_coo(hmm_rows, hmm_cols, hmm_w, (K, K), LOG)
    a_h = np.full(K, -np.inf)
    a_h[0] = 0.0
    o_h = np.full(K, -np.inf)
    o_h[K - 1] = 0.0  # exit weight folded into LM arc/final weights

    hmms = [
        FSM.from_parts(
            a_h, Th, o_h,
            [Label(int(second[h]) * K + k) for k in range(K)], LOG,
        )
        for h in range(H)
    ]
    return compose(lm, hmms)


def test_composed_equals_direct_workload():
    V, K = 6, 3
    H = V * V
    direct, spdf, P, info = make_lm_hmm_graph(V=V)
    composed = lm_hmm_via_compose(V=V)
    S = K * H
    assert composed.num_states == direct.num_states == S
    assert composed.T_hat.nnz == direct.T_hat.nnz

    # composed state (h, k) sits at h*K + k; direct at k*H + h
    h = np.arange(S) // K
    k = np.arange(S) % K
    perm = np.concatenate([k * H + h, [S]])  # composed id -> direct id

    np.testing.assert_allclose(
        composed.alpha_hat, direct.alpha_hat[perm], atol=1e-12
    )
    assert [composed.labels[int(i)] for i in np.argsort(perm)[:S]] == list(
        direct.labels
    )
    rc, cc, dc = hs.findnz(composed.T_hat)
    rd, cd, dd = hs.findnz(direct.T_hat)
    oc = np.lexsort((perm[cc], perm[rc]))
    od = np.lexsort((cd, rd))
    np.testing.assert_array_equal(perm[rc][oc], rd[od])
    np.testing.assert_array_equal(perm[cc][oc], cd[od])
    np.testing.assert_allclose(dc[oc], dd[od], atol=1e-12)


def test_compose_scales_to_lm_arc_counts():
    """The vectorized bridge handles a ~0.5M-arc composition in seconds
    (a per-arc Python loop here takes minutes — the timing guard is
    deliberately loose to stay CI-safe)."""
    V = 48  # 48³ = 110k trigram bridge arcs
    t0 = time.time()
    composed = lm_hmm_via_compose(V=V)
    dt = time.time() - t0
    assert composed.T_hat.nnz > 120_000
    assert dt < 60, f"compose took {dt:.1f}s"
