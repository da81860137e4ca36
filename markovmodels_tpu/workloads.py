"""Benchmark workload graphs.

``make_lm_hmm_graph`` builds an LF-MMI denominator graph at the BASELINE
target scale — an n-gram phonotactic LM over V phones composed with
left-to-right HMMs (the structure produced by the reference pipeline,
examples/prepare-lfmmi-graphs.jl:219) — directly in the compiler's preferred
*plane-major* state layout:

    state(h, k) = k * H + h,    h = first_phone * V + second_phone

so that HMM-internal arcs are constant-offset bands (self: 0, chain: +H) and
the cross-HMM trigram arcs tile into exact 128-source/128-destination dense
blocks for the blocked GMS operator (ops/blocked.py).  V=128 with a full
trigram gives ≈2.18M arcs / ≈49k states / 384 pdfs.
"""
from __future__ import annotations

import numpy as np

from . import hostsparse as hs
from .fsm import FSM
from .labels import Label
from .semiring import LOG

__all__ = ["make_lm_hmm_graph"]


def make_lm_hmm_graph(
    V: int = 128,
    hmm_states: int = 3,
    keep: float = 1.0,
    seed: int = 0,
):
    """Return (fsm, state_pdf, num_pdfs, info) for a trigram-LM ∘ HMM
    denominator graph.

    ``keep`` < 1 randomly prunes trigram arcs (renormalizing the rest),
    exercising the GMS tier/residue paths with uneven blocks.
    """
    rng = np.random.default_rng(seed)
    H = V * V
    K = hmm_states
    S = K * H  # + phony added by FSM.from_parts

    def idx(h, k):
        return k * H + h

    rows, cols, data = [], [], []

    # HMM-internal band arcs: self-loops (offset 0) and chain (offset +H)
    all_h = np.arange(H, dtype=np.int64)
    for k in range(K):
        rows.append(idx(all_h, k))
        cols.append(idx(all_h, k))
        data.append(np.full(H, np.log(0.5)))
    for k in range(K - 1):
        rows.append(idx(all_h, k))
        cols.append(idx(all_h, k + 1))
        data.append(np.full(H, np.log(0.5)))

    # cross-HMM trigram arcs: exit(a,b) -> entry(b,c), weight 0.5·P(c|a,b)
    # histories h=(a,b) at a*V+b; successors (b,c) at b*V+c.
    a_g, b_g, c_g = np.meshgrid(
        np.arange(V), np.arange(V), np.arange(V), indexing="ij"
    )
    src_h = (a_g * V + b_g).ravel()
    dst_h = (b_g * V + c_g).ravel()
    logp = np.log(
        rng.dirichlet(np.ones(V), size=H).astype(np.float64)
    ).ravel()  # P(c | a,b) per (a,b) row
    if keep < 1.0:
        mask = rng.uniform(size=len(src_h)) < keep
        src_h, dst_h, logp = src_h[mask], dst_h[mask], logp[mask]
    # LM exit mass: 0.45 to successors, 0.05 to final
    rows.append(idx(src_h, K - 1))
    cols.append(idx(dst_h, 0))
    data.append(np.log(0.45) + logp)

    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    data = np.concatenate(data)

    alpha = np.full(S, -np.inf)
    # start in entry states of histories with first phone 0 ("<s>")
    start = idx(np.arange(V, dtype=np.int64), 0)  # (0, c) histories
    alpha[start] = -np.log(V)
    omega = np.full(S, -np.inf)
    omega[idx(all_h, K - 1)] = np.log(0.05)

    # pdf of state (h=(a,b), k) = second_phone(h) * K + k
    second = np.tile(np.arange(V), V)  # h -> b
    state_pdf = np.empty(S + 1, dtype=np.int32)
    for k in range(K):
        state_pdf[k * H : (k + 1) * H] = second * K + k
    num_pdfs = V * K
    state_pdf[S] = num_pdfs

    labels = [Label(int(p)) for p in state_pdf[:S]]
    T = hs.spmat_from_coo(rows, cols, data, (S, S), LOG)
    fsm = FSM.from_parts(alpha, T, omega, labels, LOG)
    info = dict(states=S + 1, arcs=fsm.T_hat.nnz, pdfs=num_pdfs, V=V)
    return fsm, state_pdf, num_pdfs, info
