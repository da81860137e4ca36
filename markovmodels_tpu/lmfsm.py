"""N-gram counting and language-model FSM construction
(reference src/lmfsm.jl).

``totalngramsum`` computes, for every n-gram of state labels realized by a
window of exactly ``order`` states (with a phony pad chain so sentence-initial
shorter n-grams are captured, reference src/lmfsm.jl:27-35), the triple

    (initial weight, interior path weight, final weight)

summed over all realizing paths.  The reference does this by decorating the
FSM with a nested product semiring and running ``totalsum``
(src/lmfsm.jl:37-59); here the same quantity is computed by an explicit
dynamic program over (state, n-gram) cells, which is algebraically identical
(the decorated semiring is the free semiring over per-path terms).

``language_model_fsm`` then builds the n-gram history-state LM automaton and
renormalizes it — the LF-MMI denominator phonotactic LM
(reference src/lmfsm.jl:81-119, examples/prepare-lfmmi-graphs.jl:219).
"""
from __future__ import annotations

import numpy as np

from .fsm import FSM
from .fsmops import concat, renorm
from .labels import Label
from . import hostsparse as hs

__all__ = ["totalngramsum", "language_model_fsm", "merge_ngrams"]


def totalngramsum(fsm: FSM, order: int) -> dict:
    """n-gram statistics of ``fsm``: dict ngram-tuple -> (iw, w, fw)."""
    sr = fsm.sr

    # Keep only the last atom of each state label (reference src/lmfsm.jl:17-22).
    labels = [Label(lab[-1]) if len(lab) else Label() for lab in fsm.labels]
    fsm = FSM(fsm.sr, fsm.alpha_hat, fsm.T_hat, labels)

    # Pad with a chain of order-1 empty-labelled states so windows crossing the
    # sentence start yield the shorter initial n-grams (src/lmfsm.jl:27-35).
    if order > 1:
        n = order - 1
        pad = FSM.from_pairs(
            [(0, sr.one)],
            [((i, i + 1), sr.one) for i in range(n - 1)],
            [(n - 1, sr.one)],
            [Label()] * n,
            sr,
        )
        fsm = concat(pad, fsm)

    S = fsm.num_states
    alpha, omega = fsm.alpha, fsm.omega
    labs = fsm.labels
    rows, cols, data = hs.findnz(fsm.T)

    # DP over paths of exactly `order` states.  Cell (state, ngram) holds
    # [Σ iw, Σ w, Σ 1] over paths of the current length ending at `state`
    # realizing `ngram`; components extend independently under path extension
    # because iw = α(start), w = ⊗ arc weights, mult counts paths.
    cur = [
        {tuple(labs[s]): [alpha[s], sr.one, sr.one]} for s in range(S)
    ]
    for _ in range(order - 1):
        nxt: list[dict] = [dict() for _ in range(S)]
        for s, t, w_arc in zip(rows, cols, data):
            s, t = int(s), int(t)
            lab_t = tuple(labs[t])
            cell = nxt[t]
            for g, (iw, w, mult) in cur[s].items():
                ng = g + lab_t
                acc = cell.get(ng)
                w2 = sr.mul(w, w_arc)
                if acc is None:
                    cell[ng] = [iw, w2, mult]
                else:
                    acc[0] = sr.add(acc[0], iw)
                    acc[1] = sr.add(acc[1], w2)
                    acc[2] = sr.add(acc[2], mult)
        cur = nxt

    ngrams: dict = {}
    for s in range(S):
        om = omega[s]
        for g, (iw, w, mult) in cur[s].items():
            a, b, c = ngrams.get(g, (sr.zero, sr.zero, sr.zero))
            # per-path final weight is ω(end); Σ over paths = mult ⊗ ω.
            ngrams[g] = (sr.add(a, iw), sr.add(b, w), sr.add(c, sr.mul(mult, om)))
    return ngrams


def merge_ngrams(a: dict, b: dict, sr) -> dict:
    """⊕-merge two n-gram stat dicts (the reference's distributed reduction
    ``mergewith((x,y) -> x .+ y)``, examples/prepare-lfmmi-graphs.jl:109)."""
    out = dict(a)
    for g, (iw, w, fw) in b.items():
        if g in out:
            x, y, z = out[g]
            out[g] = (sr.add(x, iw), sr.add(y, w), sr.add(z, fw))
        else:
            out[g] = (iw, w, fw)
    return out


def language_model_fsm(ngrams: dict, sr) -> FSM:
    """History-state n-gram LM FSM from n-gram stats, renormalized
    (reference src/lmfsm.jl:81-119)."""
    states: dict = {}
    initstates: dict = {}
    finalstates: dict = {}
    arcs: dict = {}

    order = max((len(g) for g in ngrams), default=0)

    def state_of(h):
        if h not in states:
            states[h] = len(states)
        return states[h]

    for ngram, (iw, w, fw) in ngrams.items():
        L = len(ngram)
        if L == 1 and not sr.is_zero(iw):
            i = state_of(ngram)
            initstates[ngram] = sr.add(initstates.get(ngram, sr.zero), iw)
            if not sr.is_zero(fw):
                finalstates[ngram] = sr.add(finalstates.get(ngram, sr.zero), fw)
        elif L > 1:
            src = ngram[: min(order, L) - 1]
            dest = ngram[max(0, L - order + 1) :]
            si, di = state_of(src), state_of(dest)
            arcs[(si, di)] = sr.add(arcs.get((si, di), sr.zero), w)
            if not sr.is_zero(fw):
                finalstates[dest] = sr.add(finalstates.get(dest, sr.zero), fw)

    labels = [None] * len(states)
    for h, i in states.items():
        labels[i] = tuple(h)

    fsm = FSM.from_pairs(
        [(states[h], v) for h, v in initstates.items()],
        [((i, j), v) for (i, j), v in arcs.items()],
        [(states[h], v) for h, v in finalstates.items()],
        labels,
        sr,
    )
    return renorm(fsm)
