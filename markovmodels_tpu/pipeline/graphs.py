"""Supervision-graph building blocks for LF-MMI
(reference examples/prepare-lfmmi-graphs.jl:14-100).

Weights follow the reference's convention: semiring-internal representation,
e.g. ``K(log(silprob))`` in the log semiring.
"""
from __future__ import annotations

import json

import numpy as np

from .. import fsmops
from ..fsm import FSM, from_json
from ..labels import Label
from ..semiring import LOG, Semiring

__all__ = ["LinearFSM", "statemap", "make_hmms", "make_lexicon"]


def LinearFSM(
    sr: Semiring,
    seq,
    *,
    init_silprob: float = 0.0,
    silprob: float = 0.0,
    final_silprob: float = 0.0,
    sil_label="<sil>",
) -> FSM:
    """Linear FSM over a token sequence with optional silence insertion
    (reference examples/prepare-lfmmi-graphs.jl:25-65)."""
    arcs = []
    if init_silprob > 0:
        init = [(0, np.log(init_silprob)), (1, np.log(1 - init_silprob))]
        arcs.append(((0, 1), sr.one))
        labels = [Label(sil_label), Label(seq[0])]
        scount = 1
    else:
        init = [(0, sr.one)]
        labels = [Label(seq[0])]
        scount = 0

    for s in seq[1:]:
        if silprob > 0:
            arcs.append(((scount, scount + 1), np.log(silprob)))
            arcs.append(((scount, scount + 2), np.log(1 - silprob)))
            arcs.append(((scount + 1, scount + 2), sr.one))
            labels.append(Label(sil_label))
            labels.append(Label(s))
            scount += 2
        else:
            arcs.append(((scount, scount + 1), sr.one))
            labels.append(Label(s))
            scount += 1

    if final_silprob > 0:
        final = [(scount, np.log(1 - final_silprob)), (scount + 1, sr.one)]
        arcs.append(((scount, scount + 1), np.log(final_silprob)))
        labels.append(Label(sil_label))
    else:
        final = [(scount, sr.one)]

    return FSM.from_pairs(init, arcs, final, labels, sr)


def statemap(fsm: FSM, num_pdfs: int) -> np.ndarray:
    """State→pdf index vector: each state emits the pdf named by the last
    atom of its label (0-based int), the phony final state emits the phony
    pdf ``num_pdfs`` (reference examples/prepare-lfmmi-graphs.jl:15-23, as an
    index vector rather than a binary sparse Ĉ)."""
    out = np.empty(fsm.num_states + 1, dtype=np.int32)
    for i, lab in enumerate(fsm.labels):
        out[i] = int(lab[-1])
    out[fsm.num_states] = num_pdfs
    return out


def make_hmms(units_path: str, topo_json_path: str, sr: Semiring = LOG):
    """Per-unit HMM FSMs from a topology template: the template's ``labels``
    field is rewritten per unit with fresh 0-based pdf ids
    (reference examples/prepare-lfmmi-graphs.jl:67-80).

    Returns (dict label -> FSM, num_pdfs)."""
    with open(topo_json_path) as f:
        topo = json.load(f)
    nstates = len(topo["labels"])
    unitdict = {}
    numpdf = 0
    with open(units_path) as f:
        for line in f:
            unit = line.strip()
            if not unit:
                continue
            topo = dict(topo)
            topo["labels"] = list(range(numpdf, numpdf + nstates))
            unitdict[Label(unit)] = from_json(topo, sr)
            numpdf += nstates
    return unitdict, numpdf


def make_lexicon(sr: Semiring, lexicon_path: str):
    """Pronunciation FSMs per word; homophones union'd, minimized and
    renormalized (reference examples/prepare-lfmmi-graphs.jl:82-100)."""
    lfsm = {}
    with open(lexicon_path) as f:
        for line in f:
            tokens = line.split()
            if len(tokens) < 2:
                continue
            word, pronun = Label(tokens[0]), tokens[1:]
            fsm = LinearFSM(sr, pronun)
            if word in lfsm:
                lfsm[word] = fsmops.renorm(
                    fsmops.minimize(fsmops.union(lfsm[word], fsm))
                )
            else:
                lfsm[word] = fsm
    return lfsm
