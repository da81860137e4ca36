"""LF-MMI supervision-graph preparation job.

TPU-native analog of the reference's TOML-config-driven batch pipeline
(reference examples/prepare-lfmmi-graphs.jl:102-224): per-utterance numerator
graphs ``G ∘ L ∘ H`` serialized to disk with .scp manifests, n-gram stats
accumulated in parallel (python multiprocessing instead of Julia Distributed,
with the same associative ⊕-merge reduction), then the denominator graph
``LanguageModelFSM(ngrams) ∘ H``.

Run:  python -m markovmodels_tpu.pipeline.prepare_lfmmi_graphs config.toml
Config sections match the reference (data: units/lexicon/traintext/devtext;
supervision: topo/folder/silprobs/ngram_order).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys

import numpy as np

from .. import fsmops
from ..fsm import FSM, to_json
from ..labels import Label
from ..lmfsm import language_model_fsm, merge_ngrams, totalngramsum
from ..semiring import LOG
from .graphs import LinearFSM, make_hmms, make_lexicon, statemap

__all__ = ["make_numerator_graphs", "run_pipeline", "main"]

_WORKER_CTX = {}


def _init_worker(lexicon, hmms, numpdf, folder, silcfg, ngram_order):
    _WORKER_CTX.update(
        lexicon=lexicon,
        hmms=hmms,
        numpdf=numpdf,
        folder=folder,
        silcfg=silcfg,
        ngram_order=ngram_order,
    )


def _process_utterance(line: str):
    """Build and serialize one utterance's numerator graph; return
    (uttid, fsm_path, smap_path, ngram stats)."""
    c = _WORKER_CTX
    tokens = line.split()
    if len(tokens) < 2:
        return None
    uttid, seq = tokens[0], tokens[1:]
    lexicon = c["lexicon"]
    seq = [s if Label(s) in lexicon else "<unk>" for s in seq]

    G = LinearFSM(LOG, seq, **c["silcfg"])
    GL = fsmops.compose(G, lexicon)
    GLH = fsmops.compose(GL, c["hmms"])

    fsm_path = os.path.join(c["folder"], uttid + ".fsm.json")
    with open(fsm_path, "w") as f:
        f.write(to_json(GLH))
    smap_path = os.path.join(c["folder"], uttid + ".smap.npy")
    np.save(smap_path, statemap(GLH, c["numpdf"]))

    ngrams = totalngramsum(GL, order=c["ngram_order"])
    return uttid, fsm_path, smap_path, ngrams


def make_numerator_graphs(
    folder: str,
    text_path: str,
    lexicon,
    hmms,
    numpdf: int,
    *,
    init_silprob: float = 0.0,
    silprob: float = 0.0,
    final_silprob: float = 0.0,
    ngram_order: int = 2,
    num_workers: int = 0,
):
    """Parallel numerator-graph build over the transcript file; returns the
    ⊕-merged n-gram stats (reference examples/prepare-lfmmi-graphs.jl:102-139).
    """
    os.makedirs(folder, exist_ok=True)
    silcfg = dict(
        init_silprob=init_silprob, silprob=silprob, final_silprob=final_silprob
    )
    with open(text_path) as f:
        lines = [l.strip() for l in f if l.strip()]

    args = (lexicon, hmms, numpdf, folder, silcfg, ngram_order)
    if num_workers and num_workers > 1:
        with mp.Pool(num_workers, initializer=_init_worker, initargs=args) as pool:
            results = pool.map(_process_utterance, lines, chunksize=8)
    else:
        _init_worker(*args)
        results = [_process_utterance(l) for l in lines]

    ngrams: dict = {}
    with open(os.path.join(folder, "fsm.scp"), "w") as fscp, open(
        os.path.join(folder, "smap.scp"), "w"
    ) as sscp:
        for r in results:
            if r is None:
                continue
            uttid, fsm_path, smap_path, ng = r
            print(uttid, fsm_path, file=fscp)
            print(uttid, smap_path, file=sscp)
            ngrams = merge_ngrams(ngrams, ng, LOG)
    return ngrams


def run_pipeline(config: dict, num_workers: int = 0):
    """Full pipeline from a parsed TOML/JSON config dict
    (reference examples/prepare-lfmmi-graphs.jl:142-224)."""
    data, sup = config["data"], config["supervision"]
    folder = sup["folder"]
    os.makedirs(folder, exist_ok=True)

    hmms, numpdf = make_hmms(data["units"], sup["topo"])
    with open(os.path.join(folder, "numpdf"), "w") as f:
        print(numpdf, file=f)

    lexicon = make_lexicon(LOG, data["lexicon"])

    sil = dict(
        init_silprob=sup.get("initial_silprob", 0.0),
        silprob=sup.get("silprob", 0.0),
        final_silprob=sup.get("final_silprob", 0.0),
    )
    ngrams = None
    for split, key in [("train", "traintext"), ("dev", "devtext")]:
        if key not in data:
            continue
        out = os.path.join(folder, "numfsms", split)
        os.makedirs(out, exist_ok=True)
        ng = make_numerator_graphs(
            out,
            data[key],
            lexicon,
            hmms,
            numpdf,
            ngram_order=sup.get("ngram_order", 2),
            num_workers=num_workers,
            **sil,
        )
        if split == "train":
            ngrams = ng

    lmfsm = fsmops.compose(language_model_fsm(ngrams, LOG), hmms)
    with open(os.path.join(folder, "denominator.fsm.json"), "w") as f:
        f.write(to_json(lmfsm))
    np.save(os.path.join(folder, "denominator.smap.npy"), statemap(lmfsm, numpdf))
    return lmfsm, numpdf


def main(argv=None):
    import tomllib

    argv = argv if argv is not None else sys.argv[1:]
    cfg_path = argv[0] if argv else os.environ.get("CONFIG")
    if not cfg_path:
        print("usage: python -m markovmodels_tpu.pipeline.prepare_lfmmi_graphs "
              "config.toml  (or set CONFIG=...)", file=sys.stderr)
        return 2
    with open(cfg_path, "rb") as f:
        config = tomllib.load(f)
    workers = int(argv[1]) if len(argv) > 1 else os.cpu_count()
    run_pipeline(config, num_workers=workers)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
