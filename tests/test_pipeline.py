"""End-to-end LF-MMI graph-prep pipeline on a tiny corpus, then device
scoring of the produced numerator/denominator graphs (closing the reference's
untested-pipeline gap, SURVEY §4)."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

import markovmodels_tpu as mm
from markovmodels_tpu import from_json
from markovmodels_tpu import inference as inf
from markovmodels_tpu.labels import Label
from markovmodels_tpu.pipeline import (
    LinearFSM,
    make_hmms,
    make_lexicon,
    statemap,
)
from markovmodels_tpu.pipeline.prepare_lfmmi_graphs import run_pipeline


@pytest.fixture
def corpus(tmp_path):
    # 2-phone toy language, 3-state left-to-right HMM topology per phone
    (tmp_path / "units").write_text("x\ny\n")
    topo = {
        "semiring": "log",
        "initstates": [[1, 0.0]],
        "arcs": [
            [1, 1, float(np.log(0.5))], [1, 2, float(np.log(0.5))],
            [2, 2, float(np.log(0.5))], [2, 3, float(np.log(0.5))],
            [3, 3, float(np.log(0.5))],
        ],
        "finalstates": [[3, float(np.log(0.5))]],
        "labels": [0, 1, 2],
    }
    (tmp_path / "topo.json").write_text(json.dumps(topo))
    (tmp_path / "lexicon").write_text("ab x y\nba y x\n<unk> x\n")
    (tmp_path / "train.txt").write_text(
        "utt1 ab ba\nutt2 ba ab ab\nutt3 ab\n"
    )
    (tmp_path / "dev.txt").write_text("utt4 ba\n")
    return tmp_path


def test_hmms_and_lexicon(corpus):
    hmms, numpdf = make_hmms(corpus / "units", corpus / "topo.json")
    assert numpdf == 6
    assert set(hmms) == {Label("x"), Label("y")}
    assert hmms[Label("x")].num_states == 3
    # fresh pdf ids per unit
    assert [l[-1] for l in hmms[Label("x")].labels] == [0, 1, 2]
    assert [l[-1] for l in hmms[Label("y")].labels] == [3, 4, 5]

    lex = make_lexicon(mm.LOG, corpus / "lexicon")
    assert set(lex) == {Label("ab"), Label("ba"), Label("<unk>")}
    assert lex[Label("ab")].num_states == 2


def test_full_pipeline_and_scoring(corpus):
    cfg = {
        "data": {
            "units": str(corpus / "units"),
            "lexicon": str(corpus / "lexicon"),
            "traintext": str(corpus / "train.txt"),
            "devtext": str(corpus / "dev.txt"),
        },
        "supervision": {
            "topo": str(corpus / "topo.json"),
            "folder": str(corpus / "out"),
            "ngram_order": 2,
        },
    }
    den_fsm, numpdf = run_pipeline(cfg, num_workers=1)
    out = corpus / "out"
    assert (out / "denominator.fsm.json").exists()
    assert (out / "numfsms" / "train" / "fsm.scp").exists()

    # load one numerator graph + the denominator, score a random batch
    scp = dict(
        l.split() for l in (out / "numfsms" / "train" / "fsm.scp").read_text().splitlines()
    )
    num_fsm = from_json(open(scp["utt1"]).read())
    num_smap = np.load(scp["utt1"].replace(".fsm.json", ".smap.npy"))
    den_smap = np.load(out / "denominator.smap.npy")

    rng = np.random.default_rng(31)
    N = 30
    lhs = jnp.asarray(rng.normal(size=(1, N, numpdf)).astype(np.float32))

    num_cf = inf.compile_fsm(num_fsm, num_smap, numpdf, strategy="segment")
    den_cf = inf.compile_fsm(den_fsm, den_smap, numpdf, strategy="segment")
    loss = inf.lfmmi_loss(inf.stack([num_cf]), den_cf, lhs)
    assert np.isfinite(float(loss[0]))
    # denominator includes every numerator path => logZ_den >= logZ_num
    assert float(loss[0]) >= -1e-4

    # numerator posteriors are a valid distribution over pdfs per frame
    posts, _ = inf.pdfposteriors(num_cf, lhs)
    np.testing.assert_allclose(np.asarray(posts[0]).sum(-1), 1.0, atol=1e-4)


def test_pipeline_restart_skips_done_utterances(corpus, caplog):
    """Re-running the pipeline skips already-serialized utterances (loading
    their cached n-gram stats) and produces identical outputs — the
    reference's restartable per-utterance design
    (prepare-lfmmi-graphs.jl:122-132), plus progress logging."""
    import logging

    cfg = {
        "data": {
            "units": str(corpus / "units"),
            "lexicon": str(corpus / "lexicon"),
            "traintext": str(corpus / "train.txt"),
        },
        "supervision": {
            "topo": str(corpus / "topo.json"),
            "folder": str(corpus / "out"),
            "ngram_order": 2,
        },
    }
    run_pipeline(cfg, num_workers=1)
    out = corpus / "out"
    den1 = (out / "denominator.fsm.json").read_text()
    scp1 = (out / "numfsms" / "train" / "fsm.scp").read_text()
    fsm1 = (out / "numfsms" / "train" / "utt2.fsm.json").read_text()
    mtime1 = os.path.getmtime(out / "numfsms" / "train" / "utt2.fsm.json")

    # delete one utterance's artifacts: only it should be rebuilt
    for suffix in (".fsm.json", ".smap.npy", ".ngrams.pkl"):
        os.remove(out / "numfsms" / "train" / ("utt1" + suffix))

    with caplog.at_level(logging.INFO, "markovmodels_tpu.pipeline"):
        run_pipeline(cfg, num_workers=1)
    assert any("skipped" in r.message for r in caplog.records)
    assert (out / "numfsms" / "train" / "utt1.fsm.json").exists()
    # untouched utterance was not rebuilt; outputs identical
    assert os.path.getmtime(out / "numfsms" / "train" / "utt2.fsm.json") == mtime1
    assert (out / "numfsms" / "train" / "utt2.fsm.json").read_text() == fsm1
    assert (out / "numfsms" / "train" / "fsm.scp").read_text() == scp1
    assert (out / "denominator.fsm.json").read_text() == den1


def test_linear_fsm_silence_variants():
    f = LinearFSM(mm.LOG, ["a", "b"], init_silprob=0.3, silprob=0.2,
                  final_silprob=0.4)
    # states: sil a sil b sil
    assert f.num_states == 5
    labs = [l[0] for l in f.labels]
    assert labs == ["<sil>", "a", "<sil>", "b", "<sil>"]
    # total path mass of a renormalized linear graph stays finite
    assert np.isfinite(mm.totalweightsum(f, 10))
