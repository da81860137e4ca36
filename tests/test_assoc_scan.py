"""Temporally-parallel forward (ops/assoc_scan) vs the sequential scan.

The associative-scan path must match ``inference.forward`` (itself gated
against exact host oracles in test_inference.py) to f32 round-off, including
ragged lengths and zero-length edge cases.
"""
import numpy as np
import pytest

import markovmodels_tpu as mm
from markovmodels_tpu import inference as inf
from markovmodels_tpu.labels import Label
from markovmodels_tpu.ops.assoc_scan import assoc_forward


def _random_graph(S=23, P=7, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(S), 3)
    cols = rng.integers(0, S, size=S * 3)
    w = np.log(rng.dirichlet(np.ones(3), size=S)).ravel()
    arcs = list(zip(zip(rows.tolist(), cols.tolist()), w.tolist()))
    pdfs = rng.integers(0, P, size=S)
    fsm = mm.FSM.from_pairs(
        [(0, 0.0), (1, np.log(0.5))], arcs, [(S - 1, np.log(0.25))],
        [Label(int(p)) for p in pdfs], mm.LOG,
    )
    spdf = np.append(pdfs, P).astype(np.int32)
    return fsm, spdf, P


@pytest.mark.parametrize("chunk", [1, 4, 16])
def test_assoc_forward_matches_sequential(chunk):
    fsm, spdf, P = _random_graph()
    cf = inf.compile_fsm(fsm, spdf, P, strategy="dense")
    rng = np.random.default_rng(1)
    B, N = 5, 33
    lhs = (rng.normal(size=(B, N, P)) * 0.7).astype(np.float32)
    lengths = np.array([N, N - 1, 17, 2, 0], dtype=np.int32)
    want = np.asarray(inf.forward(cf, lhs, lengths))
    got = np.asarray(assoc_forward(cf, lhs, lengths, chunk=chunk))
    # zero-length sequences have logZ = -inf on both paths
    assert np.isneginf(got[-1]) and np.isneginf(want[-1])
    np.testing.assert_allclose(got[:-1], want[:-1], rtol=0, atol=5e-4)


def test_assoc_forward_jit_and_grad_shape():
    import jax

    fsm, spdf, P = _random_graph(seed=3)
    cf = inf.compile_fsm(fsm, spdf, P, strategy="dense")
    rng = np.random.default_rng(2)
    lhs = (rng.normal(size=(2, 12, P)) * 0.5).astype(np.float32)
    f = jax.jit(lambda l: assoc_forward(cf, l, chunk=4))
    out = np.asarray(f(lhs))
    want = np.asarray(inf.forward(cf, lhs))
    np.testing.assert_allclose(out, want, atol=5e-4)


def test_assoc_requires_dense():
    fsm, spdf, P = _random_graph(seed=4)
    cf = inf.compile_fsm(fsm, spdf, P, strategy="segment")
    with pytest.raises(ValueError):
        assoc_forward(cf, np.zeros((1, 4, P), np.float32))
