"""FSM + compiled-graph persistence round trips."""
import numpy as np
import jax
import jax.numpy as jnp

import markovmodels_tpu as mm
from markovmodels_tpu import inference as inf
from markovmodels_tpu.serialization import (
    save_fsm, load_fsm, save_compiled, load_compiled,
)
from tests.test_inference import make_hmm


def test_fsm_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(40)
    fsm, spdf, _ = make_hmm(rng, 6, 3)
    p = str(tmp_path / "g.npz")
    save_fsm(p, fsm, spdf)
    fsm2, spdf2 = load_fsm(p)
    assert mm.fsmequal(fsm, fsm2)
    np.testing.assert_array_equal(spdf, spdf2)


def _roundtrip_check(cf, tmp_path, name, lhs, lengths):
    p = str(tmp_path / name)
    save_compiled(p, cf)
    cf2 = load_compiled(p)
    a, b = inf.pdfposteriors(cf, lhs, lengths)
    c, d = inf.pdfposteriors(cf2, lhs, lengths)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-7)
    np.testing.assert_allclose(np.asarray(b), np.asarray(d), atol=1e-7)


def test_compiled_roundtrip_all_strategies(tmp_path):
    rng = np.random.default_rng(41)
    fsm, spdf, _ = make_hmm(rng, 9, 4, lr=False)
    lhs = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    lengths = jnp.asarray([12, 7], dtype=jnp.int32)
    for strategy in ("segment", "ell", "dense", "block"):
        cf = inf.compile_fsm(fsm, spdf, 4, strategy=strategy)
        _roundtrip_check(cf, tmp_path, f"{strategy}.npz", lhs, lengths)
