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


def test_load_openfst_lfmmi_conventions(tmp_path):
    """OpenFST-text LF-MMI loader: 1-based ids, negated weights, arcs from
    state 0 are initial weights, ilabel = destination state's 1-based pdf."""
    import numpy as np

    from markovmodels_tpu.serialization import load_openfst_lfmmi

    p = tmp_path / "g.txt"
    p.write_text(
        "0 1 1 1 -0.1\n"   # init: state 1 (0-based 0), alpha = 0.1, pdf 0
        "1 2 2 2 0.7\n"    # arc 0->1 weight -0.7, state 1 has pdf 1
        "2 1 1 1 0.3\n"    # arc 1->0 weight -0.3
        "2 0.25\n"         # final state 1 (0-based), omega = -0.25
    )
    fsm, spdf, P = load_openfst_lfmmi(str(p))
    assert P == 2
    assert fsm.num_states == 2
    np.testing.assert_allclose(fsm.alpha, [0.1, fsm.sr.zero])
    np.testing.assert_allclose(fsm.omega, [fsm.sr.zero, -0.25])
    arcs = dict(((i, j), w) for i, j, w in fsm.arcs())
    assert np.isclose(arcs[(0, 1)], -0.7) and np.isclose(arcs[(1, 0)], -0.3)
    np.testing.assert_array_equal(spdf, [0, 1, 2])


def test_compiled_roundtrip_ov_and_banded(tmp_path):
    """save/load_compiled must round-trip the round-5 graph forms: a
    capped/overflow block graph (ov_w leaves + ov desc metadata) and a
    'banded' graph (band arrays + offsets metadata)."""
    import jax.numpy as jnp

    from markovmodels_tpu import inference as inf
    from markovmodels_tpu.serialization import load_compiled, save_compiled
    from markovmodels_tpu.workloads import make_backoff_lm_hmm_graph

    fsm, spdf, P, _ = make_backoff_lm_hmm_graph(
        V=8, hmm_states=3, keep=0.3, layout="separate"
    )
    cf = inf.compile_fsm(fsm, spdf, P, strategy="block", ov_cap=8)
    assert cf.ov_layout and cf.block_fwd.ov_w
    p = str(tmp_path / "ov.npz")
    save_compiled(p, cf)
    cf2 = load_compiled(p)
    assert cf2.ov_layout == cf.ov_layout
    assert cf2.block_fwd_offsets == cf.block_fwd_offsets
    rng = np.random.default_rng(2)
    lhs = jnp.asarray(rng.normal(size=(2, 9, P)).astype(np.float32))
    _, z1 = inf.pdfposteriors(cf, lhs)
    _, z2 = inf.pdfposteriors(cf2, lhs)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=1e-6)

    import markovmodels_tpu as mm
    from markovmodels_tpu.labels import Label as _L

    seq = rng.integers(0, P, size=6)
    arcs = [((i, i), np.log(0.5)) for i in range(6)] + [
        ((i, i + 1), np.log(0.5)) for i in range(5)
    ]
    f = mm.FSM.from_pairs(
        [(0, 0.0)], arcs, [(5, np.log(0.5))],
        [_L(int(s)) for s in seq], mm.LOG,
    )
    cb = inf.compile_fsm(f, np.append(seq, P).astype(np.int32), P,
                         strategy="banded")
    pb_ = str(tmp_path / "banded.npz")
    save_compiled(pb_, cb)
    cb2 = load_compiled(pb_)
    assert cb2.banded_offsets == cb.banded_offsets
    _, z1 = inf.pdfposteriors(cb, lhs)
    _, z2 = inf.pdfposteriors(cb2, lhs)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=1e-6)
