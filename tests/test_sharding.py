"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel and
state-sharded results must match the single-device recursion exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import markovmodels_tpu as mm
from markovmodels_tpu import inference as inf
from markovmodels_tpu.parallel import (
    make_mesh,
    shard_compiled,
    sharded_pdfposteriors,
    sharded_logmarginal,
)
from markovmodels_tpu.parallel.sharded import sharded_viterbi
from tests.test_inference import make_hmm, oracle_fb


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(21)
    S, P = 37, 6  # deliberately not divisible by shard counts
    fsm, state_pdf, parts = make_hmm(rng, S, P, lr=False)
    return fsm, state_pdf, parts, P


def test_mesh_construction():
    mesh = make_mesh({"data": -1, "model": 4})
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "model": 4})


def test_state_sharded_matches_single_device(graph):
    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(22)
    B, N = 8, 21
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([21, 9, 15, 21, 4, 18, 21, 12], dtype=np.int32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    ref_posts, ref_logZ = inf.pdfposteriors(
        cf, jnp.asarray(lhs), jnp.asarray(lengths), chunk_size=8
    )

    mesh = make_mesh({"data": 2, "model": 4})
    sf = shard_compiled(fsm, state_pdf, P, num_shards=4)
    posts, logZ = sharded_pdfposteriors(
        sf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref_logZ), atol=1e-5)
    np.testing.assert_allclose(np.asarray(posts), np.asarray(ref_posts), atol=1e-5)


def test_state_sharded_model_only(graph):
    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(23)
    B, N = 3, 11
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    _, ref_logZ = inf.pdfposteriors(cf, jnp.asarray(lhs))

    mesh = make_mesh({"model": 8})
    sf = shard_compiled(fsm, state_pdf, P, num_shards=8)
    _, logZ = sharded_pdfposteriors(
        sf, jnp.asarray(lhs), mesh=mesh, data_axis=None
    )
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref_logZ), atol=1e-5)


def test_sharded_gradient(graph):
    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(24)
    B, N = 4, 9
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32))
    lengths = jnp.asarray([9, 5, 9, 7], dtype=jnp.int32)

    mesh = make_mesh({"data": 2, "model": 4})
    sf = shard_compiled(fsm, state_pdf, P, num_shards=4)
    grad = jax.grad(
        lambda x: sharded_logmarginal(sf, x, lengths, mesh=mesh).sum()
    )(lhs)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    posts, _ = inf.pdfposteriors(cf, lhs, lengths)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(posts), atol=1e-5)


def test_sharded_viterbi_exact(graph):
    """Sharded Viterbi paths must equal the single-device decode exactly
    (backpointer exchange over the model axis; BASELINE config 5)."""
    from markovmodels_tpu import viterbi as vit

    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(26)
    B, N = 4, 17
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([17, 8, 13, 17], dtype=np.int32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    ref_states, ref_score = vit.viterbi(
        cf, jnp.asarray(lhs), jnp.asarray(lengths)
    )

    mesh = make_mesh({"data": 2, "model": 4})
    sf = shard_compiled(fsm, state_pdf, P, num_shards=4)
    states, score = sharded_viterbi(
        sf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(ref_score), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(states), np.asarray(ref_states))


def test_sharded_prob_halo_matches_single_device(graph):
    """The fast sharded path (prob domain + static halo exchange) matches
    the single-device recursion; the halo is smaller than the full state."""
    from markovmodels_tpu.parallel.sharded import (
        shard_compiled_prob,
        sharded_pdfposteriors_prob,
    )

    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(28)
    B, N = 8, 21
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([21, 9, 15, 21, 4, 18, 21, 12], dtype=np.int32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    ref_posts, ref_logZ = inf.pdfposteriors(
        cf, jnp.asarray(lhs), jnp.asarray(lengths), chunk_size=8
    )

    mesh = make_mesh({"data": 2, "model": 4})
    sf = shard_compiled_prob(fsm, state_pdf, P, num_shards=4)
    # the halo (rows actually exchanged) must be below the full state range
    assert sf.fwd_halo < sf.local_states * sf.num_shards
    posts, logZ = sharded_pdfposteriors_prob(
        sf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref_logZ), atol=1e-5)
    np.testing.assert_allclose(np.asarray(posts), np.asarray(ref_posts), atol=1e-5)


def test_sharded_prob_gradient_and_halo_report(graph):
    """The fast halo path's differentiable wrapper (the one
    dryrun_multichip exercises): gradient = posteriors; halo_report's sent
    traffic beats the log path's all_gather on this graph."""
    from markovmodels_tpu.parallel.sharded import (
        halo_report,
        shard_compiled_prob,
        sharded_logmarginal_prob,
    )

    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(29)
    B, N = 4, 9
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32))
    lengths = jnp.asarray([9, 5, 9, 7], dtype=jnp.int32)

    mesh = make_mesh({"data": 2, "model": 4})
    sf = shard_compiled_prob(fsm, state_pdf, P, num_shards=4)
    # this toy graph is randomly connected (no shard locality), so only the
    # report's internal consistency is asserted here; the structured LM∘HMM
    # case below asserts the ratio actually beats all_gather
    rep = halo_report(sf)
    assert rep["useful_rows_avg"] <= rep["sent_rows"]
    assert rep["allgather_rows"] == 2 * 3 * sf.local_states
    grad = jax.grad(
        lambda x: sharded_logmarginal_prob(sf, x, lengths, mesh=mesh).sum()
    )(lhs)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    posts, _ = inf.pdfposteriors(cf, lhs, lengths)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(posts), atol=1e-5)


def test_sharded_prob_lm_hmm_family(graph):
    """Halo path on the LM ∘ HMM workload family (the structure of the 2M
    benchmark graph, scaled down): parity vs single device + a halo plan
    strictly below all_gather traffic."""
    from markovmodels_tpu.parallel.sharded import (
        halo_report,
        lm_hmm_assignment,
        shard_compiled_prob,
        sharded_pdfposteriors_prob,
    )
    from markovmodels_tpu.workloads import make_lm_hmm_graph

    fsm, spdf, P, info = make_lm_hmm_graph(V=8, keep=0.8, seed=3)
    rng = np.random.default_rng(30)
    B, N = 4, 11
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([11, 6, 9, 11], dtype=np.int32)

    cf = inf.compile_fsm(fsm, spdf, P, strategy="segment")
    ref_posts, ref_logZ = inf.pdfposteriors(
        cf, jnp.asarray(lhs), jnp.asarray(lengths), chunk_size=8
    )

    mesh = make_mesh({"model": 8})
    # graph-aware assignment: band arcs shard-local, only n-gram arcs halo
    sf = shard_compiled_prob(
        fsm, spdf, P, num_shards=8,
        shard_of=lm_hmm_assignment(8, 3, 8),
    )
    rep = halo_report(sf)
    assert rep["ratio"] < 1.0, rep
    posts, logZ = sharded_pdfposteriors_prob(
        sf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh,
        data_axis=None, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref_logZ),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(posts), np.asarray(ref_posts),
                               atol=1e-5)


def test_timesharded_forward_matches(graph):
    """Temporal parallelism (SURVEY §5.7): frame axis sharded over 8
    devices, chunk operators folded locally + one all_gather — logZ must
    match the sequential scan (ragged lengths included)."""
    from markovmodels_tpu.parallel.timeshard import timesharded_forward

    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(27)
    B, N = 3, 29
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([29, 13, 22], dtype=np.int32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="dense")
    ref = inf.forward(cf, jnp.asarray(lhs), jnp.asarray(lengths))

    mesh = make_mesh({"time": 8})
    logZ = timesharded_forward(
        cf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref), atol=5e-4)


def test_timesharded_posteriors_match(graph):
    """Full parallel forward-backward over the time axis (chunk-fold +
    boundary exchange + local fwd-bwd): posteriors AND logZ must match the
    sequential recursion, ragged lengths included."""
    from markovmodels_tpu.parallel.timeshard import timesharded_pdfposteriors

    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(33)
    B, N = 3, 29
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([29, 13, 22], dtype=np.int32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="dense")
    ref_posts, ref_logZ = inf.pdfposteriors(
        cf, jnp.asarray(lhs), jnp.asarray(lengths)
    )

    mesh = make_mesh({"time": 8})
    posts, logZ = timesharded_pdfposteriors(
        cf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref_logZ),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(posts), np.asarray(ref_posts),
                               atol=1e-4)


def test_data_parallel_jit(graph):
    """Replicated graph + batch sharded over the data axis under plain jit
    (GSPMD handles the rest)."""
    fsm, state_pdf, parts, P = graph
    rng = np.random.default_rng(25)
    B, N = 8, 13
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)

    cf = inf.compile_fsm(fsm, state_pdf, P, strategy="segment")
    ref_posts, ref_logZ = inf.pdfposteriors(cf, jnp.asarray(lhs))

    mesh = make_mesh({"data": 8})
    from jax.sharding import NamedSharding, PartitionSpec as Pp

    lhs_sharded = jax.device_put(lhs, NamedSharding(mesh, Pp("data")))
    f = jax.jit(lambda l: inf.pdfposteriors(cf, l))
    posts, logZ = f(lhs_sharded)
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(ref_logZ), atol=1e-6)
    np.testing.assert_allclose(np.asarray(posts), np.asarray(ref_posts), atol=1e-6)


def test_sharded_prob_backoff_separate_family():
    """The sharded prob/halo path on the round-5 graph family: a small
    separate-state backoff LM ∘ HMM denominator (the reference pipeline's
    own shape) must score identically sharded and unsharded."""
    from markovmodels_tpu.parallel.sharded import (
        shard_compiled_prob,
        sharded_logmarginal_prob,
    )
    from markovmodels_tpu.workloads import make_backoff_lm_hmm_graph

    fsm, spdf, P, _ = make_backoff_lm_hmm_graph(
        V=8, hmm_states=3, keep=0.3, layout="separate"
    )
    rng = np.random.default_rng(31)
    B, N = 4, 15
    lhs = rng.normal(size=(B, N, P)).astype(np.float32)
    lengths = np.array([15, 9, 12, 15], dtype=np.int32)

    cf = inf.compile_fsm(fsm, spdf, P, strategy="block", ov_cap=8)
    ref_logZ = inf.forward(cf, jnp.asarray(lhs), jnp.asarray(lengths))

    mesh = make_mesh({"data": 2, "model": 4})
    sf = shard_compiled_prob(fsm, spdf, P, num_shards=4)
    logZ = sharded_logmarginal_prob(
        sf, jnp.asarray(lhs), jnp.asarray(lengths), mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(logZ), np.asarray(ref_logZ), atol=1e-4
    )
