"""Parity tests for the fused blocked Pallas scan (ops/pallas_block.py).

Runs the exact kernel bodies in Pallas interpret mode on CPU
(MMTPU_PALLAS_INTERPRET) against the XLA block path (inference._fb_prob),
on the V=128 trigram LM ∘ HMM workload whose operator exercises the affine
tier descriptors (band + affine_k_major/affine_d_pad fwd,
affine_s_major/affine_k_pad bwd).  Frame count is kept tiny — interpret
mode executes the kernels in Python.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from markovmodels_tpu import inference as inf
from markovmodels_tpu.ops import pallas_block as pb
from markovmodels_tpu.workloads import make_lm_hmm_graph


@pytest.fixture(scope="module")
def raw_graph():
    return make_lm_hmm_graph(V=128)


@pytest.fixture(scope="module")
def graph(raw_graph):
    fsm, spdf, P, info = raw_graph
    cf = inf.compile_fsm(fsm, spdf, P, strategy="block")
    return cf, P


@pytest.fixture
def pallas_on(monkeypatch):
    monkeypatch.setenv("MMTPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("MMTPU_NO_PALLAS", raising=False)


def test_supported_and_plans(graph):
    cf, P = graph
    assert pb.block_scan_supported(cf, 8)
    W, R, pf, pb_ = pb._full_plan(cf)
    assert W == 384 and R == 128
    assert pf["g"][0] == "row" and pf["s"][0] == "col"
    assert pb_["g"][0] == "col" and pb_["s"][0] == "row"


def test_fused_block_matches_xla_path(graph, pallas_on, monkeypatch):
    """posts + logZ parity vs the lax.scan block path, ragged lengths
    (incl. an infeasible L=1 sequence -> logZ = -inf on both paths) and a
    chunk boundary in the middle of the sequence."""
    cf, P = graph
    B, N = 8, 4
    rng = np.random.default_rng(7)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([4, 3, 4, 1, 3, 4, 4, 3], dtype=jnp.int32)

    assert inf._pallas_block_ok(cf, lhs)
    p1, z1 = inf.pdfposteriors(cf, lhs, lens, chunk_size=2)
    monkeypatch.setenv("MMTPU_NO_PALLAS", "1")
    p0, z0 = inf.pdfposteriors(cf, lhs, lens, chunk_size=2)

    z0, z1 = np.asarray(z0), np.asarray(z1)
    fin = np.isfinite(z0)
    assert (np.isfinite(z1) == fin).all()
    np.testing.assert_allclose(z1[fin], z0[fin], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)
    # posteriors exactly zero past each length
    for b in range(B):
        assert np.all(np.asarray(p1)[b, int(lens[b]):] == 0.0)


def test_bp_viterbi_matches_recompute_path(graph, raw_graph, monkeypatch):
    """Compressed-backpointer decode vs the chunk-recompute fallback on the
    V=128 affine-tier graph: matching scores and optimal paths, ragged."""
    from markovmodels_tpu import viterbi as vit

    cf, P = graph
    B, N = 8, 4
    rng = np.random.default_rng(13)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([4, 3, 4, 2, 3, 4, 4, 3], dtype=jnp.int32)

    assert vit._bp_vit_ok(cf, lhs)
    s1, z1 = vit.viterbi(cf, lhs, lens)
    monkeypatch.setenv("MMTPU_NO_VITBP", "1")
    monkeypatch.setenv("MMTPU_NO_PALLAS", "1")
    s0, z0 = vit.viterbi(cf, lhs, lens, chunk_size=2)

    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-5)
    # both decoders may break exact ties differently; each path must be
    # valid and achieve the optimal score in exact f64 arithmetic
    import scipy.sparse as sp

    from markovmodels_tpu import hostsparse as hs

    fsm, spdf = raw_graph[0], raw_graph[1]
    rows, cols, data = hs.findnz(fsm.T_hat)
    S1 = len(fsm.alpha_hat)
    T = sp.csr_matrix(
        (np.asarray(data, dtype=np.float64), (rows, cols)), shape=(S1, S1)
    )
    T.sort_indices()

    def arc_w(i, j):
        lo, hi = T.indptr[i], T.indptr[i + 1]
        k = lo + np.searchsorted(T.indices[lo:hi], j)
        return T.data[k] if k < hi and T.indices[k] == j else -np.inf

    a0 = np.asarray(fsm.alpha_hat, dtype=np.float64)
    lhs_np = np.asarray(lhs)
    for states, score in ((np.asarray(s1), np.asarray(z1)),
                          (np.asarray(s0), np.asarray(z0))):
        for b in range(B):
            L = int(lens[b])
            if not np.isfinite(score[b]):
                continue  # infeasible (L < HMM length): path undefined
            path = states[b, :L]
            w = a0[path[0]] + float(
                lhs_np[b, np.arange(L), spdf[path]].astype(np.float64).sum()
            )
            for t in range(L - 1):
                w += arc_w(path[t], path[t + 1])
            w += arc_w(path[L - 1], S1 - 1)
            np.testing.assert_allclose(w, float(score[b]), atol=1e-4)


def test_fused_block_partial_batch_slice(graph, pallas_on, monkeypatch):
    """B not a multiple of the kernel batch slice: the last slice is padded
    with all-zero emission sequences and trimmed from every output (lifting
    the former B % 64 restriction).  _BH is shrunk so the multi-slice +
    padding path runs cheaply in interpret mode."""
    cf, P = graph
    monkeypatch.setattr(pb, "_BH", 8)
    B, N = 12, 3  # -> two 8-wide slices, 4 padded columns
    rng = np.random.default_rng(3)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([3, 2, 3, 3, 2, 3, 3, 2, 3, 3, 2, 3], dtype=jnp.int32)

    assert pb.block_scan_supported(cf, B)
    p1, z1 = inf.pdfposteriors(cf, lhs, lens, chunk_size=2)
    monkeypatch.setenv("MMTPU_NO_PALLAS", "1")
    p0, z0 = inf.pdfposteriors(cf, lhs, lens, chunk_size=2)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)


def test_descriptor_classifiers_all_branches():
    """_gather_desc/_scatter_desc classify every affine family; _dir_plan
    lowers the mirror (contig / affine_d) scatter forms too."""
    from markovmodels_tpu.ops import blocked as bl

    lim = 4096
    K, Sm, D = 4, 8, 8
    k, m = np.arange(K)[:, None], np.arange(Sm)[None, :]
    # gather forms
    assert bl._gather_desc(7 + k * 64 + m, lim)[0] == "affine_k_major"
    assert bl._gather_desc(7 + k + m * 64, lim)[0] == "affine_s_major"
    # a K=1 strided row is subsumed by the windowed s-major form (the
    # 'diag' fallback would also be valid but the window is preferred)
    assert bl._gather_desc(
        np.arange(Sm)[None, :] * 5 + 3, lim
    )[0] == "affine_s_major"
    rng = np.random.default_rng(0)
    assert bl._gather_desc(
        rng.integers(0, lim, size=(K, Sm)), lim
    )[0] == "gather"
    d = np.arange(D)[None, :]
    # scatter forms
    assert bl._scatter_desc(64 + k * D + d, lim)[0] == "contig"
    assert bl._scatter_desc(64 + k + d * K, lim)[0] == "affine_d"
    assert bl._scatter_desc(64 + k * 32 + d, lim)[0] == "affine_k_pad"
    assert bl._scatter_desc(64 + k + d * 32, lim)[0] == "affine_d_pad"
    assert bl._scatter_desc(
        np.arange(D)[None, :] * 7 + 2, lim
    )[0] == "affine_d_pad"  # K=1 strided row: windowed form subsumes diag
    assert bl._scatter_desc(
        rng.integers(0, lim, size=(K, D)), lim
    )[0] == "scatter"
    # right-edge window shift: affine pattern overrunning `limit` comes
    # back with col0 > 0 instead of falling off the fast path
    desc = bl._gather_desc((lim - K * 64) + k * 64 + (64 - Sm) + m, lim)
    assert desc[0] == "affine_k_major" and desc[3] > 0


def test_dir_plan_mirror_branches():
    """_dir_plan lowers the 'contig' and 'affine_d' scatter descriptors
    (the mirror of what the V=128 LM∘HMM operator produces) and the
    row/row plan shape; _tier_scratch sizes follow."""
    from markovmodels_tpu.ops import pallas_block as pb
    from markovmodels_tpu.ops.blocked import BlockOperator

    W, R, cmax = 256, 4, 128
    K, Sm, D = 4, 64, 64
    sidx = (np.arange(K)[:, None] * W + np.arange(Sm)[None, :]).astype(
        np.int32
    )
    didx = (np.arange(K)[:, None] * W + np.arange(D)[None, :]).astype(
        np.int32
    )
    op = BlockOperator(
        band_w=None,
        tiers=((sidx, didx, np.zeros((K, Sm, D), np.float32)),),
        res_src=None, res_dst=None, res_w=None,
    )
    gdesc = ("affine_k_major", 0, W, 0)
    # contig scatter didx[k, j] = k·W + j  (dk == W ≡ 'affine_k_pad' form
    # degenerates to contig only when D == W; use the pad form with dk=W)
    meta = ((0,), ((gdesc, ("contig", 0)),))
    plan = pb._dir_plan(op, meta, W, R, cmax)
    assert plan is None or plan["s"][0] == "row"  # contig: dk2=D != W -> None
    # affine_k_pad with stride W lowers to the row scatter branch
    meta = ((0,), ((gdesc, ("affine_k_pad", 0, W, 0)),))
    plan = pb._dir_plan(op, meta, W, R, cmax)
    assert plan is not None and plan["g"][0] == "row" and plan["s"][0] == "row"
    assert pb._tier_scratch(plan, 8, cmax) == (1, 8, 8)
    # affine_d_pad scatter with K == cmax lowers to the col (staged
    # transpose) branch — the shape family the V=128 graph's fwd plan uses
    K2 = cmax2 = Sm2 = D2 = 4
    sidx2 = (np.arange(K2)[:, None] * W + np.arange(Sm2)[None, :]).astype(
        np.int32
    )
    op2 = BlockOperator(
        band_w=None,
        tiers=((sidx2, sidx2, np.zeros((K2, Sm2, D2), np.float32)),),
        res_src=None, res_dst=None, res_w=None,
    )
    meta = ((0,), ((("affine_k_major", 0, W, 0),
                    ("affine_d_pad", 0, W, 0)),))
    plan = pb._dir_plan(op2, meta, W, R, cmax2)
    assert plan is not None and plan["g"][0] == "row" and plan["s"][0] == "col"
    # col-scatter needs no staging scratch (batched dot output feeds the
    # transpose directly); only col-GATHER plans allocate the full buffer
    assert pb._tier_scratch(plan, 8, cmax2) == (1, 8, 8)
    plan_colg = pb._dir_plan(
        op2, ((0,), ((("affine_s_major", 0, W, 0),
                      ("affine_k_pad", 0, W, 0)),)), W, R, cmax2
    )
    assert plan_colg is not None and plan_colg["g"][0] == "col"
    assert pb._tier_scratch(plan_colg, 8, cmax2)[0] == cmax2


def test_fused_block_tail_pad_frames(graph, pallas_on, monkeypatch):
    """Npad != Nf with non-trivial tails: N chosen so the last chunk is
    mostly pad frames, plus ragged lengths ending inside the pad region —
    parity vs the XLA path."""
    cf, P = graph
    monkeypatch.setattr(pb, "_BH", 8)
    B, N = 8, 5  # chunk_size=3 -> Nf=6, Npad=6, but chunk 4 -> Npad=8 != 6
    rng = np.random.default_rng(21)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([5, 4, 5, 2, 3, 5, 1, 4], dtype=jnp.int32)

    p1, z1 = inf.pdfposteriors(cf, lhs, lens, chunk_size=4)
    monkeypatch.setenv("MMTPU_NO_PALLAS", "1")
    p0, z0 = inf.pdfposteriors(cf, lhs, lens, chunk_size=4)
    z0, z1 = np.asarray(z0), np.asarray(z1)
    fin = np.isfinite(z0)
    assert (np.isfinite(z1) == fin).all()
    np.testing.assert_allclose(z1[fin], z0[fin], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)


def test_fused_block_forward_only(graph, pallas_on):
    cf, P = graph
    B, N = 8, 3
    rng = np.random.default_rng(9)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    z1 = inf.forward(cf, lhs, chunk_size=2)
    import os
    os.environ["MMTPU_NO_PALLAS"] = "1"
    try:
        z0 = inf.forward(cf, lhs, chunk_size=2)
    finally:
        del os.environ["MMTPU_NO_PALLAS"]
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-5)


def test_lfmmi_grad_jits_through_fused_block(graph, pallas_on):
    """jit(value_and_grad(lfmmi_loss)) with a block-strategy denominator:
    logmarginal's stop_gradient must leave integer fields (final_state,
    index arrays) CONCRETE so the fused path's static plan extraction
    works under tracing (round-4 regression: a blanket tree_map
    stop_gradient broke ``int(cf.final_state)`` in block_fused_fb)."""
    import jax
    import jax.numpy as jnp2

    from markovmodels_tpu.fsm import FSM
    from markovmodels_tpu.labels import Label
    from markovmodels_tpu.semiring import LOG

    cf, P = graph
    B, N = 2, 3
    rng = np.random.default_rng(5)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([3, 3], dtype=jnp.int32)

    num_cfs = []
    for b in range(B):
        seq = rng.integers(0, P, size=2)
        arcs = [((0, 0), np.log(0.5)), ((1, 1), np.log(0.5)),
                ((0, 1), np.log(0.5))]
        f = FSM.from_pairs(
            [(0, 0.0)], arcs, [(1, np.log(0.5))],
            [Label(int(s)) for s in seq], LOG,
        )
        num_cfs.append(
            inf.compile_fsm(f, np.append(seq, P).astype(np.int32), P,
                            strategy="dense")
        )
    num_cf = inf.stack(num_cfs)

    run = jax.jit(jax.value_and_grad(
        lambda l: inf.lfmmi_loss(num_cf, cf, l, lens).sum()
    ))
    loss, grad = run(lhs)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    # gradient identity: d loss / d lhs = gamma_den - gamma_num
    pd, _ = inf.pdfposteriors(cf, lhs, lens)
    pn, _ = inf.pdfposteriors(num_cf, lhs, lens)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(pd) - np.asarray(pn), atol=1e-5
    )


def test_fused_viterbi_sweep_matches_xla_bp(graph, raw_graph, pallas_on,
                                            monkeypatch):
    """Fused tropical Pallas sweep vs the XLA compressed-bp scan: equal
    scores, and each decoded path must be valid + optimal in exact f64
    (ties may break differently between the two sweeps)."""
    from markovmodels_tpu import viterbi as vit

    cf, P = graph
    B, N = 8, 4
    rng = np.random.default_rng(17)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([4, 3, 4, 2, 3, 4, 4, 3], dtype=jnp.int32)

    monkeypatch.setenv("MMTPU_VIT_PALLAS", "1")
    assert vit._vit_pallas_ok(cf, lhs)
    s1, z1 = vit.viterbi(cf, lhs, lens)  # fused pallas sweep
    monkeypatch.setenv("MMTPU_NO_PALLAS", "1")
    assert not vit._vit_pallas_ok(cf, lhs)
    s0, z0 = vit.viterbi(cf, lhs, lens)  # XLA bp sweep

    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-5)

    import scipy.sparse as sp

    from markovmodels_tpu import hostsparse as hs

    fsm, spdf = raw_graph[0], raw_graph[1]
    rows, cols, data = hs.findnz(fsm.T_hat)
    S1 = len(fsm.alpha_hat)
    T = sp.csr_matrix(
        (np.asarray(data, dtype=np.float64), (rows, cols)), shape=(S1, S1)
    )
    T.sort_indices()

    def arc_w(i, j):
        lo, hi = T.indptr[i], T.indptr[i + 1]
        k = lo + np.searchsorted(T.indices[lo:hi], j)
        return T.data[k] if k < hi and T.indices[k] == j else -np.inf

    a0 = np.asarray(fsm.alpha_hat, dtype=np.float64)
    lhs_np = np.asarray(lhs)
    for states, score in ((np.asarray(s1), np.asarray(z1)),
                          (np.asarray(s0), np.asarray(z0))):
        for b in range(B):
            L = int(lens[b])
            if not np.isfinite(score[b]):
                continue
            path = states[b, :L]
            w = a0[path[0]] + float(
                lhs_np[b, np.arange(L), spdf[path]].astype(np.float64).sum()
            )
            for t in range(L - 1):
                w += arc_w(path[t], path[t + 1])
            w += arc_w(path[L - 1], S1 - 1)
            np.testing.assert_allclose(w, float(score[b]), atol=1e-4)


def test_rescale_guard_survives_emission_cliffs(graph, pallas_on,
                                                monkeypatch):
    """Round-4 adversarial-review regression: with the strided rescale,
    two consecutive frames whose frame-max pdf lies on states unreachable
    for 2 frames (a 60-nat emission gap) underflowed the carried f32
    state to zero inside one 4-frame window -> logZ = -inf.  The
    per-frame max guard must fire and keep parity with the
    every-frame-rescaling XLA path."""
    cf, P = graph
    B, N = 2, 6
    K = 3
    lhs = np.zeros((B, N, P), dtype=np.float32)
    # pdfs of plane k=2 are unreachable until t=2 (left-to-right HMMs):
    # put a +60-nat spike there on frames 0 and 1
    k2 = np.arange(P).reshape(-1, K)[:, 2]
    lhs[:, 0, k2] = 60.0
    lhs[:, 1, k2] = 60.0
    lhs = jnp.asarray(lhs)
    lens = jnp.asarray([6, 5], dtype=jnp.int32)

    p1, z1 = inf.pdfposteriors(cf, lhs, lens, chunk_size=4)
    monkeypatch.setenv("MMTPU_NO_PALLAS", "1")
    p0, z0 = inf.pdfposteriors(cf, lhs, lens, chunk_size=4)

    assert np.isfinite(np.asarray(z0)).all()
    assert np.isfinite(np.asarray(z1)).all(), "fused path underflowed"
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-4)


def test_bf16_precision_mode(graph, raw_graph, pallas_on):
    """precision='bf16' (bf16-stored tier panels, f32 state): the fused
    path must accept it and agree with the 'high' mode within the
    documented bf16-dot tolerance (exact in interpret mode on CPU, ~1e-3
    on real MXU hardware — the hard gate at the 2M scale lives in
    bench.py)."""
    fsm, spdf, P, _ = raw_graph
    cf_hi, _ = graph
    cf16 = inf.compile_fsm(fsm, spdf, P, strategy="block",
                           precision="bf16")
    assert pb.block_scan_reject_reason(cf16, 8) is None
    rng = np.random.default_rng(3)
    B, N = 8, 4
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lens = jnp.asarray([4, 3, 4, 2, 3, 4, 4, 3], dtype=jnp.int32)
    p16, z16 = inf.pdfposteriors(cf16, lhs, lens)
    phi, zhi = inf.pdfposteriors(cf_hi, lhs, lens)
    np.testing.assert_allclose(np.asarray(z16), np.asarray(zhi), atol=5e-2)
    np.testing.assert_allclose(np.asarray(p16), np.asarray(phi), atol=2e-2)
