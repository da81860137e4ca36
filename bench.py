"""Headline benchmark: batched LF-MMI denominator forward-backward.

Workload mirrors the reference benchmark (reference misc/benchmark/
benchmark.jl + README.md): WSJ 3-gram phonotactic denominator graph
(~3,032 states / ~50k arcs, 84 pdfs), batch 128, 700 frames, f32, full
posteriors + log-marginals.  Baseline: 2.003 s on a GTX 1080 ⇒
1,342 audio-seconds/s at the pipeline's 30 ms frame shift (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
A numerical parity check against the exact host (float64 logaddexp) oracle
runs first and aborts the benchmark if it fails.
"""
import json
import os
import sys
import time

import numpy as np

WSJ_FST = "/root/reference/misc/benchmark/den_fsm_wsj.txt"
BASELINE_AUDIO_S_PER_S = 1342.0  # GTX 1080, 2.003 s for 128x700 @ 30 ms
FRAME_SHIFT_S = 0.03


def load_wsj_fst(path):
    """Parse the reference's OpenFST-style text graph
    (emitted by misc/benchmark/generatefsm.jl:42-57: 1-based states, weights
    stored negated, ilabel = 1-based pdf id of the destination state)."""
    alpha_pairs, arc_pairs, omega_pairs = [], [], []
    state_pdf = {}
    max_state = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 5:
                i, j, p = int(parts[0]), int(parts[1]), int(parts[2])
                w = -float(parts[4])
                max_state = max(max_state, i, j)
                state_pdf[j - 1] = p - 1
                if i == 0:
                    alpha_pairs.append((j - 1, w))
                else:
                    arc_pairs.append(((i - 1, j - 1), w))
            elif len(parts) == 2:
                i, w = int(parts[0]), -float(parts[1])
                max_state = max(max_state, i)
                omega_pairs.append((i - 1, w))
    S = max_state
    import markovmodels_tpu as mm
    from markovmodels_tpu.labels import Label

    labels = [Label(state_pdf.get(i, 0)) for i in range(S)]
    fsm = mm.FSM.from_pairs(alpha_pairs, arc_pairs, omega_pairs, labels, mm.LOG)
    spdf = np.array([state_pdf.get(i, 0) for i in range(S)] + [84], dtype=np.int32)
    return fsm, spdf, 84


def synthetic_ngram_graph(num_states=3000, num_pdfs=84, avg_out=16, seed=0):
    """Fallback workload of the same scale if the reference graph is absent."""
    import markovmodels_tpu as mm
    from markovmodels_tpu.labels import Label

    rng = np.random.default_rng(seed)
    S = num_states
    rows = np.repeat(np.arange(S), avg_out)
    cols = rng.integers(0, S, size=S * avg_out)
    w = np.log(rng.dirichlet(np.ones(avg_out), size=S)).ravel()
    alpha = [(0, 0.0)]
    omega = [(S - 1, np.log(0.5))]
    arcs = list(zip(zip(rows.tolist(), cols.tolist()), w.tolist()))
    pdfs = rng.integers(0, num_pdfs, size=S)
    labels = [Label(int(p)) for p in pdfs]
    fsm = mm.FSM.from_pairs(alpha, arcs, omega, labels, mm.LOG)
    spdf = np.append(pdfs, num_pdfs).astype(np.int32)
    return fsm, spdf, num_pdfs


def host_oracle_logZ(fsm, spdf, num_pdfs, lhs, lengths):
    """Exact float64 forward pass on the host sparse layer (independent of
    the device code path)."""
    from markovmodels_tpu import LOG, hostsparse as hs

    T_hat = fsm.T_hat
    logZ = []
    S1 = len(fsm.alpha_hat)
    for b in range(lhs.shape[0]):
        L = int(lengths[b])
        v = None
        for t in range(L + 1):
            e = np.full(S1, -np.inf)
            if t < L:
                e[: S1 - 1] = lhs[b, t][spdf[: S1 - 1]]
            else:
                e[S1 - 1] = 0.0
            v = fsm.alpha_hat + e if t == 0 else hs.spmv_t(T_hat, v, LOG) + e
        logZ.append(v[S1 - 1])
    return np.array(logZ)


def main():
    import jax
    import jax.numpy as jnp

    import markovmodels_tpu as mm
    from markovmodels_tpu import inference as inf

    B, N = 128, 700
    if os.path.exists(WSJ_FST):
        fsm, spdf, P = load_wsj_fst(WSJ_FST)
        src = "wsj"
    else:
        fsm, spdf, P = synthetic_ngram_graph()
        src = "synthetic"
    print(
        f"# graph={src} states={fsm.num_states} arcs={fsm.T_hat.nnz} pdfs={P}",
        file=sys.stderr,
    )

    # Headline config: precision='high' (3-pass-bf16 MXU matmuls) — log-
    # marginal error vs the exact f64 oracle is ~1e-6 RELATIVE (~1e-3 abs at
    # N=700 where |logZ| ~ 2e3; note f32 output granularity alone is ~1.2e-4
    # there, so absolute parity is representation-bound for any f32 engine).
    # Side modes printed below: 'f32' (tightest parity, ~1.6x slower) and
    # 'bf16' (single-pass, ~1.6x faster, ~7e-3 abs).
    cf = inf.compile_fsm(fsm, spdf, P, strategy="dense", precision="high")

    rng = np.random.default_rng(0)

    # --- parity gate: device f32 vs exact host f64 oracle -----------------
    lhs_small = rng.normal(size=(2, 50, P)).astype(np.float32)
    lens_small = np.array([50, 31], dtype=np.int32)
    ref = host_oracle_logZ(fsm, spdf, P, lhs_small.astype(np.float64), lens_small)
    got = np.asarray(
        inf.forward(cf, jnp.asarray(lhs_small), jnp.asarray(lens_small))
    )
    err = np.max(np.abs(got - ref))
    print(f"# parity |logZ - oracle| = {err:.3e}", file=sys.stderr)
    assert err < 1e-3, f"parity check failed: {err}"

    # --- timing -----------------------------------------------------------
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lengths = jnp.full((B,), N, dtype=jnp.int32)

    run = jax.jit(lambda l, n: inf.pdfposteriors(cf, l, n, chunk_size=64))
    posts, logZ = run(lhs, lengths)  # compile + warmup
    jax.block_until_ready((posts, logZ))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(lhs, lengths)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"# fwd-bwd wall times: {['%.4f' % x for x in times]} s", file=sys.stderr)

    audio_s = B * N * FRAME_SHIFT_S

    # side modes, reported for context
    for precision in ("f32", "bf16"):
        cfx = inf.compile_fsm(fsm, spdf, P, strategy="dense", precision=precision)
        runx = jax.jit(lambda l, n: inf.pdfposteriors(cfx, l, n))
        jax.block_until_ready(runx(lhs, lengths))
        tx = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(runx(lhs, lengths))
            tx.append(time.perf_counter() - t0)
        print(
            f"# fast mode precision={precision}: {min(tx):.4f} s "
            f"({audio_s / min(tx):.0f} audio-s/s)",
            file=sys.stderr,
        )

    value = audio_s / t
    print(
        json.dumps(
            {
                "metric": "audio-seconds/s/chip LF-MMI fwd-bwd (WSJ den graph, B=128, N=700, f32)",
                "value": round(value, 1),
                "unit": "audio-s/s",
                "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
