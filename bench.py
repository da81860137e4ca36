"""Headline benchmark: batched LF-MMI denominator forward-backward.

Two workloads:

1. (headline JSON) the BASELINE-target scale: a 2M-arc trigram-LM ∘ HMM
   denominator graph (≈49k states, 384 pdfs), batch 128 × 700 frames —
   blocked gather-matmul-scatter strategy.
2. (stderr) the reference's own benchmark: WSJ 3-gram phonotactic graph
   (~3,032 states / ~52k arcs, 84 pdfs, reference misc/benchmark/README.md),
   batch 128 × 700 frames, dense MXU strategy.  Reference baseline: 2.003 s
   on a GTX 1080 ⇒ 1,342 audio-seconds/s at the pipeline's 30 ms frame shift
   (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline; a numerical parity gate against an exact float64 host oracle runs
first for each workload and aborts on failure.
"""
import json
import os
import sys
import time

import numpy as np

WSJ_FST = "/root/reference/misc/benchmark/den_fsm_wsj.txt"
BASELINE_AUDIO_S_PER_S = 1342.0  # GTX 1080, 2.003 s for 128x700 @ 30 ms
# BASELINE.md north star: >=10k audio-s/s per v5e *host* (8 chips) on the
# 2M-arc graph -> 1250 per chip is 1.0x.
NORTH_STAR_PER_CHIP = 1250.0
FRAME_SHIFT_S = 0.03


def load_wsj_fst(path):
    """Parse the reference's OpenFST-style text graph via the shared loader
    (C++ parser when available; conventions documented at
    serialization.load_openfst_lfmmi)."""
    from markovmodels_tpu.serialization import load_openfst_lfmmi

    return load_openfst_lfmmi(path, num_pdfs=84)


def host_oracle_logZ(fsm, spdf, num_pdfs, lhs, lengths):
    """Exact float64 forward pass (scipy sparse, prob domain with per-frame
    rescaling) — independent of the device code path."""
    import scipy.sparse as sp
    from markovmodels_tpu import hostsparse as hs

    rows, cols, data = hs.findnz(fsm.T_hat)
    S1 = len(fsm.alpha_hat)
    Tt = sp.csr_matrix(
        (np.exp(np.asarray(data, dtype=np.float64)), (cols, rows)), shape=(S1, S1)
    )
    a0 = np.exp(np.asarray(fsm.alpha_hat, dtype=np.float64))
    logZ = []
    for b in range(lhs.shape[0]):
        L = int(lengths[b])
        v, shift = a0.copy(), 0.0
        for t in range(L + 1):
            e = np.zeros(S1)
            if t < L:
                e[: S1 - 1] = np.exp(lhs[b, t])[spdf[: S1 - 1]]
            else:
                e[S1 - 1] = 1.0
            v = (v if t == 0 else Tt @ v) * e
            m = v.max()
            if m > 0:
                v /= m
                shift += np.log(m)
        val = v[S1 - 1]
        logZ.append(np.log(val) + shift if val > 0 else -np.inf)
    return np.array(logZ)


def _time_posteriors(inf, jax, cf, lhs, lengths, reps=3):
    run = jax.jit(lambda l, n: inf.pdfposteriors(cf, l, n))
    jax.block_until_ready(run(lhs, lengths))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(lhs, lengths))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _parity(inf, jax, jnp, fsm, spdf, P, cf, n=40, tol=2e-3):
    rng = np.random.default_rng(7)
    lhs = rng.normal(size=(2, n, P)).astype(np.float32)
    lens = np.array([n, max(2, 2 * n // 3)], dtype=np.int32)
    ref = host_oracle_logZ(fsm, spdf, P, lhs.astype(np.float64), lens)
    got = np.asarray(inf.forward(cf, jnp.asarray(lhs), jnp.asarray(lens)))
    err = float(np.max(np.abs(got - ref)))
    assert err < tol, f"parity check failed: {err}"
    return err


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent jit cache: warm driver reruns skip XLA compilation
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/markovmodels_tpu/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import markovmodels_tpu as mm
    from markovmodels_tpu import inference as inf
    from markovmodels_tpu.workloads import make_lm_hmm_graph

    B, N = 128, 700
    rng = np.random.default_rng(0)
    audio_s = B * N * FRAME_SHIFT_S

    # ---- workload 1 (headline): 2M-arc trigram-LM ∘ HMM graph -----------
    fsm, spdf, P, info = make_lm_hmm_graph(V=128)
    print(f"# 2m graph: {info}", file=sys.stderr)
    cf = inf.compile_fsm(fsm, spdf, P, strategy="block", precision="high")
    err = _parity(inf, jax, jnp, fsm, spdf, P, cf)
    print(f"# 2m parity |logZ - f64 oracle| = {err:.3e}", file=sys.stderr)
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
    lengths = jnp.full((B,), N, dtype=jnp.int32)
    t_2m = _time_posteriors(inf, jax, cf, lhs, lengths)
    v_2m = audio_s / t_2m
    print(f"# 2m fwd-bwd: {t_2m:.4f} s -> {v_2m:.0f} audio-s/s", file=sys.stderr)
    del cf, lhs

    # Headline JSON first: the WSJ comparison below is informational and must
    # not cost the driver the headline if its harness timeout is tight
    # (cold compile of both workloads is minutes on a fresh TPU cache).
    print(
        json.dumps(
            {
                "metric": "audio-seconds/s/chip LF-MMI fwd-bwd (2M-arc den "
                          "graph, B=128, N=700, f32); log-marginal f64-oracle "
                          "parity gated",
                "value": round(v_2m, 1),
                "unit": "audio-s/s",
                "vs_baseline": round(v_2m / NORTH_STAR_PER_CHIP, 2),
            }
        ),
        flush=True,
    )

    # ---- workload 2: reference WSJ benchmark ----------------------------
    v_wsj = None
    if os.path.exists(WSJ_FST):
        fsm, spdf, P = load_wsj_fst(WSJ_FST)
        cf = inf.compile_fsm(fsm, spdf, P, strategy="dense", precision="high")
        err = _parity(inf, jax, jnp, fsm, spdf, P, cf)
        print(f"# wsj parity |logZ - f64 oracle| = {err:.3e}", file=sys.stderr)
        lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32) * 0.5)
        t_wsj = _time_posteriors(inf, jax, cf, lhs, lengths)
        v_wsj = audio_s / t_wsj
        print(
            f"# wsj fwd-bwd: {t_wsj:.4f} s -> {v_wsj:.0f} audio-s/s "
            f"(reference GPU: 2.003 s -> 1342; speedup {2.003 / t_wsj:.1f}x)",
            file=sys.stderr,
        )

if __name__ == "__main__":
    main()
