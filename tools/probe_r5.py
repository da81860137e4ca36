"""Round-5 TPU probe harness — import into a persistent REPL (one TPU
claim), then call the probe functions; each prints one measured line.

Usage (tmux python session):
    import tools.probe_r5 as pr
    pr.setup()            # builds workloads once (host side)
    pr.p_backoff_sep()    # canonicalized separate-layout fused perf
    pr.p_headline()       # 2M dense-trigram regression check
    pr.p_e2e()            # banded-numerator e2e LF-MMI step
    pr.p_vit()            # viterbi: variadic vs packed vs pure-max sweep
    pr.p_bf16()           # bf16 precision mode: parity + speed
    pr.p_f64()            # on-TPU f64 compile: parity + speed
    pr.p_assoc()          # assoc_forward win-regime vs sequential scan
"""
import os
import time

import numpy as np

_S = {}


def _t(fn, *a, reps=3):
    import jax

    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def setup(B=128, N=700):
    import jax
    import jax.numpy as jnp

    from markovmodels_tpu import inference as inf
    from markovmodels_tpu.workloads import (
        make_backoff_lm_hmm_graph,
        make_lm_hmm_graph,
    )

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    _S["B"], _S["N"] = B, N
    _S["audio"] = B * N * 0.03
    _S["lengths"] = jnp.full((B,), N, dtype=jnp.int32)

    fsm, spdf, P, info = make_lm_hmm_graph(V=128)
    _S["den"] = (fsm, spdf, P)
    _S["cf"] = inf.compile_fsm(fsm, spdf, P, strategy="block")
    _S["lhs"] = jnp.asarray(
        rng.normal(size=(B, N, P)).astype(np.float32) * 0.5
    )

    fs, ss, Ps, infos = make_backoff_lm_hmm_graph(
        V=128, keep=0.1, layout="separate"
    )
    _S["sep"] = (fs, ss, Ps)
    _S["cf_sep"] = inf.compile_fsm(fs, ss, Ps, strategy="block")
    fe, se, Pe, infoe = make_backoff_lm_hmm_graph(V=128, keep=0.1)
    _S["emb"] = (fe, se, Pe)
    _S["cf_emb"] = inf.compile_fsm(fe, se, Pe, strategy="block")
    print("setup done; sep ov_layout:", _S["cf_sep"].ov_layout)


def p_headline():
    import jax

    from markovmodels_tpu import inference as inf

    cf, lhs, lens = _S["cf"], _S["lhs"], _S["lengths"]
    run = jax.jit(lambda l, n: inf.pdfposteriors(cf, l, n))
    t = _t(run, lhs, lens)
    print(f"headline 2m fwd-bwd: {t:.4f} s -> {_S['audio']/t:.0f} audio-s/s")
    runf = jax.jit(lambda l, n: inf.forward(cf, l, n))
    tf = _t(runf, lhs, lens)
    print(f"  fwd-only: {tf:.4f} s ({tf/(_S['N']+1)*1e6:.0f} us/frame)")
    return t


def p_backoff_sep():
    import jax

    from markovmodels_tpu import inference as inf

    lhs, lens = _S["lhs"], _S["lengths"]
    for nm in ("cf_emb", "cf_sep"):
        cf = _S[nm]
        print(nm, inf.fast_path_report(cf, _S["B"]))
        run = jax.jit(lambda l, n, c=cf: inf.pdfposteriors(c, l, n))
        t = _t(run, lhs, lens)
        print(f"  {nm}: {t:.4f} s -> {_S['audio']/t:.0f} audio-s/s")


def p_e2e():
    import jax
    import jax.numpy as jnp

    import markovmodels_tpu as mm
    from markovmodels_tpu import inference as inf
    from markovmodels_tpu.fsm import FSM
    from markovmodels_tpu.labels import Label

    B = _S["B"]
    _, _, P = _S["den"]
    rng_n = np.random.default_rng(3)
    for strat in ("banded", "dense"):
        num_cfs = []
        for b in range(B):
            Lp = 78
            seq = rng_n.integers(0, P, size=Lp)
            arcs = [((i, i), np.log(0.5)) for i in range(Lp)] + [
                ((i, i + 1), np.log(0.5)) for i in range(Lp - 1)
            ]
            f = FSM.from_pairs(
                [(0, 0.0)], arcs, [(Lp - 1, np.log(0.5))],
                [Label(int(s)) for s in seq], mm.LOG,
            )
            num_cfs.append(
                inf.compile_fsm(f, np.append(seq, P).astype(np.int32), P,
                                strategy=strat)
            )
        num_cf = inf.stack(num_cfs)
        cf = _S["cf"]
        lens = _S["lengths"]

        def step(lhs_):
            return inf.lfmmi_loss(num_cf, cf, lhs_, lens).sum()

        rune = jax.jit(jax.value_and_grad(step))
        t = _t(lambda l: rune(l)[1], _S["lhs"])
        print(f"e2e ({strat} numerators): {t:.4f} s -> "
              f"{_S['audio']/t:.0f} audio-s/s")
        # numerator-only pass
        runn = jax.jit(jax.value_and_grad(
            lambda l: inf.logmarginal(num_cf, l, lens).sum()))
        tn = _t(lambda l: runn(l)[1], _S["lhs"])
        print(f"  numerator-only fwd-bwd+grad: {tn:.4f} s")


def p_vit():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from markovmodels_tpu import viterbi as vit
    from markovmodels_tpu.ops.blocked import block_matvec

    cf, lhs, lens = _S["cf"], _S["lhs"], _S["lengths"]
    run = jax.jit(lambda l, n: vit.viterbi(cf, l, n))
    t0 = _t(run, lhs, lens)
    print(f"viterbi variadic: {t0:.4f} s -> {_S['audio']/t0:.0f} audio-s/s")

    os.environ["MMTPU_VIT_PACKED"] = "1"
    try:
        run2 = jax.jit(lambda l, n: vit.viterbi(cf, l, n))
        t1 = _t(run2, lhs, lens)
        print(f"viterbi packed:   {t1:.4f} s -> "
              f"{_S['audio']/t1:.0f} audio-s/s")
        s0 = np.asarray(run(lhs, lens)[1])
        s1 = np.asarray(run2(lhs, lens)[1])
        print(f"  score agreement |d| = {np.max(np.abs(s0 - s1)):.2e}")
    finally:
        del os.environ["MMTPU_VIT_PACKED"]

    # pure max-product sweep (no argmax at all): the recompute-design bound
    Sp = cf.padded_states
    B = _S["B"]

    def sweep(x):
        def stp(a, _):
            y = block_matvec(cf.block_fwd, cf.block_fwd_offsets, a, None,
                             op_kind="max")
            m = jnp.max(y, axis=0)
            return y * jnp.exp2(-jnp.floor(jnp.log2(jnp.maximum(m, 1e-30))))[None, :], None

        out, _ = lax.scan(stp, x, None, length=_S["N"])
        return out

    x0 = jnp.ones((Sp, B), jnp.float32) / Sp
    tm = _t(jax.jit(sweep), x0)
    print(f"pure max-product sweep ({_S['N']} frames): {tm:.4f} s")


def p_bf16():
    import jax
    import jax.numpy as jnp

    from markovmodels_tpu import inference as inf

    fsm, spdf, P = _S["den"]
    cf16 = inf.compile_fsm(fsm, spdf, P, strategy="block", precision="bf16")
    run = jax.jit(lambda l, n: inf.pdfposteriors(cf16, l, n))
    t = _t(run, _S["lhs"], _S["lengths"])
    print(f"bf16 2m fwd-bwd: {t:.4f} s -> {_S['audio']/t:.0f} audio-s/s")
    # error vs the f32-HIGHEST path on the same inputs (small batch)
    p0, z0 = inf.pdfposteriors(_S["cf"], _S["lhs"][:4], _S["lengths"][:4])
    p1, z1 = run(_S["lhs"], _S["lengths"])
    dz = float(np.max(np.abs(np.asarray(z1[:4]) - np.asarray(z0))))
    dp = float(np.max(np.abs(np.asarray(p1[:4]) - np.asarray(p0))))
    print(f"  vs f32-HIGHEST: |dlogZ| = {dz:.2e}, |dposts| = {dp:.2e}")


def p_f64(B64=128):
    import jax
    import jax.numpy as jnp

    from markovmodels_tpu import inference as inf

    fsm, spdf, P = _S["den"]
    jax.config.update("jax_enable_x64", True)
    try:
        cf64 = inf.compile_fsm(fsm, spdf, P, strategy="block",
                               dtype=jnp.float64)
        lhs = jnp.asarray(np.asarray(_S["lhs"][:B64], dtype=np.float64))
        lens = jnp.asarray(np.asarray(_S["lengths"][:B64]))
        runf = jax.jit(lambda l, n: inf.forward(cf64, l, n))
        t = _t(runf, lhs, lens, reps=1)
        print(f"f64 on-TPU forward (B={B64}): {t:.4f} s -> "
              f"{_S['audio'] * B64 / _S['B'] / t:.0f} audio-s/s")
        runp = jax.jit(lambda l, n: inf.pdfposteriors(cf64, l, n))
        tp = _t(runp, lhs, lens, reps=1)
        print(f"f64 on-TPU fwd-bwd (B={B64}): {tp:.4f} s")
        return cf64
    finally:
        jax.config.update("jax_enable_x64", False)


def p_f64_parity(n=700):
    """f64 on-TPU parity vs the exact host oracle at N=n, B=2."""
    import importlib.util

    import jax
    import jax.numpy as jnp

    from markovmodels_tpu import inference as inf

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    fsm, spdf, P = _S["den"]
    rng = np.random.default_rng(7)
    lhs = rng.normal(size=(2, n, P))
    lens = np.array([n, max(2, 2 * n // 3)], dtype=np.int32)
    ref = bench.host_oracle_logZ(fsm, spdf, P, lhs, lens)
    jax.config.update("jax_enable_x64", True)
    try:
        cf64 = inf.compile_fsm(fsm, spdf, P, strategy="block",
                               dtype=jnp.float64)
        got = inf.forward(cf64, jnp.asarray(lhs), jnp.asarray(lens))
        err = float(np.max(np.abs(np.asarray(got) - ref)))
        print(f"f64 on-TPU |dlogZ| (N={n}): {err:.3e}")
    finally:
        jax.config.update("jax_enable_x64", False)


def p_assoc(S=256, N=8192, B=2, chunks=(8, 16, 32)):
    import jax
    import jax.numpy as jnp

    from markovmodels_tpu import inference as inf
    from markovmodels_tpu.ops.assoc_scan import assoc_forward
    from tests.test_inference import make_hmm

    rng = np.random.default_rng(4)
    P = 64
    fsm, spdf, _ = make_hmm(rng, S, P, lr=False)
    cf = inf.compile_fsm(fsm, spdf, P, strategy="dense")
    lhs = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32))
    lens = jnp.full((B,), N, dtype=jnp.int32)
    runs = jax.jit(lambda l, n: inf.forward(cf, l, n))
    ts = _t(runs, lhs, lens)
    print(f"assoc regime S={S} N={N} B={B}: sequential forward {ts:.4f} s")
    for c in chunks:
        runa = jax.jit(lambda l, n, c=c: assoc_forward(cf, l, n, chunk=c))
        ta = _t(runa, lhs, lens)
        z0 = np.asarray(runs(lhs, lens))
        z1 = np.asarray(runa(lhs, lens))
        print(f"  assoc chunk={c}: {ta:.4f} s (|dz| = "
              f"{np.max(np.abs(z0 - z1)):.2e})")
