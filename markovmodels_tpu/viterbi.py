"""Viterbi decoding — tropical-semiring recursion with backtrace.

The reference disabled its Viterbi exports in v0.10
(``maxstateposteriors``/``bestpath`` commented out, reference
src/MarkovModels.jl:56-57; historical tests test/test_algorithms.jl:262-284);
here it is first-class: the same scan skeleton as inference.py run in the
tropical (max-plus) semiring, recording int32 backpointers per frame, then a
reverse scan gathers the best state sequence.  Runs on the segment or ELL
edge arrays (always present in a CompiledFSM regardless of strategy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .inference import CompiledFSM, _make_elhs, _colmax_safe
from .ops import semiring_ops as sops

__all__ = ["viterbi", "best_path", "maxstateposteriors"]

NEG_INF = -jnp.inf


def _trop_matvec(cf: CompiledFSM, direction: str):
    Sp = cf.padded_states
    if cf.ell_fwd_src is not None:
        s = cf.ell_fwd_src if direction == "fwd" else cf.ell_bwd_src
        w = cf.ell_fwd_w if direction == "fwd" else cf.ell_bwd_w
        return lambda x: sops.ell_matvec(s, w, x, op="max")
    if direction == "fwd":
        s, d, w = cf.fwd_src, cf.fwd_dst, cf.fwd_w
    else:
        s, d, w = cf.bwd_src, cf.bwd_dst, cf.bwd_w
    return lambda x: sops.segment_matvec(s, d, w, x, Sp, op="max")


def _viterbi_single(cf: CompiledFSM, lhs, lengths):
    """lhs: (B, N, P).  Returns (states (B, N) int32, score (B,))."""
    B, N, P = lhs.shape
    Sp = cf.padded_states
    Nf = N + 1
    lhs_tm = jnp.moveaxis(lhs, 1, 0)
    lhs_tm = jnp.pad(lhs_tm, ((0, Nf - N), (0, 0), (0, 0)))
    ts = jnp.arange(Nf, dtype=jnp.int32)

    mv = _trop_matvec(cf, "fwd")
    elhs = _make_elhs(cf, lengths)
    x0 = jnp.broadcast_to(cf.alpha_hat[:, None], (Sp, B))

    def fstep(carry, inp):
        x, shift = carry
        lhs_t, t = inp
        y_mv, bp = mv(x)
        y = jnp.where(t == 0, x, y_mv)
        bp = jnp.where(t == 0, jnp.broadcast_to(jnp.arange(Sp)[:, None], bp.shape), bp)
        y = y + elhs(lhs_t, t)
        m = _colmax_safe(y)
        y = y - m[None, :]
        return (y, shift + m), bp  # bp: (Sp, B) int32

    (xF, shiftF), bps = lax.scan(fstep, (x0, jnp.zeros(B, lhs.dtype)), (lhs_tm, ts))
    score = jnp.take(xF, cf.final_state, axis=0) + shiftF  # (B,)

    # backtrace: state at frame Nf-1 is the phony final state; walk bps back.
    bcol = jnp.arange(B)

    def btrace(state, bp_t):
        prev = bp_t[state, bcol]
        return prev, prev

    s_last = jnp.broadcast_to(cf.final_state, (B,)).astype(jnp.int32)
    _, states = lax.scan(btrace, s_last, bps[1:], reverse=True)
    # states[t] = argmax state at frame t for t = 0..Nf-2; frame Nf-1 is phony.
    states = jnp.moveaxis(states, 1, 0)  # (B, Nf-1) == (B, N)
    if cf.orig_state is not None:
        # report host state ids when the graph was compiled with a
        # reordered internal layout (inference.compile_fsm reorder='pdf')
        states = jnp.take(cf.orig_state, states, axis=0)
    return states, score


def viterbi(cf: CompiledFSM, lhs, lengths=None):
    """Best-path decode.  Returns (state sequence (B, N) int32, score (B,)).

    For frames past each utterance's length the recursion sits on the phony
    final state, so returned entries there equal the phony state id; mask
    with ``lengths`` when consuming.
    """
    lhs = jnp.asarray(lhs)
    if lengths is None:
        lengths = jnp.full((lhs.shape[0],), lhs.shape[-2])
    lengths = jnp.minimum(jnp.asarray(lengths, dtype=jnp.int32), lhs.shape[-2])
    if cf.batched:
        def one(cf_b, lhs_b, len_b):
            return _viterbi_single(cf_b, lhs_b[None], len_b[None])

        states, score = jax.vmap(one)(cf, lhs, lengths)
        return states[:, 0], score[:, 0]
    return _viterbi_single(cf, lhs, lengths)


best_path = viterbi


def maxstateposteriors(cf: CompiledFSM, lhs, lengths=None):
    """Per-state max-posterior scores (tropical α⊙β), (B, N, S) log-domain,
    normalized by the Viterbi score (best path states score 0).

    Mirrors the reference's historical ``maxstateposteriors``
    (test/test_algorithms.jl:262-284).  Materializes (B, N, S); intended for
    moderate graphs."""
    lhs = jnp.asarray(lhs)
    if lengths is None:
        lengths = jnp.full((lhs.shape[0],), lhs.shape[-2])
    lengths = jnp.minimum(jnp.asarray(lengths, dtype=jnp.int32), lhs.shape[-2])

    def single(cf, lhs, lengths):
        B, N, P = lhs.shape
        Sp = cf.padded_states
        Nf = N + 1
        lhs_tm = jnp.pad(jnp.moveaxis(lhs, 1, 0), ((0, Nf - N), (0, 0), (0, 0)))
        ts = jnp.arange(Nf, dtype=jnp.int32)
        fmv = _trop_matvec(cf, "fwd")
        bmv = _trop_matvec(cf, "bwd")
        elhs = _make_elhs(cf, lengths)
        x0 = jnp.broadcast_to(cf.alpha_hat[:, None], (Sp, B))

        def fstep(carry, inp):
            x, shift = carry
            lhs_t, t = inp
            y, _ = fmv(x)
            y = jnp.where(t == 0, x, y)
            y = y + elhs(lhs_t, t)
            m = _colmax_safe(y)
            y = y - m[None, :]
            return (y, shift + m), (y, shift + m)

        (xF, shiftF), (A, ashift) = lax.scan(
            fstep, (x0, jnp.zeros(B, lhs.dtype)), (lhs_tm, ts)
        )
        score = jnp.take(xF, cf.final_state, axis=0) + shiftF

        def bstep(carry, inp):
            bb = carry
            a_t, as_t, lhs_t, t = inp
            y, _ = bmv(bb)
            y = jnp.where(t == Nf - 1, jnp.zeros_like(bb), y)
            gamma = a_t + as_t[None, :] + y - score[None, :]
            bb_new = y + elhs(lhs_t, t)
            return bb_new, gamma

        _, gammas = lax.scan(
            bstep,
            jnp.zeros((Sp, B), lhs.dtype),
            (A, ashift, lhs_tm, ts),
            reverse=True,
        )
        return jnp.moveaxis(gammas, 2, 0)[:, :N, :], score  # (B, N, Sp)

    if cf.batched:
        g, s = jax.vmap(lambda c, l, n: single(c, l[None], n[None]))(cf, lhs, lengths)
        return g[:, 0], s[:, 0]
    return single(cf, lhs, lengths)
