"""Fused Pallas forward-backward scan with a VMEM-resident graph operator.

The TPU-native replacement for the reference's hot CUDA SpMV loop
(reference src/linalg.jl:213-233 driven by src/inference.jl:62-110), taken
past what XLA can do on its own: under ``lax.scan`` XLA re-streams the dense
graph operator (Sp x Sp, e.g. 36 MB for the WSJ graph) from HBM on *every*
frame, so the recursion is HBM-bound at ~Sp^2*4 bytes/frame.  v5e VMEM is
large enough (>100 MB usable) to pin the operator on-chip once: these kernels
use a constant ``BlockSpec`` index map for the operator so Mosaic's pipeline
fetches it a single time, then iterate the grid over frames.  Per frame the
only HBM traffic left is the (P+1, B) emission column in and the (Sp, B)
alpha checkpoint out — a >20x reduction in bytes moved, turning the scan
compute-bound on the MXU.

Everything runs in the probability domain with per-frame max-rescaling and a
Kahan-compensated log-shift (same numerics as inference._fb_prob, which
remains the oracle/fallback path and the only path on CPU).

Kernel anatomy (forward):

  grid = (N+1,)                       one step per frame, sequential on TPU
  resident in VMEM: Wp (Sp, Sp)       prob-domain T̂ᵀ (or T̂ for backward)
                    OH_state (Sp, P1) one-hot state→pdf matrix
  streamed per frame: ext (P1, B)     exp-shifted extended emission column
                      mshift (1, B)   the log-shift factored out of ext
  carried in VMEM scratch: a (Sp, B)  rescaled state probabilities
                           shift/comp Kahan-compensated log-shift
  per frame: a' = rescale((Wp @ a) * (OH_state @ ext))   (two MXU matmuls)

The emission gather x[state_pdf] (reference ``expand`` semantics,
src/inference.jl:38-60) is expressed as the small one-hot matmul
``OH_state @ ext`` — a dense MXU op instead of a (slow) dynamic row gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_scan_supported",
    "prepare_emissions",
    "pad_emissions",
    "fused_forward",
    "fused_backward",
]

# keep resident weights + scratch well under the ~128 MB v5e VMEM
_VMEM_BUDGET = 100 * 1024 * 1024
# Mosaic supports only DEFAULT (single-pass bf16) and HIGHEST (6-pass f32)
# dot precision; 'high' (3-pass) falls back to HIGHEST inside kernels.
_PRECISIONS = {
    "bf16": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "f32": jax.lax.Precision.HIGHEST,
}


def pallas_scan_supported(Sp: int, B: int, P1: int, itemsize: int = 4) -> bool:
    """True when the fused scan's VMEM working set fits on-chip."""
    weights = Sp * Sp * itemsize
    onehot = Sp * P1 * 4 + P1 * Sp * 4
    # double-buffered streamed blocks + alpha/posts blocks + scratch
    stream = 2 * (P1 * B + B + Sp * B + P1 * B) * 4
    scratch = 4 * Sp * B * 4
    return weights + onehot + stream + scratch <= _VMEM_BUDGET


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mm(a, b, prec):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=_PRECISIONS[prec], preferred_element_type=jnp.float32,
    )


def prepare_emissions(lhs, lengths, num_pdfs: int):
    """Precompute the streamed per-frame emission inputs.

    ``lhs``: (B, N, P) log-likelihoods; ``lengths``: (B,) int32.
    Returns (ext (Nf, P1, B), mshift (Nf, B)) with Nf = N + 1:
    ext[t, p, b] = exp(lhs[b, t, p] - max_p lhs[b, t, :]) while t < len_b,
    ext[t, P, b] = 1 past the end (the reference's phony-pdf row,
    src/inference.jl:54-60), zero elsewhere; mshift carries the factored-out
    per-frame max so logZ stays exact.
    """
    B, N, P = lhs.shape
    assert P == num_pdfs
    Nf = N + 1
    m_l = jnp.max(lhs, axis=2)  # (B, N)
    el = jnp.exp(lhs - m_l[:, :, None])  # (B, N, P)
    el = jnp.moveaxis(el, 0, 2)  # (N, P, B)
    el = jnp.pad(el, ((0, 1), (0, 1), (0, 0)))  # (Nf, P1, B)
    t = jnp.arange(Nf, dtype=jnp.int32)
    active = t[:, None] < lengths[None, :]  # (Nf, B)
    ext = jnp.where(active[:, None, :], el, 0.0)
    ext = ext.at[:, P, :].set(jnp.where(active, 0.0, 1.0))
    mshift = jnp.where(
        active, jnp.pad(jnp.moveaxis(m_l, 0, 1), ((0, 1), (0, 0))), 0.0
    )
    # (Nf, 1, B): TPU block shapes need the trailing two dims to cover the
    # array, so the per-frame shift is streamed as a (1, 1, B) block
    return ext.astype(jnp.float32), mshift.astype(jnp.float32)[:, None, :]


def pad_emissions(ext, mshift, n_total: int):
    """Extend prepare_emissions outputs to ``n_total`` frames with
    phony-absorb pad frames (emission 1 on the phony pdf row, 0 elsewhere,
    zero shift) — the same semantics every frame past a sequence's length
    already has, so chunked kernels can assume a frame count that is a
    multiple of the chunk size."""
    Nf, P1, B = ext.shape
    pad = n_total - Nf
    if pad <= 0:
        return ext, mshift
    extp = jnp.zeros((pad, P1, B), ext.dtype).at[:, P1 - 1, :].set(1.0)
    mshp = jnp.zeros((pad, 1, B), mshift.dtype)
    return (
        jnp.concatenate([ext, extp], axis=0),
        jnp.concatenate([mshift, mshp], axis=0),
    )


def _make_fwd_kernel(prec: str):
    def kernel(wp_ref, oh_ref, ext_ref, msh_ref, a0_ref,
               alphas_ref, afin_ref, shift_ref, ksum_ref,
               a_scr, sh_scr, co_scr, k_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            a_scr[:] = a0_ref[:]
            sh_scr[:] = jnp.zeros_like(sh_scr)
            co_scr[:] = jnp.zeros_like(co_scr)
            k_scr[:] = jnp.zeros_like(k_scr)

        a = a_scr[:]
        p = _mm(wp_ref[:], a, prec)
        p = jnp.where(i == 0, a, p)
        e = _mm(oh_ref[:], ext_ref[0], "f32")
        y = p * e
        m = jnp.max(y, axis=0, keepdims=True)  # (1, B)
        # exact power-of-two rescale (inference._fb_prob): the division is
        # round-off free and k accumulates exactly as an f32 integer; only
        # the emission max goes through the Kahan-compensated real shift
        k = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
        y = y * jnp.exp2(-k)
        kt = k_scr[:] + k
        k_scr[:] = kt
        x = msh_ref[0]
        s = sh_scr[:]
        c = co_scr[:]
        xc = x - c
        t = s + xc
        sh_scr[:] = t
        co_scr[:] = (t - s) - xc
        a_scr[:] = y
        alphas_ref[0] = y

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            afin_ref[:] = y
            shift_ref[:] = t
            ksum_ref[:] = kt

    return kernel


def _make_bwd_kernel(prec: str):
    def kernel(wp_ref, ohp_ref, oh_ref, ext_ref, alphas_ref,
               posts_ref, b_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            b_scr[:] = jnp.ones_like(b_scr)

        bb = b_scr[:]
        y = _mm(wp_ref[:], bb, prec)
        y = jnp.where(i == 0, bb, y)
        m = jnp.max(y, axis=0, keepdims=True)
        y = y / jnp.where(m > 0, m, 1.0)
        gamma = alphas_ref[0] * y  # (Sp, B), arbitrary per-frame scale
        s = _mm(ohp_ref[:], gamma, "f32")
        tot = jnp.sum(gamma, axis=0, keepdims=True)
        posts_ref[0] = s / jnp.where(tot > 0, tot, 1.0)
        e = _mm(oh_ref[:], ext_ref[0], "f32")
        b_scr[:] = y * e

    return kernel


@functools.partial(
    jax.jit, static_argnames=("save_alphas", "precision")
)
def fused_forward(wp, oh_state, ext, mshift, a0, *, save_alphas=True,
                  precision="high"):
    """Forward scan with VMEM-resident operator.

    ``wp``: (Sp, Sp) prob-domain forward operator (wp[j, i] = exp T̂[i, j]);
    ``oh_state``: (Sp, P1) one-hot state→pdf; ``ext``/``mshift``: from
    :func:`prepare_emissions`; ``a0``: (Sp, B) initial probabilities.
    Returns (alphas (Nf or 1, Sp, B), a_final (Sp, B), shift (B,),
    ksum (B,)): logZ = log a_final[fin] + ksum·ln2 + shift (combine with
    inference._combine_shift for the exact Cody-Waite split).
    When ``save_alphas`` is False, per-frame alphas are written to a 1-frame
    ring (forward-only logZ path, no HBM checkpoint traffic).
    """
    Nf, P1, B = ext.shape
    Sp = wp.shape[0]
    const = lambda i: (0, 0)
    n_alpha = Nf if save_alphas else 1
    alpha_map = (lambda i: (i, 0, 0)) if save_alphas else (lambda i: (0, 0, 0))
    alphas, afin, shift, ksum = pl.pallas_call(
        _make_fwd_kernel(precision),
        grid=(Nf,),
        in_specs=[
            pl.BlockSpec((Sp, Sp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, P1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, B), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Sp, B), alpha_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, B), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_alpha, Sp, B), jnp.float32),
            jax.ShapeDtypeStruct((Sp, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Sp, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 24 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(wp, oh_state, ext, mshift, a0)
    return alphas, afin, shift[0], ksum[0]


@functools.partial(jax.jit, static_argnames=("precision",))
def fused_backward(wp_bwd, oh_pdf, oh_state, ext, alphas, *, precision="high"):
    """Backward scan + fused posterior reduction.

    ``wp_bwd``: (Sp, Sp) prob-domain backward operator; ``oh_pdf``: (P1, Sp)
    one-hot Ĉᵀ; ``alphas``: (Nf, Sp, B) from :func:`fused_forward`.
    Returns posts (Nf, P1, B) normalized per frame (reference
    src/inference.jl:155-156).  Iterates frames in reverse via index maps.
    """
    Nf, P1, B = ext.shape
    Sp = wp_bwd.shape[0]
    const = lambda i: (0, 0)
    rev = lambda i: (Nf - 1 - i, 0, 0)
    return pl.pallas_call(
        _make_bwd_kernel(precision),
        grid=(Nf,),
        in_specs=[
            pl.BlockSpec((Sp, Sp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((P1, Sp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, P1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P1, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, B), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P1, B), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nf, P1, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Sp, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 24 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(wp_bwd, oh_pdf, oh_state, ext, alphas)
