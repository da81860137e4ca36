"""Fused Pallas forward-backward for STACKED banded graphs.

The e2e LF-MMI step scores 128 per-utterance numerator lattices (2-band
self+chain matrices, reference LinearFSM examples/prepare-lfmmi-graphs.jl:
25-65) besides the shared denominator.  Their math is trivial — a few
(Sp, G) elementwise ops per frame — but under ``lax.scan`` the pass costs
~150 µs/frame of pure per-iteration dispatch overhead (measured 0.10 s
forward / 0.19 s fwd-bwd for 128×80 states at N=700, both for the vmapped
and the lane-stacked XLA formulations; scan unrolling does not help).

This kernel runs the whole scan as ONE Pallas grid with the graph axis on
the vector lanes: state (Sp, G) resident in VMEM, per-graph parameters
(bands, ω, α, final-state mask) resident too, per-frame emissions and the
α/γ checkpoint streams in HBM (~29 MB each at the benchmark shape).  Grid
overhead is ~0.1 µs/step (measured round 4), so the pass drops to the HBM
streaming floor.

Per-graph state→pdf gathers and the pdf posterior reduction stay OUTSIDE
the kernel (Mosaic has no per-lane dynamic gather): emissions are
pre-gathered to an (Nf, Sp, G) stream, and the backward emits raw per-frame
γ (arbitrary per-frame scale) that one batched one-hot matmul + normalize
turns into posteriors — all vectorized over frames.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_scan_supported", "banded_fused_fb"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def banded_scan_supported(cf, B: int, n_frames=None):
    """None when the fused stacked-banded scan accepts, else the first
    rejected predicate.  ``n_frames``: sequence length when known — the
    fused path materializes full (Nf, Sp, G) alpha/gamma/emission streams
    (no chunk-checkpointing), so very long sequences must stay on the
    chunked XLA scan; callers without a length (fast_path_report) skip
    that predicate."""
    import os

    if os.environ.get("MMTPU_NO_PALLAS"):
        return "MMTPU_NO_PALLAS is set"
    if not cf.batched or cf.strategy != "banded":
        return "not a stacked 'banded' CompiledFSM"
    if cf.domain != "prob":
        return f"domain {cf.domain!r} != 'prob'"
    if getattr(cf, "multi_pdf", False):
        return "general multi-pdf C-hat"
    if cf.alpha_hat.dtype != jnp.float32:
        return f"operator dtype {cf.alpha_hat.dtype} (fused kernels are f32)"
    G = cf.alpha_hat.shape[0]
    if B != G:
        return f"batch {B} != graph count {G} (one sequence per graph)"
    if G % 128:
        return f"graph count {G} not a multiple of 128 lanes"
    if jax.default_backend() != "tpu" and not os.environ.get(
        "MMTPU_PALLAS_INTERPRET"
    ):
        return (f"backend {jax.default_backend()!r} is not TPU (set "
                "MMTPU_PALLAS_INTERPRET=1 to force interpret mode)")
    Sp = cf.padded_states
    nO = max(len(cf.banded_offsets), 1)
    if any(abs(o) >= Sp for o in cf.banded_offsets):
        return "band offset exceeds padded state count"
    if (nO + 5) * Sp * G * 4 > 96 * 1024 * 1024:
        return "VMEM working set too large for the stacked banded kernel"
    if n_frames is not None and 3 * (n_frames + 1) * Sp * G * 4 > 4 << 30:
        return (f"unchunked alpha/gamma/emission streams for N={n_frames} "
                "would exceed ~4 GB of HBM (the chunk-checkpointed XLA "
                "scan handles long sequences)")
    return None


def _shift_rows(a, off, Sp, G):
    if off == 0:
        return a
    z = jnp.zeros((abs(off), G), jnp.float32)
    if off > 0:
        return jnp.concatenate([z, a[:-off]], axis=0)
    return jnp.concatenate([a[-off:], z], axis=0)


def _make_fwd_kernel(offs, Sp, G, Nf):
    nO = max(len(offs), 1)

    def kernel(bf_ref, om_ref, mask_ref, a0_ref, e_ref, msh_ref,
               alph_ref, vfin_ref, shift_ref, ksum_ref,
               a_scr, sh_scr, co_scr, ks_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            a_scr[:] = a0_ref[:]
            sh_scr[:] = jnp.zeros_like(sh_scr)
            co_scr[:] = jnp.zeros_like(co_scr)
            ks_scr[:] = jnp.zeros_like(ks_scr)

        a = a_scr[:]
        mask = mask_ref[:]
        y = jnp.zeros((Sp, G), jnp.float32)
        for oi, off in enumerate(offs):
            y = y + bf_ref[oi] * _shift_rows(a, off, Sp, G)
        yfin = jnp.sum(om_ref[:] * a, axis=0, keepdims=True)  # (1, G)
        y = y * (1.0 - mask) + mask * yfin
        y = jnp.where(i == 0, a, y)
        y = y * e_ref[0]
        m = jnp.max(y, axis=0)  # (G,)
        k = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
        y = y * jnp.exp2(-k)[None, :]
        a_scr[:] = y
        alph_ref[0] = y
        kt = ks_scr[:] + k[None, :]
        ks_scr[:] = kt
        x = msh_ref[0]
        ss = sh_scr[:]
        co = co_scr[:]
        xc = x - co
        t = ss + xc
        sh_scr[:] = t
        co_scr[:] = (t - ss) - xc

        @pl.when(i == Nf - 1)
        def _():
            vfin_ref[:] = jnp.sum(mask * a_scr[:], axis=0, keepdims=True)
            shift_ref[:] = t
            ksum_ref[:] = kt

    return kernel


def _make_bwd_kernel(offs, Sp, G, Nf):
    def kernel(bb_ref, om_ref, mask_ref, e_ref, alph_ref, gam_ref, b_scr):
        j = pl.program_id(0)  # frame t = Nf - 1 - j

        @pl.when(j == 0)
        def _():
            b_scr[:] = jnp.ones_like(b_scr)

        b = b_scr[:]
        y = jnp.zeros((Sp, G), jnp.float32)
        for oi, off in enumerate(offs):
            y = y + bb_ref[oi] * _shift_rows(b, -off, Sp, G)
        bfin = jnp.sum(mask_ref[:] * b, axis=0, keepdims=True)
        y = y + om_ref[:] * bfin
        y = jnp.where(j == 0, jnp.ones_like(y), y)
        gam_ref[0] = alph_ref[0] * y
        bn = y * e_ref[0]
        m = jnp.max(bn, axis=0)
        bn = bn * jnp.exp2(
            -jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
        )[None, :]
        b_scr[:] = bn

    return kernel


@functools.partial(jax.jit, static_argnames=("st", "want_posts"))
def _run(arrs, st, want_posts):
    bf, bb, om, mask, a0, e_full, msh = arrs
    (Sp, G, offs) = st
    Nf = e_full.shape[0]
    nO = max(len(offs), 1)
    interp = _interpret()
    fr3 = lambda i: (i, 0, 0)
    rev3 = lambda j: (Nf - 1 - j, 0, 0)

    def c(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    alphas, vfin, shift, ksum = pl.pallas_call(
        _make_fwd_kernel(offs, Sp, G, Nf),
        grid=(Nf,),
        in_specs=[
            c((nO, Sp, G)),
            c((Sp, G)),
            c((Sp, G)),
            c((Sp, G)),
            pl.BlockSpec((1, Sp, G), fr3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), fr3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Sp, G), fr3, memory_space=pltpu.VMEM),
            c((1, G)),
            c((1, G)),
            c((1, G)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Nf, Sp, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Sp, G), jnp.float32),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((1, G), jnp.float32),
        ],
        interpret=interp,
    )(bf, om, mask, a0, e_full, msh)

    if not want_posts:
        return None, vfin[0], shift[0], ksum[0]

    gammas = pl.pallas_call(
        _make_bwd_kernel(offs, Sp, G, Nf),
        grid=(Nf,),
        in_specs=[
            c((nO, Sp, G)),
            c((Sp, G)),
            c((Sp, G)),
            pl.BlockSpec((1, Sp, G), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, G), rev3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Sp, G), rev3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nf, Sp, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Sp, G), jnp.float32)],
        interpret=interp,
    )(bb, om, mask, e_full, alphas)
    return gammas, vfin[0], shift[0], ksum[0]


def banded_fused_fb(cf, lhs, lengths, want_posts):
    """Fused stacked-banded forward-backward.  Returns
    (posts (Nf, P1, G) or None, v_final (G,), shift (G,), ksum (G,))."""
    from . import pallas_scan as ps

    B, N, P = lhs.shape
    G = cf.alpha_hat.shape[0]
    Sp = cf.padded_states
    offs = tuple(cf.banded_offsets)
    ext, mshift = ps.prepare_emissions(lhs, lengths, P)  # (Nf, P1, G)
    spdfT = jnp.transpose(cf.state_pdf)  # (Sp, G)
    Nf = ext.shape[0]
    P1 = P + 1
    # state-expanded emission stream via a G-batched one-hot matmul (a
    # 7M-element take_along_axis gather here measured ~0.12 s — the MXU
    # form is ~30 us)
    oh_sp = (
        spdfT.T[:, :, None] == jnp.arange(P1)[None, None, :]
    ).astype(jnp.float32)  # (G, Sp, P1)
    e_full = jnp.einsum(
        "gsp,npg->nsg", oh_sp, ext,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Nf, Sp, G)
    bf = jnp.transpose(cf.banded_fwd, (1, 2, 0)).astype(jnp.float32)
    bb = jnp.transpose(cf.banded_bwd, (1, 2, 0)).astype(jnp.float32)
    om = jnp.transpose(cf.omega_prob).astype(jnp.float32)
    a0 = jnp.transpose(jnp.exp(cf.alpha_hat)).astype(jnp.float32)
    mask = (
        jnp.arange(Sp)[:, None] == cf.final_state[None, :]
    ).astype(jnp.float32)
    st = (Sp, G, offs)
    gammas, vfin, shift, ksum = _run(
        (bf, bb, om, mask, a0, e_full, mshift), st, want_posts
    )
    if not want_posts:
        return None, vfin, shift, ksum
    # per-graph pdf reduction + normalization, batched over all frames:
    # one (G-batched) one-hot matmul — s[n, p, g] = Σ_s [spdf[g,s]=p]·γ
    P1 = P + 1
    oh = (
        spdfT.T[:, None, :] == jnp.arange(P1)[None, :, None]
    ).astype(jnp.float32)  # (G, P1, Sp)
    s = jnp.einsum(
        "gps,nsg->npg", oh, gammas,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    tot = jnp.sum(gammas, axis=1)  # (Nf, G)
    posts = s / jnp.where(tot > 0, tot, 1.0)[:, None, :]
    return posts, vfin, shift, ksum
