"""Fused Pallas forward-backward scan for the *blocked* operator.

The 2M-arc regime (BASELINE headline): under ``lax.scan`` every frame
re-streams the blocked operator (~9 MB) from HBM and moves the (Sp, B)
state matrix (~25 MB) in and out three times per frame (forward, chunk
recompute, backward) — ~110 MB/frame, fully HBM-bound (measured ≈0.53 s at
B=128, N=700).  These kernels keep the operator AND the state resident in
VMEM across frames (the same trick as ops/pallas_scan.py for dense graphs;
reference hot-kernel analog src/linalg.jl:159-233):

* ``fwd``: grid (frames,); per frame one VMEM-resident blocked matvec; HBM
  traffic = the per-frame emission row in and one state checkpoint out
  every ``chunk`` frames.  Compute-bound on the MXU.
* ``recompute``: re-runs ``chunk`` forward frames from a boundary, writing
  per-frame alphas (the only unavoidable HBM stream: the backward needs
  them).
* ``bwd``: reads the chunk's alphas in reverse, carries beta in VMEM,
  emits normalized pdf posteriors per frame.

State layout in VMEM is **(R, Bh, W)** — row r, batch b, column j is flat
state r·W + j of sequence b — chosen so that

* the batch rides the *sublane* axis: a 64-sequence slice is (R, 64, 384)
  = 12 MB with zero lane padding (batch-as-lanes would pad every buffer to
  128 lanes, which is exactly what blew VMEM in the first design);
* the blocked operator's affine tier descriptors (ops/blocked.py) become
  row/lane slices: a stride-W gather window is ``a3[k, :, c:c+Sm]``, a
  stride-W scatter is a lane-slice update; the tier contraction is ONE
  batched dot_general over all K blocks (batch dim k — a fori_loop of K
  small dots left the MXU ~25x under peak), with a single 3D transpose per
  frame for the column-oriented side (measured ~12% of the sweep);
* band offsets are static two-slice lane shifts with row carry;
* the pdf-grouped emission multiply is a lane-dim reshape (W % cmax == 0);
* the extended final column (rank-1 ω split) lives in the flat tail
  [R·W, Sp), a (Bh, tail) buffer; the matvec accumulates directly into a
  VMEM scratch (no big value temporaries -> no register spills).

Batches larger than 64 are processed in independent 64-wide slices by the
wrapper (same compiled kernel, sequential calls).  Graphs outside this
shape (residue edges, multiple tiers, non-affine or stride-mismatched
descriptors) fall back to the XLA path — capability is identical, this is
purely the fast lane.

Numerics mirror inference._fb_prob exactly: probability domain, per-frame
exact power-of-two rescaling, Kahan-compensated emission shift, identical
posterior normalization.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "block_scan_supported",
    "block_scan_reject_reason",
    "block_fused_fb",
    "vit_scan_supported",
    "block_fused_viterbi_fwd",
]

_PRECISIONS = {
    # NOTE: Mosaic's dot_general lowering supports only DEFAULT/HIGHEST, so
    # 'high' cannot map to 3-pass bf16 (Precision.HIGH) here the way
    # ops/semiring_ops does for XLA-lowered matmuls
    "bf16": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "f32": jax.lax.Precision.HIGHEST,
}
_BH = 64  # batch slice per kernel call (sublane-friendly, VMEM-sized)
# Rescale cadence: the exact power-of-two rescale (scale + exponent
# bookkeeping, ~2 full passes over the state) runs every _RS-th frame
# instead of every frame.  Values between rescales are bounded above by
# ~2 (sub-stochastic operators, max-1 emissions) but NOT below — a frame
# whose best reachable emission sits tens of nats under the frame max
# shrinks the state by that factor (real acoustic log-likelihoods swing
# 30+ nats), so a cheap per-frame max-reduce guards the cadence: when the
# running max falls below 2^_RS_FLOOR the rescale fires immediately,
# keeping the f32 state well above the subnormal range on ANY input
# (found by adversarial review in round 4: two 60-nat frames inside one
# 4-frame window underflowed the carried state to zero).
_RS = 4
_RS_FLOOR = -20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# static plan extraction
# ---------------------------------------------------------------------------

def _dir_plan(op, meta, W, R, cmax):
    plan, _ = _dir_plan_explain(op, meta, W, R, cmax)
    return plan


def _dir_plan_explain(op, meta, W, R, cmax):
    """Per-direction tier plan in (R, Gp, Bh, cmax) coordinates as
    (plan, None), or (None, reason) naming the first rejected predicate.

    The kernel state is 4D: row r, pdf-group g, batch b, lane c with flat
    state r·W + g·cmax + c.  Supported tier forms (both appear in LM ∘ HMM
    graphs), with every window aligned to pdf-group (=lane-tile) boundaries:
    * gather 'affine_k_major' (one group row per k) + scatter
      'affine_d_pad'/'affine_d' (one lane column per k, staged transpose);
    * gather 'affine_s_major' (one lane column per k, staged transpose) +
      scatter 'affine_k_pad'/'contig' (one group row per k).
    """
    band_offsets, tier_descs = meta[0], meta[1]
    if op.res_src is not None:
        return None, "residue edges present (blocks with too many sources)"
    if len(op.tiers) != 1:
        return None, f"{len(op.tiers)} tiers (kernel supports exactly 1)"
    sidx, didx, Wt = op.tiers[0]
    gdesc, ddesc = tier_descs[0]
    K, Sm = sidx.shape
    D = didx.shape[1]
    plan = dict(band_offsets=tuple(band_offsets), K=K, Sm=Sm, D=D)
    for off in band_offsets:
        if off % cmax or abs(off) >= W:
            return None, (
                f"band offset {off} not a multiple of the pdf-group size "
                f"{cmax} inside row width {W}"
            )

    if gdesc[0] == "affine_k_major":
        _, gb, dk, gc0 = gdesc
        c = gb + gc0
        if dk != W or c // W != 0 or (c % W) % cmax + Sm > cmax:
            return None, (
                f"k-major gather window (base {c}, stride {dk}) not aligned "
                f"to one pdf group of the (R, {W}) state rows"
            )
        # xg_k = a4[k, g0, :, l0 : l0+Sm]
        plan["g"] = ("row", (c % W) // cmax, (c % W) % cmax)
    elif gdesc[0] == "affine_s_major":
        _, gb, ds, gc0 = gdesc
        if (ds != W or gb % W or gb // W + Sm > R or gc0 % cmax
                or K != cmax):
            return None, (
                f"s-major gather window (base {gb}, stride {ds}) not a "
                f"row-aligned lane column of the (R, {W}) state rows"
            )
        # staged: t = transpose(a4[r0:r0+Sm, g0, :, :]); xg_k = t[k]
        plan["g"] = ("col", gb // W, gc0 // cmax)
    else:
        return None, f"non-affine tier gather pattern {gdesc[0]!r}"

    if ddesc[0] in ("affine_d_pad", "affine_d"):
        base = ddesc[1]
        dd = W if ddesc[0] == "affine_d" else ddesc[2]
        c0 = 0 if ddesc[0] == "affine_d" else ddesc[3]
        if dd != W or base % W or base // W + D > R or c0 % cmax or K != cmax:
            return None, (
                f"d-affine scatter window (base {base}, stride {dd}) not a "
                f"row-aligned lane column of the (R, {W}) state rows"
            )
        # staged: y4[r0:r0+D, g0, :, :] += transpose(t)
        plan["s"] = ("col", base // W, c0 // cmax)
    elif ddesc[0] in ("affine_k_pad", "contig"):
        if ddesc[0] == "contig":
            base, dk2, c02 = ddesc[1], D, 0
        else:
            _, base, dk2, c02 = ddesc
        c = base + c02
        if dk2 != W or c // W != 0 or (c % W) % cmax + D > cmax:
            return None, (
                f"k-affine scatter window (base {c}, stride {dk2}) not "
                f"aligned to one pdf group of the (R, {W}) state rows"
            )
        # y4[k, g0, :, l0 : l0+D] += yk
        plan["s"] = ("row", (c % W) // cmax, (c % W) % cmax)
    else:
        return None, f"non-affine tier scatter pattern {ddesc[0]!r}"
    return plan, None


def _ov_plan(descs, W, R, cmax):
    """Validate overflow-family descriptors (ops/blocked.py _ov_families)
    against the (R, W) grid.  Returns (plans, None) or (None, reason); each
    plan is (kind, form, (rg, gg), (rb, gb), D) with the ov group at grid
    cell (rg, gg) and the core-side window/column anchored at (rb, gb)."""
    plans = []
    for desc in descs:
        kind, g0, form, base, stride, D = desc
        if g0 % cmax or (g0 % W) % cmax:
            return None, f"ov group base {g0} not lane-group aligned"
        rg, gg = g0 // W, (g0 % W) // cmax
        if rg >= R:
            return None, f"ov group row {rg} outside the {R}-row grid"
        if (base % W) % cmax:
            return None, f"ov family base {base} not lane-group aligned"
        rb, gb = base // W, (base % W) // cmax
        if form == "win":
            if stride != W:
                return None, f"ov window stride {stride} != row width {W}"
            if D != cmax:
                return None, f"ov window width {D} != lane-group size {cmax}"
            if rb + cmax > R:
                return None, "ov window rows overrun the grid"
        elif form == "col":
            if D > 1 and stride != W:
                return None, f"ov column stride {stride} != row width {W}"
            if rb + D > R:
                return None, "ov column rows overrun the grid"
        else:
            return None, f"unknown ov family form {form!r}"
        plans.append((kind, form, (rg, gg), (rb, gb), D))
    return tuple(plans), None


def _full_plan(cf):
    """(W, R, plan_fwd, plan_bwd) or None."""
    plan, _ = _full_plan_explain(cf)
    return plan


def _full_plan_explain(cf):
    """((W, R, plan_fwd, plan_bwd), None) or (None, reason).  Plans carry
    an 'ov' tuple of overflow-family plans (empty for uniform layouts)."""
    ops = (cf.block_fwd, cf.block_bwd)
    metas = (cf.block_fwd_offsets, cf.block_bwd_offsets)
    W = None
    for op, meta in zip(ops, metas):
        if op.res_src is not None:
            return None, "residue edges present"
        if len(op.tiers) != 1:
            return None, f"{len(op.tiers)} tiers (kernel supports exactly 1)"
        for desc in meta[1][0]:
            if desc[0] in ("affine_k_major", "affine_s_major",
                           "affine_k_pad", "affine_d_pad"):
                W = desc[2]
                break
    if not W:
        return None, "no affine tier descriptor to derive the row width from"
    if W % 128:
        return None, f"tier stride {W} not a multiple of 128 lanes"
    Sp = cf.padded_states
    ov_layout = getattr(cf, "ov_layout", ())
    if cf.pdf_group:
        cmax, lim = cf.pdf_group
        nOv = 0
    elif ov_layout:
        cmax, nOv = ov_layout
    else:
        return None, "no pdf-grouped or overflow layout"
    if W % cmax:
        return None, f"row width {W} not a multiple of pdf-group size {cmax}"
    fin = int(cf.final_state)
    Rk = max(cf.block_fwd.tiers[0][0].shape[0],
             cf.block_bwd.tiers[0][0].shape[0])
    # the grid must cover everything below the phony tail; legacy uniform
    # graphs satisfy fin == Rk*W already, overflow layouts put their ov
    # groups in extra rows beyond the tier blocks
    R = fin // W if (fin % W == 0 and fin // W >= Rk) else Rk
    if R * W > Sp:
        return None, f"R*W = {R * W} exceeds padded states {Sp}"
    tail = Sp - R * W
    if fin < R * W:
        return None, "phony final state not in the tail region"
    if tail % cmax or tail <= 0 or tail % 128:
        return None, f"tail size {tail} not lane/pdf-group aligned"
    Gp = W // cmax
    if nOv:
        P = cf.num_pdfs
        if R * Gp != P + nOv:
            return None, (f"overflow grid has {R * Gp} lane-groups, layout "
                          f"expects P + nOv = {P + nOv}")
        if P % Gp:
            return None, (f"uniform region ({P} groups) does not end on a "
                          f"row boundary (Gp = {Gp})")
    pf, rf = _dir_plan_explain(cf.block_fwd, cf.block_fwd_offsets, W, R, cmax)
    if pf is None:
        return None, f"forward operator: {rf}"
    pb, rb = _dir_plan_explain(cf.block_bwd, cf.block_bwd_offsets, W, R, cmax)
    if pb is None:
        return None, f"backward operator: {rb}"
    for plan, meta, dname in ((pf, metas[0], "forward"),
                              (pb, metas[1], "backward")):
        ovd = meta[3] if len(meta) > 3 else ()
        if ovd and not nOv:
            return None, f"{dname} operator: ov families without ov layout"
        ovp, ro = _ov_plan(ovd, W, R, cmax)
        if ovp is None:
            return None, f"{dname} operator: {ro}"
        plan["ov"] = ovp
    # band weights must vanish on the tail (the rank-1 ω split owns it) —
    # checked via static build-time metadata (meta[2]), never device arrays
    for meta in metas:
        if len(meta) <= 2:
            return None, "legacy operator metadata without band extent"
        if meta[2] > R * W:
            return None, "band weights extend into the tail region"
    return (W, R, pf, pb), None


def block_scan_reject_reason(cf, B: int):
    """None when the fused blocked scan accepts this graph, else a one-line
    reason naming the FIRST rejected predicate (the fast-path cliff made
    visible; see inference.fast_path_report)."""
    if cf.strategy != "block":
        return f"strategy {cf.strategy!r} != 'block'"
    if cf.batched:
        return "batched CompiledFSM (the fused scan targets one shared graph)"
    if cf.alpha_hat.dtype != jnp.float32:
        # e.g. the dtype=float64 precision mode: kernels are f32-only
        return (f"operator dtype {cf.alpha_hat.dtype} (fused kernels are "
                "f32; the XLA path handles other dtypes)")
    if not cf.pdf_group and not getattr(cf, "ov_layout", ()):
        return ("no uniform pdf-grouped layout (compile_fsm reorder "
                "declined or disabled)")
    if cf.omega_prob is None:
        return "no rank-1 omega split"
    if getattr(cf, "multi_pdf", False):
        return "general multi-pdf C-hat (fused scan needs one pdf per state)"
    if cf.pdf_group:
        cmax, lim = cf.pdf_group
        if (cf.num_pdfs + 1) * cmax != lim:
            return "pdf-grouped layout not uniform over all pdfs"
    plan, reason = _full_plan_explain(cf)
    if plan is None:
        return reason
    W, R, pf, pb = plan
    Bh = min(B, _BH)
    state = R * W * Bh * 4
    Wt = cf.block_fwd.tiers[0][2]
    ovb = 4 * sum(
        int(np.prod(w.shape))
        for w in (tuple(cf.block_fwd.ov_w) + tuple(cf.block_bwd.ov_w))
    )
    # two state scratches + one double-buffered stream + weights + temps
    need = 2 * state + 2 * state + Wt.size * 4 + 1.5 * state + 4e6 + ovb
    if need > 110 * 1024 * 1024:
        return (f"VMEM working set ~{need / 1e6:.0f} MB exceeds the 110 MB "
                f"budget (R*W = {R * W}, Bh = {Bh})")
    return None


def block_scan_supported(cf, B: int) -> bool:
    return block_scan_reject_reason(cf, B) is None


# ---------------------------------------------------------------------------
# in-kernel pieces (state: main (R, Gp, Bh, cmax) + tail (Bh, tail))
# ---------------------------------------------------------------------------

def _tier_scratch(plan, Bh, cmax):
    """Lane-column GATHERS stage through a (cmax, Sm, Bh) transposed view
    of the state (one window transpose per frame) — dynamic single-lane
    indexing is not expressible on TPU.  Col-scatters need no scratch since
    the batched tier dot produces (K, D, Bh) directly (transposed on the
    way into y4)."""
    Sm = plan["Sm"]
    if plan["g"][0] == "col":
        return (cmax, Sm, Bh)
    return (1, 8, Bh)


def _make_matvec(plan, R, Gp, Bh, cmax, prec):
    """Accumulate y = M⊗a into ``y4_scr`` (band + tier + overflow families,
    main block only).  State refs are 4D (R, Gp, Bh, cmax); flat state
    r·W + g·cmax + c.

    Probability semiring only: tier panels ride the MXU.  (A tropical
    max-mode variant was tried and removed: the max-product reduction has
    no MXU analog, so it is VPU-bound either way and XLA's own codegen for
    it is faster — Viterbi at scale instead uses the compressed-backpointer
    design in viterbi._viterbi_scale_bp.)

    Overflow families (ops/blocked.py _ov_families; e.g. a backoff LM's
    backoff arcs / bigram rows) are each ONE slab op over (≤cmax, Bh, cmax)
    windows — a batched dot for per-lane source windows, a broadcast
    multiply-add for lane-aligned columns — negligible next to the band
    passes.  ``ovw_ref`` stacks their weight panels zero-padded to a common
    (nF, maxD, cmax) shape; per-family slices are static.
    """
    offs = plan["band_offsets"]
    K, Sm, D = plan["K"], plan["Sm"], plan["D"]
    g, s = plan["g"], plan["s"]
    ov_plans = plan.get("ov", ())
    precision = _PRECISIONS[prec]
    RG = R * Gp
    combine = lambda a, b: a + b

    def shift_rows(a, m):
        if m == 0:
            return a
        z = jnp.zeros((abs(m), Bh, cmax), jnp.float32)
        if m > 0:
            return jnp.concatenate([z, a[:-m]], axis=0)
        return jnp.concatenate([a[-m:], z], axis=0)

    def apply_ov(a4_scr, ovw_ref, y4_scr):
        for f, (kind, form, (rg, gg), (rb, gb), Df) in enumerate(ov_plans):
            Wv = ovw_ref[f, :Df, :]  # (Df, cmax)
            if kind == "in":
                if form == "win":
                    # y_ov[b, l] += Σ_j Wv[l, j] · a4[rb + l, gb, b, j]
                    # (an elementwise broadcast-reduce over one (cmax, Bh,
                    # cmax) slab — Mosaic's dot lowering cannot express a
                    # batched dot whose lhs has no non-contracting dims)
                    X = a4_scr[rb : rb + cmax, gb, :, :]  # (l, Bh, j)
                    Y = jnp.sum(Wv[:, None, :] * X, axis=2)  # (l, Bh)
                    y4_scr[rg, gg, :, :] = (
                        y4_scr[rg, gg, :, :] + jnp.transpose(Y)
                    )
                else:
                    # y_ov[b, l] += Σ_r Wv[r, l] · a4[rb + r, gb, b, l]
                    X = a4_scr[rb : rb + Df, gb, :, :]  # (Df, Bh, cmax)
                    y4_scr[rg, gg, :, :] = y4_scr[rg, gg, :, :] + jnp.sum(
                        Wv[:, None, :] * X, axis=0
                    )
            else:
                xov = a4_scr[rg, gg, :, :]  # (Bh, cmax)
                if form == "col":
                    # y4[rb + r, gb, b, l] += Wv[r, l] · x_ov[b, l]
                    win = y4_scr[rb : rb + Df, gb, :, :]
                    y4_scr[rb : rb + Df, gb, :, :] = (
                        win + Wv[:, None, :] * xov[None, :, :]
                    )
                else:
                    # y4[rb + l, gb, b, j] += Wv[l, j] · x_ov[b, l]
                    win = y4_scr[rb : rb + cmax, gb, :, :]
                    y4_scr[rb : rb + cmax, gb, :, :] = (
                        win + Wv[:, None, :] * jnp.transpose(xov)[:, :, None]
                    )

    def matvec(a4_scr, band_ref, W_ref, ovw_ref, y4_scr, t3_scr):
        # band: pure group-row shifts (offsets are multiples of cmax);
        # the first offset initializes y directly (a zeros init + combine
        # costs an extra full pass over the state per frame)
        a_rg = a4_scr[:].reshape(RG, Bh, cmax)
        if offs:
            y = band_ref[0][:, None, :] * shift_rows(a_rg, offs[0] // cmax)
            for oi in range(1, len(offs)):
                y = combine(
                    y,
                    band_ref[oi][:, None, :]
                    * shift_rows(a_rg, offs[oi] // cmax),
                )
        else:
            y = jnp.zeros((RG, Bh, cmax), jnp.float32)
        y4_scr[:] = y.reshape(R, Gp, Bh, cmax)

        if g[0] == "col":
            _, r0, g0 = g
            t3_scr[:, :Sm, :] = jnp.transpose(
                a4_scr[r0 : r0 + Sm, g0, :, :], (2, 0, 1)
            )

        # tier contraction: ONE batched dot_general over all K blocks (a
        # fori_loop of K small dots left the MXU ~25x under peak — the
        # per-iteration slice/store overhead dominated the 128x128x64 dots)
        if g[0] == "row":
            _, g0, l0 = g
            Xg = a4_scr[0:K, g0, :, l0 : l0 + Sm]  # (K, Bh, Sm)
            x_cdim = 2
        else:
            Xg = t3_scr[0:K, :Sm, :]  # (K, Sm, Bh)
            x_cdim = 1
        W3 = W_ref[:]  # (K, Sm, D)
        if W3.dtype == jnp.bfloat16:
            # precision='bf16': tier weights stored AS bf16 (halves their
            # per-frame VMEM read); the state side is cast at the dot so
            # the MXU runs native bf16 x bf16 with f32 accumulation —
            # the same numeric class as DEFAULT-precision f32 inputs
            Xg = Xg.astype(jnp.bfloat16)
        if s[0] == "col":
            Y = jax.lax.dot_general(
                W3, Xg, (((1,), (x_cdim,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=jnp.float32,
            )  # (K, D, Bh)
            _, r0s, g0s = s
            win = y4_scr[r0s : r0s + D, g0s, :, :]
            y4_scr[r0s : r0s + D, g0s, :, :] = combine(
                win, jnp.transpose(Y, (1, 2, 0))
            )
        else:
            Y = jax.lax.dot_general(
                Xg, W3, (((x_cdim,), (1,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=jnp.float32,
            )  # (K, Bh, D)
            _, gs, ls = s
            cur = y4_scr[0:K, gs, :, ls : ls + D]
            y4_scr[0:K, gs, :, ls : ls + D] = combine(cur, Y)

        if ov_plans:
            apply_ov(a4_scr, ovw_ref, y4_scr)

    return matvec


def _maxall(y4, yt):
    return jnp.maximum(
        jnp.max(y4, axis=(0, 1, 3)), jnp.max(yt, axis=1)
    )  # (Bh,)


def _guard_min(m):
    """Scalar statistic for the strided-rescale underflow guard: min over
    ACTIVE batch entries of the per-entry state max ``m`` (which the
    kernels compute from the pre-store VALUES so the reduce fuses with the
    producer chain).  Zero-padded slice entries (B % 64 != 0) and
    sequences whose mass legitimately died have a per-entry max of
    0 < 2^_RS_FLOOR; including them would fire the guard on every frame
    and silently negate the every-_RS-frame rescale cadence.  All-zero
    entries need no rescale anyway (their k stays 0)."""
    return jnp.min(jnp.where(m > 0, m, jnp.inf))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_core(plan, R, Gp, Bh, cmax, tail, finoff, prec):
    matvec = _make_matvec(plan, R, Gp, Bh, cmax, prec)

    def step(t_is_zero, a4_scr, at_ref, band_ref, W_ref, ovw_ref, om_ref,
             omt_ref, em, et, y4_scr, t3_scr):
        at = at_ref[:]
        matvec(a4_scr, band_ref, W_ref, ovw_ref, y4_scr, t3_scr)
        a4 = a4_scr[:]
        # rank-1 ω: the only arcs into the tail target the phony final state
        omc = om_ref[:].reshape(R, Gp, 1, cmax) * a4
        yfin = jnp.sum(omc, axis=(0, 1, 3)) + jnp.sum(
            omt_ref[:] * at, axis=1
        )  # (Bh,)
        pt_cols = [yfin[:, None]]
        if finoff > 0:
            pt_cols.insert(0, jnp.zeros((Bh, finoff), jnp.float32))
        if tail - finoff - 1 > 0:
            pt_cols.append(
                jnp.zeros((Bh, tail - finoff - 1), jnp.float32)
            )
        pt = (jnp.concatenate(pt_cols, axis=1)
              if len(pt_cols) > 1 else pt_cols[0])
        p4 = jnp.where(t_is_zero, a4, y4_scr[:])
        pt = jnp.where(t_is_zero, at, pt)
        e4 = em.reshape(R, Gp, Bh)[:, :, :, None]
        return p4 * e4, pt * et

    return step


def _rescale(a4_scr, at_scr, ks_scr, m=None):
    """Exact power-of-two rescale of the carried state, accumulated into
    the integer-exponent scratch (applied every _RS-th frame).  ``m``: the
    per-entry state max when the caller already computed it from the
    pre-store VALUES (fusing that reduce with the producer chain saves a
    full state read here AND in the underflow guard — measured ~13% of
    the forward sweep)."""
    if m is None:
        m = _maxall(a4_scr[:], at_scr[:])
    k = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
    sc = jnp.exp2(-k)
    a4_scr[:] = a4_scr[:] * sc[None, None, :, None]
    at_scr[:] = at_scr[:] * sc[:, None]
    if ks_scr is not None:
        ks_scr[:] = ks_scr[:] + k[None, :]


def _make_fwd_kernel(plan, R, Gp, Bh, cmax, tail, finoff, K_chunk, prec,
                     R_u, nOv):
    step = _fwd_core(plan, R, Gp, Bh, cmax, tail, finoff, prec)
    RG = R * Gp
    nF = len(plan.get("ov", ()))

    def kernel(*refs):
        it = iter(refs)
        band_ref, W_ref = next(it), next(it)
        ovw_ref = next(it) if nF else None
        om_ref, omt_ref = next(it), next(it)
        al_ref, alt_ref = next(it), next(it)
        em_ref, et_ref = next(it), next(it)
        emov_ref = next(it) if nOv else None
        msh_ref = next(it)
        b3_ref, bt_ref = next(it), next(it)
        vfin_ref, shift_ref, ksum_ref = next(it), next(it), next(it)
        a4_scr, at_scr, y4_scr, t3_scr = next(it), next(it), next(it), next(it)
        sh_scr, co_scr, ks_scr = next(it), next(it), next(it)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            a4_scr[:] = jnp.broadcast_to(
                al_ref[:].reshape(R, Gp, 1, cmax), (R, Gp, Bh, cmax)
            )
            at_scr[:] = jnp.broadcast_to(alt_ref[:], (Bh, tail))
            sh_scr[:] = jnp.zeros_like(sh_scr)
            co_scr[:] = jnp.zeros_like(co_scr)
            ks_scr[:] = jnp.zeros_like(ks_scr)

        @pl.when(i % K_chunk == 0)
        def _():
            b3_ref[0] = a4_scr[:].reshape(RG, Bh, cmax)
            bt_ref[0] = at_scr[:]

        y4, yt = step(
            i == 0, a4_scr, at_scr, band_ref, W_ref, ovw_ref, om_ref,
            omt_ref, em_ref[0], et_ref[0], y4_scr, t3_scr,
        )
        x = msh_ref[0]
        ss = sh_scr[:]
        c = co_scr[:]
        xc = x - c
        t = ss + xc
        sh_scr[:] = t
        co_scr[:] = (t - ss) - xc
        a4_scr[:] = y4
        at_scr[:] = yt
        if nOv:
            # overflow rows carry per-LANE pdfs: their broadcast emission
            # was 1; multiply the streamed lane-resolved block in (ref
            # form — Mosaic cannot lower partial-slab updates on values)
            a4_scr[R_u:R] = a4_scr[R_u:R] * emov_ref[0].reshape(
                R - R_u, Gp, Bh, cmax
            )
            m = _maxall(a4_scr[:], at_scr[:])
        else:
            # per-entry max from the pre-store VALUES: the reduce fuses
            # with the producer chain instead of re-reading the stored
            # state (one state pass saved here + one inside _rescale)
            m = _maxall(y4, yt)
        m_g = _guard_min(m)  # underflow guard

        @pl.when(
            (i % _RS == _RS - 1)
            | (i == pl.num_programs(0) - 1)
            | (m_g < 2.0**_RS_FLOOR)
        )
        def _():
            _rescale(a4_scr, at_scr, ks_scr, m)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            vfin_ref[:] = at_scr[:, finoff : finoff + 1]
            shift_ref[:] = t
            ksum_ref[:] = ks_scr[:]

    return kernel


def _make_recompute_kernel(plan, R, Gp, Bh, cmax, tail, finoff, prec,
                           R_u, nOv):
    step = _fwd_core(plan, R, Gp, Bh, cmax, tail, finoff, prec)
    RG = R * Gp
    nF = len(plan.get("ov", ()))

    def kernel(*refs):
        it = iter(refs)
        t0_ref = next(it)
        band_ref, W_ref = next(it), next(it)
        ovw_ref = next(it) if nF else None
        om_ref, omt_ref = next(it), next(it)
        em_ref, et_ref = next(it), next(it)
        emov_ref = next(it) if nOv else None
        b3_ref, bt_ref = next(it), next(it)
        a3_out, at_out = next(it), next(it)
        a4_scr, at_scr, y4_scr, t3_scr = next(it), next(it), next(it), next(it)
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            a4_scr[:] = b3_ref[:].reshape(R, Gp, Bh, cmax)
            at_scr[:] = bt_ref[:]

        tt = t0_ref[0] + j
        y4, yt = step(
            tt == 0, a4_scr, at_scr, band_ref, W_ref, ovw_ref,
            om_ref, omt_ref, em_ref[0], et_ref[0], y4_scr, t3_scr,
        )
        a4_scr[:] = y4
        at_scr[:] = yt
        if nOv:
            a4_scr[R_u:R] = a4_scr[R_u:R] * emov_ref[0].reshape(
                R - R_u, Gp, Bh, cmax
            )
            m = _maxall(a4_scr[:], at_scr[:])
        else:
            m = _maxall(y4, yt)
        m_g = _guard_min(m)

        @pl.when((tt % _RS == _RS - 1) | (m_g < 2.0**_RS_FLOOR))
        def _():
            # per-frame alpha SCALE is free for the backward pass (gamma
            # is normalized per frame), so this cadence only protects
            # f32 range — the underflow guard included
            _rescale(a4_scr, at_scr, None, m)

        a3_out[0] = a4_scr[:].reshape(RG, Bh, cmax)
        at_out[0] = at_scr[:]

    return kernel


def _make_bwd_kernel(plan, R, Gp, Bh, cmax, tail, finoff, K_chunk, prec,
                     Npad, Gt, R_u, nOv, SPR):
    matvec = _make_matvec(plan, R, Gp, Bh, cmax, prec)
    RG = R * Gp
    nF = len(plan.get("ov", ()))

    def kernel(*refs):
        it = iter(refs)
        t0_ref = next(it)
        band_ref, W_ref = next(it), next(it)
        ovw_ref = next(it) if nF else None
        om_ref, omt_ref = next(it), next(it)
        em_ref, et_ref = next(it), next(it)
        emov_ref = next(it) if nOv else None
        a3_ref, at_ref = next(it), next(it)
        bin3_ref, bint_ref = next(it), next(it)
        posts_ref = next(it)
        ovposts_ref = next(it) if nOv else None
        bout3_ref, boutt_ref = next(it), next(it)
        b4_scr, bt_scr, y4_scr, t3_scr = next(it), next(it), next(it), next(it)
        j = pl.program_id(0)  # frame t = t0 + (K-1-j)

        @pl.when(j == 0)
        def _():
            b4_scr[:] = bin3_ref[:].reshape(R, Gp, Bh, cmax)
            bt_scr[:] = bint_ref[:]

        bbt = bt_scr[:]
        t = t0_ref[0] + (K_chunk - 1 - j)
        matvec(b4_scr, band_ref, W_ref, ovw_ref, y4_scr, t3_scr)
        # rank-1 ω backward: y += ω · bb[fin]
        bfin = bbt[:, finoff : finoff + 1]  # (Bh, 1)
        y4 = y4_scr[:] + om_ref[:].reshape(R, Gp, 1, cmax) * bfin[
            None, None, :, :
        ]
        yt = omt_ref[:] * bfin
        last = t == Npad - 1
        y4 = jnp.where(last, jnp.ones_like(y4), y4)
        yt = jnp.where(last, jnp.ones_like(yt), yt)
        g4 = a3_ref[0].reshape(R, Gp, Bh, cmax) * y4
        gt = at_ref[0] * yt
        # pdf reduction: lane sums -> (RG, Bh) main + (Gt, Bh) tail; rows
        # of overflow groups mix pdfs — the host assembly replaces them
        # with the lane-resolved ovposts block below
        s_main = jnp.sum(g4, axis=3).reshape(RG, Bh)
        s_tail = jnp.transpose(
            jnp.sum(gt.reshape(Bh, Gt, cmax), axis=2), (1, 0)
        )
        sp = jnp.concatenate([s_main, s_tail], axis=0)  # (SPR, Bh)
        tot = jnp.sum(sp, axis=0, keepdims=True)
        den = jnp.where(tot > 0, tot, 1.0)
        posts_ref[0] = sp / den
        if nOv:
            ovposts_ref[0] = (
                g4[R_u:R].reshape(nOv, Bh, cmax) / den[0][None, :, None]
            )
        e4 = em_ref[0].reshape(R, Gp, Bh)[:, :, :, None]
        bn4 = y4 * e4
        bnt = yt * et_ref[0]
        b4_scr[:] = bn4
        bt_scr[:] = bnt
        if nOv:
            b4_scr[R_u:R] = b4_scr[R_u:R] * emov_ref[0].reshape(
                R - R_u, Gp, Bh, cmax
            )
            m = _maxall(b4_scr[:], bt_scr[:])
        else:
            m = _maxall(bn4, bnt)
        m_g = _guard_min(m)

        @pl.when((t % _RS == 0) | (m_g < 2.0**_RS_FLOOR))
        def _():
            _rescale(b4_scr, bt_scr, None, m)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            bout3_ref[:] = b4_scr[:].reshape(RG, Bh, cmax)
            boutt_ref[:] = bt_scr[:]

    return kernel


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _const(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("st", "want_posts", "chunk"))
def _run_slice(arrs, st, want_posts, chunk):
    """One ≤64-sequence batch slice through the fused scan."""
    (band_f, Wt_f, ovw_f, band_b, Wt_b, ovw_b, om, omt, al, alt, em, et,
     em_ov, msh) = arrs
    (Sp, SPR, cmax, finoff, W, R, tail, plan_f, plan_b, prec, R_u,
     nOv) = st
    Gp = W // cmax
    RG = R * Gp
    Gt = tail // cmax
    Nf, _, Bh = em.shape
    K = min(chunk, Nf)
    C = -(-Nf // K)
    Npad = C * K
    if Npad != Nf:
        pad = Npad - Nf
        em = jnp.concatenate(
            [em, jnp.zeros((pad, RG, Bh), jnp.float32)], axis=0
        )
        # pad frames are phony-absorb: emission 1 only on the phony pdf's
        # slots (the LAST tail group), 0 elsewhere
        etp = jnp.zeros((pad, Bh, tail), jnp.float32)
        etp = etp.at[:, :, (Gt - 1) * cmax :].set(1.0)
        et = jnp.concatenate([et, etp], axis=0)
        msh = jnp.concatenate([msh, jnp.zeros((pad, 1, Bh), jnp.float32)], 0)
        if nOv:
            em_ov = jnp.concatenate(
                [em_ov, jnp.zeros((pad, nOv, Bh, cmax), jnp.float32)], 0
            )

    interp = _interpret()
    cparams = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)
    nO = band_f.shape[0]
    nFf = len(plan_f["ov"]) if "ov" in plan_f else 0
    nFb = len(plan_b["ov"]) if "ov" in plan_b else 0

    fr3 = lambda i: (i, 0, 0)
    fr4 = lambda i: (i, 0, 0, 0)

    def dir_consts(band, Wt, ovw, pl_d, nF):
        out = [_const(tuple(band.shape)), _const(tuple(Wt.shape))]
        if nF:
            out.append(_const(tuple(ovw.shape)))
        out += [_const((RG, cmax)), _const((1, tail))]
        return out

    common_f = dir_consts(band_f, Wt_f, ovw_f, plan_f, nFf)
    common_b = dir_consts(band_b, Wt_b, ovw_b, plan_b, nFb)
    ops_f = (band_f, Wt_f) + ((ovw_f,) if nFf else ()) + (om, omt)
    ops_b = (band_b, Wt_b) + ((ovw_b,) if nFb else ()) + (om, omt)
    em_spec = pl.BlockSpec((1, RG, Bh), fr3, memory_space=pltpu.VMEM)
    et_spec = pl.BlockSpec((1, Bh, tail), fr3, memory_space=pltpu.VMEM)
    emov_spec = (
        [pl.BlockSpec((1, nOv, Bh, cmax), fr4, memory_space=pltpu.VMEM)]
        if nOv else []
    )

    def scr(plan):
        return [
            pltpu.VMEM((R, Gp, Bh, cmax), jnp.float32),
            pltpu.VMEM((Bh, tail), jnp.float32),
            pltpu.VMEM((R, Gp, Bh, cmax), jnp.float32),
            pltpu.VMEM(_tier_scratch(plan, Bh, cmax), jnp.float32),
        ]

    fwd_out = pl.pallas_call(
        _make_fwd_kernel(dict(plan_f), R, Gp, Bh, cmax, tail, finoff, K,
                         prec, R_u, nOv),
        grid=(Npad,),
        in_specs=common_f + [
            _const((RG, cmax)),
            _const((1, tail)),
            em_spec,
            et_spec,
        ] + emov_spec + [
            pl.BlockSpec((1, 1, Bh), fr3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RG, Bh, cmax), lambda i: (i // K, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bh, tail), lambda i: (i // K, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((Bh, 1)),
            _const((1, Bh)),
            _const((1, Bh)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, RG, Bh, cmax), jnp.float32),
            jax.ShapeDtypeStruct((C, Bh, tail), jnp.float32),
            jax.ShapeDtypeStruct((Bh, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, Bh), jnp.float32),
            jax.ShapeDtypeStruct((1, Bh), jnp.float32),
        ],
        scratch_shapes=scr(plan_f) + [
            pltpu.VMEM((1, Bh), jnp.float32),
            pltpu.VMEM((1, Bh), jnp.float32),
            pltpu.VMEM((1, Bh), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interp,
    )(*ops_f, al, alt, em, et, *((em_ov,) if nOv else ()), msh)
    bounds3, boundst, vfin, shift, ksum = fwd_out

    if not want_posts:
        return None, None, vfin[:, 0], shift[0], ksum[0]

    em_cm = em.reshape(C, K, RG, Bh)
    et_cm = et.reshape(C, K, Bh, tail)
    emov_cm = em_ov.reshape(C, K, nOv, Bh, cmax) if nOv else None

    recompute = pl.pallas_call(
        _make_recompute_kernel(dict(plan_f), R, Gp, Bh, cmax, tail, finoff,
                               prec, R_u, nOv),
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + common_f + [
            em_spec,
            et_spec,
        ] + emov_spec + [
            _const((RG, Bh, cmax)),
            _const((Bh, tail)),
        ],
        out_specs=[
            pl.BlockSpec((1, RG, Bh, cmax), fr4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bh, tail), fr3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, RG, Bh, cmax), jnp.float32),
            jax.ShapeDtypeStruct((K, Bh, tail), jnp.float32),
        ],
        scratch_shapes=scr(plan_f),
        compiler_params=cparams,
        interpret=interp,
    )

    rev4 = lambda i: (K - 1 - i, 0, 0, 0)
    rev3 = lambda i: (K - 1 - i, 0, 0)
    emov_rev_spec = (
        [pl.BlockSpec((1, nOv, Bh, cmax), rev4, memory_space=pltpu.VMEM)]
        if nOv else []
    )
    ovposts_out_spec = (
        [pl.BlockSpec((1, nOv, Bh, cmax), rev4, memory_space=pltpu.VMEM)]
        if nOv else []
    )
    ovposts_out_shape = (
        [jax.ShapeDtypeStruct((K, nOv, Bh, cmax), jnp.float32)]
        if nOv else []
    )
    bwd = pl.pallas_call(
        _make_bwd_kernel(dict(plan_b), R, Gp, Bh, cmax, tail, finoff, K,
                         prec, Npad, Gt, R_u, nOv, SPR),
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + common_b + [
            pl.BlockSpec((1, RG, Bh), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bh, tail), rev3, memory_space=pltpu.VMEM),
        ] + emov_rev_spec + [
            pl.BlockSpec((1, RG, Bh, cmax), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bh, tail), rev3, memory_space=pltpu.VMEM),
            _const((RG, Bh, cmax)),
            _const((Bh, tail)),
        ],
        out_specs=[
            pl.BlockSpec((1, SPR, Bh), rev3, memory_space=pltpu.VMEM),
        ] + ovposts_out_spec + [
            _const((RG, Bh, cmax)),
            _const((Bh, tail)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, SPR, Bh), jnp.float32),
        ] + ovposts_out_shape + [
            jax.ShapeDtypeStruct((RG, Bh, cmax), jnp.float32),
            jax.ShapeDtypeStruct((Bh, tail), jnp.float32),
        ],
        scratch_shapes=scr(plan_b),
        compiler_params=cparams,
        interpret=interp,
    )

    def chunk_step(carry, inp):
        bb3, bbt = carry
        if nOv:
            c, bound3_c, boundt_c, em_c, et_c, emov_c = inp
            emov_in = (emov_c,)
        else:
            c, bound3_c, boundt_c, em_c, et_c = inp
            emov_in = ()
        t0 = (c * K).astype(jnp.int32)[None]
        A3, At = recompute(t0, *ops_f, em_c, et_c, *emov_in,
                           bound3_c, boundt_c)
        outs = bwd(t0, *ops_b, em_c, et_c, *emov_in, A3, At, bb3, bbt)
        if nOv:
            posts_c, ovposts_c, bb3, bbt = outs
            return (bb3, bbt), (posts_c, ovposts_c)
        posts_c, bb3, bbt = outs
        return (bb3, bbt), (posts_c,)

    binit = (
        jnp.ones((RG, Bh, cmax), jnp.float32),
        jnp.ones((Bh, tail), jnp.float32),
    )
    xs = (jnp.arange(C), bounds3, boundst, em_cm, et_cm)
    if nOv:
        xs = xs + (emov_cm,)
    _, ys = lax.scan(chunk_step, binit, xs, reverse=True)
    posts = ys[0].reshape(Npad, SPR, Bh)
    ovposts = ys[1].reshape(Npad, nOv, Bh, cmax) if nOv else None
    return posts, ovposts, vfin[:, 0], shift[0], ksum[0]


def _stack_ovw(ov_w, ov_plans, cmax):
    """Stack a direction's overflow-family weight panels zero-padded to a
    common (nF, maxD, cmax) shape (per-family D stays static in the plan)."""
    if not ov_plans:
        return None
    maxD = max(p[4] for p in ov_plans)
    return jnp.stack([
        jnp.zeros((maxD, cmax), jnp.float32).at[: p[4]].set(
            w.astype(jnp.float32)
        )
        for p, w in zip(ov_plans, ov_w)
    ])


def block_fused_fb(cf, ext, mshift, want_posts, *, chunk=64):
    """Run the fused blocked scan.  ``ext``/``mshift`` from
    ops.pallas_scan.prepare_emissions ((Nf, P1, B) / (Nf, 1, B)).  Returns
    (posts (Npad, P1, B) or None, v_final (B,), shift (B,), ksum (B,)):
    logZ = log(v_final) + ksum·ln2 + shift."""
    W, R, plan_f, plan_b = _full_plan(cf)
    Sp = cf.padded_states
    tail = Sp - R * W
    fin = int(cf.final_state)
    if cf.pdf_group:
        cmax, lim = cf.pdf_group
        nOv = 0
    else:
        cmax, nOv = cf.ov_layout
    Gp = W // cmax
    RG = R * Gp
    Gt = tail // cmax
    P = cf.num_pdfs
    R_u = P // Gp if nOv else R
    SPR = RG + Gt
    Nf, P1, B = ext.shape
    Bh = min(B, _BH)
    # pad the batch to a whole number of kernel slices (padding sequences
    # carry all-zero emissions: alphas stay 0, guards keep divisions safe;
    # their outputs are trimmed below)
    Bp = -(-B // Bh) * Bh
    if Bp != B:
        ext = jnp.pad(ext, ((0, 0), (0, 0), (0, Bp - B)))
        mshift = jnp.pad(mshift, ((0, 0), (0, 0), (0, Bp - B)))

    st = (
        Sp, SPR, cmax, fin - R * W, W, R, tail,
        _Frozen(plan_f), _Frozen(plan_b), cf.precision, R_u, nOv,
    )
    a0 = jnp.exp(cf.alpha_hat).astype(jnp.float32)
    al = a0[: R * W].reshape(RG, cmax)
    alt = a0[R * W :][None, :]  # (1, tail)

    def band(op):
        if op.band_w is None:
            return jnp.zeros((1, RG, cmax), jnp.float32)
        return op.band_w[:, : R * W].reshape(-1, RG, cmax)

    om = cf.omega_prob[: R * W].reshape(RG, cmax)
    omt = cf.omega_prob[R * W :][None, :]
    ovw_f = _stack_ovw(cf.block_fwd.ov_w, plan_f.get("ov", ()), cmax)
    ovw_b = _stack_ovw(cf.block_bwd.ov_w, plan_b.get("ov", ()), cmax)

    # emission layout transforms (XLA, cheap): (Nf, P1, B) ->
    # em (Nf, RG, B) per main lane-group, et (Nf, B, tail) per tail slot;
    # overflow groups additionally stream a per-LANE block em_ov
    if nOv:
        em = jnp.concatenate(
            [ext[:, :P, :], jnp.ones((Nf, nOv, Bp), jnp.float32)], axis=1
        )
        et_src = jnp.broadcast_to(ext[:, P : P + 1, :], (Nf, Gt, Bp))
        lanepdf = cf.state_pdf[P * cmax : P * cmax + nOv * cmax]
        em_ov_full = jnp.transpose(
            jnp.take(ext, lanepdf, axis=1).reshape(Nf, nOv, cmax, Bp),
            (0, 1, 3, 2),
        )  # (Nf, nOv, Bp, cmax)
    else:
        em = ext[:, :RG, :]
        et_src = ext[:, RG : RG + Gt, :]
        em_ov_full = None
    et = jnp.transpose(jnp.repeat(et_src, cmax, axis=1), (0, 2, 1))

    wt_f = cf.block_fwd.tiers[0][2]
    wt_b = cf.block_bwd.tiers[0][2]
    if cf.precision == "bf16":
        # true-bf16 weight storage: halves the tier panels' VMEM
        # residency AND their per-frame read (see _make_matvec)
        wt_f = wt_f.astype(jnp.bfloat16)
        wt_b = wt_b.astype(jnp.bfloat16)

    posts_all, ovp_all, vfin_all, shift_all, ksum_all = [], [], [], [], []
    for b0 in range(0, Bp, Bh):
        sl = slice(b0, b0 + Bh)
        arrs = (
            band(cf.block_fwd), wt_f, ovw_f,
            band(cf.block_bwd), wt_b, ovw_b,
            om, omt, al, alt,
            em[:, :, sl], et[:, sl, :],
            em_ov_full[:, :, sl, :] if nOv else None,
            mshift[:, :, sl],
        )
        posts, ovposts, vfin, shift, ksum = _run_slice(
            arrs, st, want_posts, chunk
        )
        posts_all.append(posts)
        ovp_all.append(ovposts)
        vfin_all.append(vfin)
        shift_all.append(shift)
        ksum_all.append(ksum)

    vfin = jnp.concatenate(vfin_all)[:B]
    shift = jnp.concatenate(shift_all)[:B]
    ksum = jnp.concatenate(ksum_all)[:B]
    if not want_posts:
        return None, vfin, shift, ksum
    posts_rows = jnp.concatenate(posts_all, axis=2)[:, :, :B]
    if not nOv:
        return posts_rows, vfin, shift, ksum  # SPR == P1
    # assembly: uniform group rows ARE pdf rows; overflow group rows are
    # replaced by their lane-resolved posteriors scattered to each lane's
    # pdf; tail rows fold into the phony pdf row
    Npad = posts_rows.shape[0]
    ovposts = jnp.concatenate(ovp_all, axis=2)[:, :, :B, :]
    posts = jnp.zeros((Npad, P1, B), jnp.float32)
    posts = posts.at[:, :P, :].set(posts_rows[:, :P, :])
    posts = posts.at[:, P, :].set(
        jnp.sum(posts_rows[:, P + nOv :, :], axis=1)
    )
    ovp = jnp.swapaxes(ovposts, 2, 3).reshape(Npad, nOv * cmax, B)
    posts = posts.at[:, lanepdf, :].add(ovp)
    return posts, vfin, shift, ksum


class _Frozen(dict):
    """Hashable static plan dict for jit static args."""

    def __hash__(self):
        return hash(
            tuple(sorted((k, tuple(v) if isinstance(v, tuple) else v)
                         for k, v in self.items()))
        )


# ---------------------------------------------------------------------------
# fused tropical forward (Viterbi compressed-backpointer sweep)
# ---------------------------------------------------------------------------
#
# The tropical max-product matvec has no MXU analog, so this sweep is
# VPU-bound; under lax.scan XLA reaches only ~19% of the VPU roofline on it
# (measured 731 us/frame at the 2M shape, see bench stderr).  This kernel
# keeps operator + state VMEM-resident like the prob-domain scan and
# processes the tier in KC-block chunks: per chunk one broadcast
# multiply, one max-reduce (the value) and one equality/min-reduce pass
# (the uint8 candidate id), all over (KC, Bh, Sm, D) buffers with the
# 128-wide destination axis on the lanes.  Per frame it emits the merged
# band/tier candidate ids (uint8, same encoding as
# ops.blocked.block_matvec_max_arg: cand < Sm = tier source position,
# Sm+oi = band offset, 255 = no incoming mass) plus the rank-1 omega
# argmax, so the backtrace stays the trivial gather walk of
# viterbi._viterbi_scale_bp.

_VIT_KC = 8  # tier blocks per inner step (product stays fused, no scratch)


def _make_vit_kernel(plan, R, Gp, Bh, cmax, tail, finoff, prec, KC):
    offs = plan["band_offsets"]
    K, Sm, D = plan["K"], plan["Sm"], plan["D"]
    g, s = plan["g"], plan["s"]
    RG = R * Gp
    BIG = 2**30  # python int: a jnp scalar here would be a captured const

    def shift_rows(a, m):
        if m == 0:
            return a
        z = jnp.zeros((abs(m), Bh, cmax), jnp.float32)
        if m > 0:
            return jnp.concatenate([z, a[:-m]], axis=0)
        return jnp.concatenate([a[-m:], z], axis=0)

    def kernel(band_ref, W_ref, om_ref, omt_ref, al_ref, alt_ref,
               em_ref, et_ref, msh_ref,
               bp_ref, fin_ref, vfin_ref, shift_ref, ksum_ref,
               a4_scr, at_scr, y4_scr, c4_scr, yv_scr, cv_scr,
               sh_scr, co_scr, ks_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            a4_scr[:] = jnp.broadcast_to(
                al_ref[:].reshape(R, Gp, 1, cmax), (R, Gp, Bh, cmax)
            )
            at_scr[:] = jnp.broadcast_to(alt_ref[:], (Bh, tail))
            sh_scr[:] = jnp.zeros_like(sh_scr)
            co_scr[:] = jnp.zeros_like(co_scr)
            ks_scr[:] = jnp.zeros_like(ks_scr)

        a4 = a4_scr[:]
        at = at_scr[:]
        a_rg = a4.reshape(RG, Bh, cmax)

        # rank-1 omega transition into the phony final state: value +
        # argmax source (flat compiled-state id)
        omc = om_ref[:].reshape(RG, 1, cmax) * a_rg  # (RG, Bh, cmax)
        m1 = jnp.max(omc, axis=(0, 2))  # (Bh,)
        omt_c = omt_ref[:] * at  # (Bh, tail)
        m2 = jnp.max(omt_c, axis=1)
        fin_v = jnp.maximum(m1, m2)
        flat_main = (
            lax.broadcasted_iota(jnp.int32, (RG, Bh, cmax), 0) * cmax
            + lax.broadcasted_iota(jnp.int32, (RG, Bh, cmax), 2)
        )
        cand_main = jnp.min(
            jnp.where(omc == m1[None, :, None], flat_main, BIG), axis=(0, 2)
        )
        tail_ids = RG * cmax + lax.broadcasted_iota(
            jnp.int32, (Bh, tail), 1
        )
        cand_tail = jnp.min(
            jnp.where(omt_c == m2[:, None], tail_ids, BIG), axis=1
        )
        fin_arg = jnp.where(m1 >= m2, cand_main, cand_tail)  # (Bh,)

        # band families: value + candidate id (Sm + offset index)
        y = jnp.zeros((RG, Bh, cmax), jnp.float32)
        c = jnp.full((RG, Bh, cmax), 255, jnp.int32)
        for oi, off in enumerate(offs):
            prod_b = band_ref[oi][:, None, :] * shift_rows(a_rg, off // cmax)
            upd = prod_b > y
            y = jnp.where(upd, prod_b, y)
            c = jnp.where(upd, Sm + oi, c)
        y4_scr[:] = y.reshape(R, Gp, Bh, cmax)
        c4_scr[:] = c.reshape(R, Gp, Bh, cmax)

        # tier: chunked max-product with candidate recovery.  The product
        # is NOT materialized: both reductions consume the broadcast
        # multiply as a fused expression (a scratch round-trip measured
        # ~1.4x slower than XLA's fused variadic reduce; this version
        # keeps the elementwise producer inside each reduction loop).
        def chunk(q, _):
            ks = q * KC
            if g[0] == "row":
                _, g0, l0 = g
                Xc = a4_scr[pl.ds(ks, KC), g0, :, l0 : l0 + Sm]  # (KC,Bh,Sm)
            else:
                _, r0, g0 = g
                # col gather: sources are a lane column across Sm rows —
                # stage through a transpose of the (Sm, Bh) slab per k
                Xc = jnp.transpose(
                    a4_scr[r0 : r0 + Sm, g0, :, pl.ds(ks, KC)], (2, 1, 0)
                )  # (KC, Bh, Sm)
            Wc = W_ref[pl.ds(ks, KC)]  # (KC, Sm, D)
            Xc4 = Xc[:, :, :, None]
            Wc4 = Wc[:, None, :, :]
            ym = jnp.max(Xc4 * Wc4, axis=2)  # (KC, Bh, D)
            am = jnp.min(
                jnp.where(
                    Xc4 * Wc4 == ym[:, :, None, :],
                    lax.broadcasted_iota(jnp.int32, (KC, Bh, Sm, D), 2),
                    BIG,
                ),
                axis=2,
            )  # (KC, Bh, D)
            yv_scr[pl.ds(ks, KC)] = ym
            cv_scr[pl.ds(ks, KC)] = am
            return 0

        lax.fori_loop(0, K // KC, chunk, 0)

        # merge tier results into the band values (strict > keeps 255 on
        # zero columns: a zero-weight padding product never wins)
        if s[0] == "col":
            _, r0s, g0s = s
            yT = jnp.transpose(yv_scr[:], (2, 1, 0))  # (D, Bh, K=cmax)
            cT = jnp.transpose(cv_scr[:], (2, 1, 0))
            slab = y4_scr[r0s : r0s + D, g0s, :, :]
            cslab = c4_scr[r0s : r0s + D, g0s, :, :]
            upd = yT > slab
            y4_scr[r0s : r0s + D, g0s, :, :] = jnp.where(upd, yT, slab)
            c4_scr[r0s : r0s + D, g0s, :, :] = jnp.where(upd, cT, cslab)
        else:
            _, gs, ls = s
            slab = y4_scr[0:K, gs, :, ls : ls + D]
            cslab = c4_scr[0:K, gs, :, ls : ls + D]
            yv = yv_scr[:]
            cv = cv_scr[:]
            upd = yv > slab
            y4_scr[0:K, gs, :, ls : ls + D] = jnp.where(upd, yv, slab)
            c4_scr[0:K, gs, :, ls : ls + D] = jnp.where(upd, cv, cslab)

        # omega row into the tail (phony final column), t=0 override,
        # emission multiply, exact power-of-two rescale
        pt_cols = [fin_v[:, None]]
        if finoff > 0:
            pt_cols.insert(0, jnp.zeros((Bh, finoff), jnp.float32))
        if tail - finoff - 1 > 0:
            pt_cols.append(jnp.zeros((Bh, tail - finoff - 1), jnp.float32))
        yt = (jnp.concatenate(pt_cols, axis=1)
              if len(pt_cols) > 1 else pt_cols[0])
        t_is_zero = i == 0
        p4 = jnp.where(t_is_zero, a4, y4_scr[:])
        pt = jnp.where(t_is_zero, at, yt)
        e4 = em_ref[0].reshape(R, Gp, Bh)[:, :, :, None]
        y4e = p4 * e4
        yte = pt * et_ref[0]
        m = _maxall(y4e, yte)
        k = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
        sc = jnp.exp2(-k)
        a4_scr[:] = y4e * sc[None, None, :, None]
        at_scr[:] = yte * sc[:, None]
        kt = ks_scr[:] + k[None, :]
        ks_scr[:] = kt
        x = msh_ref[0]
        ss = sh_scr[:]
        co = co_scr[:]
        xc = x - co
        t = ss + xc
        sh_scr[:] = t
        co_scr[:] = (t - ss) - xc

        bp_ref[0] = c4_scr[:].reshape(RG, Bh, cmax).astype(jnp.uint8)
        fin_ref[0, 0] = fin_arg

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            vfin_ref[:] = at_scr[:, finoff : finoff + 1]
            shift_ref[:] = t
            ksum_ref[:] = kt

    return kernel


def vit_scan_supported(cf, B: int) -> bool:
    """Fused tropical sweep gate: the fused-fb predicates plus uint8
    candidate range, no general-C (the kernel's emission broadcast assumes
    one pdf per state), and the Viterbi kernel's OWN scratch budget — it
    allocates substantially more VMEM than the fwd-bwd kernel (an int32
    candidate state c4 on top of the f32 state/scratch pair, plus the
    (K, Bh, D) f32/int32 chunk buffers), so a graph the fb gate admits near
    its 110 MB line can still blow the 126 MB vmem_limit here."""
    if block_scan_reject_reason(cf, B) is not None:
        return False
    plan = _full_plan(cf)
    W, R, pf, pb_ = plan
    if pf.get("ov") or getattr(cf, "ov_layout", ()):
        # the tropical sweep has no overflow-family support yet — the
        # chunk-recompute decoder covers those graphs
        return False
    nO = len(pf["band_offsets"])
    if pf["Sm"] + nO >= 255:
        return False
    if not (pf["K"] % _VIT_KC == 0 or pf["K"] < _VIT_KC):
        return False
    Bh = min(B, _BH)
    state = R * W * Bh * 4
    Wt = cf.block_fwd.tiers[0][2]
    # fb estimate (block_scan_reject_reason) + c4_scr (int32 state) +
    # yv/cv chunk buffers, minus nothing (the bp stream is HBM-resident)
    need = (2 * state + 2 * state + Wt.size * 4 + 1.5 * state + 4e6
            + state + 2 * pf["K"] * Bh * pf["D"] * 4)
    return need <= 110 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("st",))
def _run_vit_slice(arrs, st):
    """One <=64-sequence batch slice of the fused tropical sweep.  Returns
    (bps (Npad, RG, Bh, cmax) uint8, fins (Npad, Bh) int32, vfin (Bh,),
    shift (Bh,), ksum (Bh,))."""
    (band_f, Wt_f, om, omt, al, alt, em, et, msh) = arrs
    (Sp, P1, cmax, finoff, W, R, tail, plan_f, prec) = st
    Gp = W // cmax
    RG = R * Gp
    Nf, _, Bh = em.shape
    K = plan_f["K"]
    KC = min(_VIT_KC, K)

    interp = _interpret()
    cparams = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)
    nO = band_f.shape[0]
    Sm, D = plan_f["Sm"], plan_f["D"]

    fr3 = lambda i: (i, 0, 0)

    bps, fins, vfin, shift, ksum = pl.pallas_call(
        _make_vit_kernel(dict(plan_f), R, Gp, Bh, cmax, tail, finoff, prec,
                         KC),
        grid=(Nf,),
        in_specs=[
            _const((nO, RG, cmax)),
            _const((K, Sm, D)),
            _const((RG, cmax)),
            _const((1, tail)),
            _const((RG, cmax)),
            _const((1, tail)),
            pl.BlockSpec((1, RG, Bh), fr3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bh, tail), fr3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bh), fr3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RG, Bh, cmax), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bh), fr3, memory_space=pltpu.VMEM),
            _const((Bh, 1)),
            _const((1, Bh)),
            _const((1, Bh)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Nf, RG, Bh, cmax), jnp.uint8),
            jax.ShapeDtypeStruct((Nf, 1, Bh), jnp.int32),
            jax.ShapeDtypeStruct((Bh, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, Bh), jnp.float32),
            jax.ShapeDtypeStruct((1, Bh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, Gp, Bh, cmax), jnp.float32),
            pltpu.VMEM((Bh, tail), jnp.float32),
            pltpu.VMEM((R, Gp, Bh, cmax), jnp.float32),
            pltpu.VMEM((R, Gp, Bh, cmax), jnp.int32),
            pltpu.VMEM((K, Bh, D), jnp.float32),
            pltpu.VMEM((K, Bh, D), jnp.int32),
            pltpu.VMEM((1, Bh), jnp.float32),
            pltpu.VMEM((1, Bh), jnp.float32),
            pltpu.VMEM((1, Bh), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interp,
    )(band_f, Wt_f, om, omt, al, alt, em, et, msh)
    return bps, fins[:, 0, :], vfin[:, 0], shift[0], ksum[0]


def block_fused_viterbi_fwd(cf, ext, mshift):
    """Fused tropical forward over all batch slices.  ``ext``/``mshift``
    from ops.pallas_scan.prepare_emissions.  Returns (bps (Nf, R*W, B)
    uint8 — candidate ids in block_matvec_max_arg's encoding for the MAIN
    state region [0, R*W) — fins (Nf, B) int32 flat omega-argmax ids,
    v_final (B,), shift (B,), ksum (B,))."""
    plan = _full_plan(cf)
    W, R, plan_f, _ = plan
    Sp = cf.padded_states
    tail = Sp - R * W
    fin = int(cf.final_state)
    cmax, lim = cf.pdf_group
    Gp = W // cmax
    RG = R * Gp
    Gt = tail // cmax
    Nf, P1, B = ext.shape
    Bh = min(B, _BH)
    Bp = -(-B // Bh) * Bh
    if Bp != B:
        ext = jnp.pad(ext, ((0, 0), (0, 0), (0, Bp - B)))
        mshift = jnp.pad(mshift, ((0, 0), (0, 0), (0, Bp - B)))

    st = (Sp, P1, cmax, fin - R * W, W, R, tail, _Frozen(plan_f),
          cf.precision)
    a0 = jnp.exp(cf.alpha_hat).astype(jnp.float32)
    al = a0[: R * W].reshape(RG, cmax)
    alt = a0[R * W :][None, :]

    def band(op):
        if op.band_w is None:
            return jnp.zeros((1, RG, cmax), jnp.float32)
        return op.band_w[:, : R * W].reshape(-1, RG, cmax)

    om = cf.omega_prob[: R * W].reshape(RG, cmax)
    omt = cf.omega_prob[R * W :][None, :]
    em = ext[:, :RG, :]
    et = jnp.transpose(
        jnp.repeat(ext[:, RG : RG + Gt, :], cmax, axis=1), (0, 2, 1)
    )

    bps_all, fins_all, vfin_all, shift_all, ksum_all = [], [], [], [], []
    for b0 in range(0, Bp, Bh):
        sl = slice(b0, b0 + Bh)
        arrs = (
            band(cf.block_fwd), cf.block_fwd.tiers[0][2],
            om, omt, al, alt,
            em[:, :, sl], et[:, sl, :], mshift[:, :, sl],
        )
        bps, fins, vfin, shift, ksum = _run_vit_slice(arrs, st)
        # (Nf, RG, Bh, cmax) -> (Nf, R*W, Bh) flat main-region state ids
        bps_all.append(
            jnp.transpose(bps, (0, 1, 3, 2)).reshape(Nf, R * W, Bh)
        )
        fins_all.append(fins)
        vfin_all.append(vfin)
        shift_all.append(shift)
        ksum_all.append(ksum)

    bps = jnp.concatenate(bps_all, axis=2)[:, :, :B]
    fins = jnp.concatenate(fins_all, axis=1)[:, :B]
    vfin = jnp.concatenate(vfin_all)[:B]
    shift = jnp.concatenate(shift_all)[:B]
    ksum = jnp.concatenate(ksum_all)[:B]
    return bps, fins, vfin, shift, ksum
