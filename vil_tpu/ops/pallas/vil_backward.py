"""Pallas backward kernels for the fused 2-D sliding-chunk attention.

Two implementations, selected by VMEM footprint (mirroring the forward's
whole-image / row-grid split):

FUSED WHOLE-IMAGE (v7, preferred): grid (B,) — the entire per-image
  Q/K/V/G is VMEM-resident, rows are unrolled statically. For each query
  row i the kernel recomputes scores exactly like the forward v7 (global
  K rows ride the main GEMM as the tail of the neighborhood concat), forms
      dP = g·[V_nbh ‖ vg]ᵀ,   dS = P ⊙ (dP − rowsum(dP ⊙ P)),
      dQ[i] = dS·[K_nbh ‖ kg]   (one GEMM, global term included),
  and scatters the transposed dK/dV contributions of its 9 neighbor blocks
  into per-row VMEM accumulators ((i+dx) % mx, column roll −dy). P and dS
  NEVER touch HBM — the v6 two-pass design wrote a (B, mx, H, my, W², 9W²)
  stash and re-read it 3×, ~4 GB of HBM traffic per stage-1 step at
  batch 64. dbias accumulates in-kernel across the grid in TAIL order
  (local ‖ global), so no dbias epilogue reduction is needed; only the tiny
  normalized P_glo/dS_glo columns are emitted for the dK_glo/dV_glo XLA
  epilogue einsums.

TWO-PASS (v6, fallback for shapes whose image doesn't fit VMEM):
  pass 1 (grid (B, mx)): recompute scores/probs for row i (the same
      3-row K/V neighborhood as the forward), form dP/dS,
      emit dQ[i] = dS·[kg ‖ K_nbh] and STORE P, dS (these are the only
      saved intermediates — never the reference's autograd graph of 9
      rolled copies).
  XLA epilogue: dbias / d(k_glo) / d(v_glo) are plain reductions over the
      stored P/dS — a few einsums.
  pass 2 (grid (B, mx)): dK[i] and dV[i] gather the transposed
      contributions from the three neighboring query rows:
          dK[r, c] = Σ_{(dx,dy)} (dS[r−dx, (c−dy)%my]^T · q[r−dx, (c−dy)%my])
      realized with 3-row BlockSpecs over the stored dS/P and q/g plus
      static column rolls — no scatter, no atomics.

The column order of a stored block (dx, dy) is the forward's
NEIGHBOR_OFFSETS order; the inverse gather re-indexes block (dx, dy) at row
r−dx with column roll −dy (mirroring the reference's hand-written
``slidingchunk_agrad`` inverse rolls, slidingchunk_2d.py:133-200).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masks import NEIGHBOR_OFFSETS

INTERPRET = False

# whole-image fused backward must fit its VMEM estimate under this budget
# (the pallas_call requests a 100 MB scope, which v5e grants as ~110 MB;
# stage-1 ViL-Small 224 bf16 measures ~100 MB and runs — and beats the
# two-pass fallback 9.0 vs 10.5 ms at batch 64, 1.3 vs 3.4 ms at stage 2).
# Tests monkeypatch to 0 to force the two-pass variant (and to a huge value
# to force whole-image).
WHOLE_IMAGE_VMEM_BYTES = 100 * 2**20

# wide (my, 9W², M) dK/dV GEMMs + static sublane slices vs 9 small per-block
# GEMMs in the whole-image kernel. None = auto (always wide: the 49-row
# per-block GEMMs waste most of each MXU tile — measured stage-1
# 9.03 → 5.79 ms and stage-2 2.40 → 1.40 ms at batch 64).
# True/False force one variant for A/B timing.
WIDE_DKDV = None

# testing/benchmark knob: force the super-row tiled backward with this many
# rows per tile (must divide mx). None = automatic selection by VMEM fit.
FORCE_TILE_T = None

# testing/benchmark knob: force the LOOP-rolled whole-image backward
# (_bwd_kernel_img_loop) on (True) or off (False). None = automatic: used
# when the unrolled whole-image estimate exceeds the budget but the loop
# estimate fits (e.g. 14×14-chunk 384² grids).
FORCE_BWD_LOOP = None

# head-PAIR GEMM merging in the fused kernels. The per-head GEMMs contract
# K = W² = 49 (dK/dV) or K = M = 32 (scores/dP) with N = 32 — under 10% of a
# 128×128 MXU tile. Processing two heads at once with a block-diagonal
# stacked operand (rows 2W², lanes 2M — zeros separate the heads) doubles K
# and N: half the MXU macro-passes for even-H stages at 2× the (mostly
# padding) MACs. None = auto (pair whenever 2·M ≤ 128 lanes and H ≥ 2);
# True/False force one variant for A/B timing.
PAIR_HEADS = None


def _score_dtype(dtype):
    """Score-tensor dtype for the recompute GEMMs (vil_kernel.score_dtype —
    bf16 under VIL_TPU_BF16_SCORES for bf16 inputs, else f32)."""
    from . import vil_kernel

    return vil_kernel.score_dtype(dtype)


def _probs_lse(scores, lse_row, dtype):
    """Normalized probabilities p = exp(scores − L) from the stashed LSE.

    bf16 kernels run the exp on bf16 inputs (vil_kernel.BF16_EXP, default
    on): the packed-bf16 VPU exp runs at 2× the f32 rate and the result
    feeds the dV GEMM with no separate convert pass (inference headline
    +17% from the same trick in the forward); f32 consumers (dS math)
    promote inline. scores−L ∈ (−inf, 0]; mass sits near 0 where bf16's
    absolute error is ~1e-3, and p was already rounded to bf16 for the
    MXU either way."""
    from . import vil_kernel

    # FAST_MAX applies only to the non-LSE (inference) forward, so every
    # stashed LSE comes from an exact max and z ≤ 0 unconditionally
    z = scores - lse_row[..., None]
    if vil_kernel.BF16_EXP and dtype == jnp.bfloat16:
        return jnp.exp(z.astype(jnp.bfloat16))
    return jnp.exp(z)


def _probs_softmax(scores, dtype):
    """Normalized probabilities via max-sub softmax (no-LSE fallback);
    same bf16-exp policy as _probs_lse."""
    from . import vil_kernel

    m = jnp.max(scores, axis=-1, keepdims=True)
    if vil_kernel.BF16_EXP and dtype == jnp.bfloat16:
        e = jnp.exp((scores - m).astype(jnp.bfloat16))
        den = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        return e * (1.0 / den).astype(jnp.bfloat16)
    e = jnp.exp(scores - m)
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


def _head_groups(H: int, M: int):
    """Static head-processing groups: pairs (+ a trailing singleton when H
    is odd) under PAIR_HEADS auto/True, else one group per head."""
    pair = PAIR_HEADS
    if pair is None:
        pair = H >= 2 and 2 * M <= 128
    if not pair:
        return tuple((h,) for h in range(H))
    groups = [(h, h + 1) for h in range(0, H - 1, 2)]
    if H % 2:
        groups.append((H - 1,))
    return tuple(groups)


def _stack_bd(x, M: int):
    """(my, W², 2M) → block-diagonal (my, 2W², 2M): row block j keeps lane
    block j, zeros elsewhere — the merged-pair GEMM operand."""
    z = jnp.zeros(x.shape[:2] + (M,), x.dtype)
    top = jnp.concatenate([x[..., :M], z], axis=-1)
    bot = jnp.concatenate([z, x[..., M:]], axis=-1)
    return jnp.concatenate([top, bot], axis=1)


def pair_comb_tables(comb, groups, H: int):
    """Pre-stack the combined bias+mask class table per head-group.

    ``comb`` (Hc, ncls, my, W², cols) from vil_kernel.build_comb. Returns the
    kernel's table operands in group order: a pair table (Pc, ncls, my, 2W²,
    cols) — the two heads' rows stacked on the query axis, matching the
    merged GEMM's head-major row blocks — when pairs exist (+ a singleton
    table for a trailing odd head), else just ``comb``."""
    n_pair = sum(1 for g_ in groups if len(g_) == 2)
    tables = []
    if n_pair:
        if comb.shape[0] == 1:
            tables.append(jnp.concatenate([comb, comb], axis=3))
        else:
            tables.append(jnp.stack([
                jnp.concatenate([comb[g_[0]], comb[g_[1]]], axis=2)
                for g_ in groups if len(g_) == 2
            ]))
        if H % 2:  # trailing odd head keeps a singleton table
            tables.append(comb if comb.shape[0] == 1 else comb[H - 1:])
    else:
        tables.append(comb)
    return tables


def _roll0(r, s):
    """Static cyclic roll along axis 0: out[c] = r[(c+s) % n]."""
    n = r.shape[0]
    s = s % n
    if s == 0 or n == 1:
        return r
    return jnp.concatenate([r[s:], r[:s]], axis=0)


def _nbh(rows, my):
    """3 × (my, W2, C) rows → (my, 9W2, C), forward neighbor order."""
    parts = []
    for dx, dy in NEIGHBOR_OFFSETS:
        parts.append(_roll0(rows[dx + 1], dy) if my > 1 else rows[dx + 1])
    return jnp.concatenate(parts, axis=1)


def _bwd_kernel_img(nglo, w2, mx, my, H, groups, has_bias, with_lse,
                    class_of, halo, *refs):
    """Fused whole-image backward (grid (B,)). refs:
    [q, k, v, g, (kg_row, vg_row)?, comb-tables | ((bias_tail)?, mask_tail),
     (lse)?, dq, dk, dv, (dkg, dvg)?, (dbias_tail)?].

    ``class_of`` (length-mx tuple of static ints): when present, the bias and
    mask inputs are replaced by combined row-class tables — see
    vil_kernel.build_comb — and the per-group score adjustment is a single
    VPU add. With head PAIRS in ``groups`` the tables arrive pre-stacked:
    ``combp`` (Pc, ncls, my, 2W², cols) for the pairs (+ ``combs`` for a
    trailing odd head); without pairing just ``combs`` = (Hc, ncls, ...).

    ``groups`` (static tuple of 1- or 2-head tuples, see _head_groups):
    pairs are processed through ONE set of merged GEMMs with block-diagonal
    stacked operands (_stack_bd) — rows 2W², contraction/lane widths 2M —
    which halves the MXU macro-passes of the K=49/N=32-starved per-head
    GEMMs; the zero blocks keep the heads' sums separated exactly.

    kg_row/vg_row are the global K/V rows pre-broadcast over my XLA-side
    ((1, my, Nglo, C) — in-kernel broadcast lowers to an unsupported Mosaic
    gather, see vil_kernel._nbh_rows) and appended as the TAIL of the
    neighborhood concats, so the score and dP GEMMs produce the global
    columns together with the local ones (forward-v7 layout). mask/bias are
    in the same tail order. dK/dV accumulate in f32 VMEM values across the
    statically-unrolled row loop; dbias accumulates across the batch grid in
    a constant-index output block.

    ``halo`` (spatial / sequence parallelism, parallel/spatial.py): k/v and
    dk/dv carry mx+2 chunk rows (±1 ppermute halos), the row loop reads
    [i, i+1, i+2] with NO cyclic wrap, and the comb row class is a TRACED
    per-row index (an extra (mx,) int32 SMEM ref directly after the comb
    tables) — SPMD shards of one program hold different slices of the
    global mask, so the static class_of lookup is unavailable (class_of
    must be None)."""
    n_pair = sum(1 for grp in groups if len(grp) == 2)
    n_single = sum(1 for grp in groups if len(grp) == 1)
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    g_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    bias_tail = mask_ref = combp_ref = combs_ref = rc_ref = None
    use_comb = class_of is not None or halo
    if use_comb:
        if n_pair:
            combp_ref = refs[i]; i += 1
        if n_single:
            combs_ref = refs[i]; i += 1
        if halo:
            rc_ref = refs[i]; i += 1  # (mx,) int32 SMEM: traced row classes
    else:
        if has_bias:
            bias_tail = refs[i]; i += 1
        mask_ref = refs[i]; i += 1
    lse_ref = None
    if with_lse:
        lse_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    dk_ref = refs[i]; i += 1
    dv_ref = refs[i]; i += 1
    dkg_ref = dvg_ref = None
    if nglo > 0:
        dkg_ref = refs[i]; i += 1  # (1, Nglo, C) f32 per-image outputs
        dvg_ref = refs[i]; i += 1
    dbias_ref = None
    if has_bias:
        dbias_ref = refs[i]; i += 1

    b_idx = pl.program_id(0)
    C = q_ref.shape[-1]
    M = C // H
    nloc = 9 * w2
    nG = len(groups)

    from .vil_kernel import _nbh_rows

    n_rows_out = mx + 2 if halo else mx
    dk_acc = [[None] * nG for _ in range(n_rows_out)]
    dv_acc = [[None] * nG for _ in range(n_rows_out)]
    db_acc = [None] * H
    # dK_glo/dV_glo accumulate IN-KERNEL (r2): the former pg/dS_glo HBM
    # outputs fed XLA einsums whose batch-minor reduce layouts materialized
    # f32 relayout copies of the whole q/g tensors (~1.4 ms/step at stage 1,
    # train profile copy.834/copy.993 class)
    dkg_acc = [[None] * nG for _ in range(nglo)]
    dvg_acc = [[None] * nG for _ in range(nglo)]

    # pair-stacked bias rows, hoisted out of the row loop (mask path only —
    # the comb tables arrive pre-stacked)
    bias_grp = [None] * nG
    if bias_tail is not None:
        for gidx, grp in enumerate(groups):
            bias_grp[gidx] = (
                jnp.concatenate([bias_tail[grp[0]], bias_tail[grp[1]]], axis=0)
                if len(grp) == 2 else bias_tail[grp[0]]
            )

    for i_row in range(mx):
        if halo:
            k_rows = [k_ref[0, i_row + dx + 1] for dx in (-1, 0, 1)]
            v_rows = [v_ref[0, i_row + dx + 1] for dx in (-1, 0, 1)]
        else:
            k_rows = [k_ref[0, (i_row + dx) % mx] for dx in (-1, 0, 1)]
            v_rows = [v_ref[0, (i_row + dx) % mx] for dx in (-1, 0, 1)]
        rc = rc_ref[i_row] if halo else (
            class_of[i_row] if class_of is not None else None
        )
        k_nbh = _nbh_rows(k_rows, my, kg_row)  # (my, 9W²+Nglo, C)
        v_nbh = _nbh_rows(v_rows, my, vg_row)
        q_row = q_ref[0, i_row]  # (my, W², C)
        g_row = g_ref[0, i_row]
        mask = mask2 = None
        if mask_ref is not None:
            mask = mask_ref[i_row]  # (my, W², 9W²+Nglo) f32, tail order
            if n_pair:
                mask2 = jnp.concatenate([mask, mask], axis=1)
        for gidx, grp in enumerate(groups):
            G = len(grp)
            hs = grp[0] * M
            gm = G * M
            q_g = q_row[..., hs : hs + gm]
            k_g = k_nbh[..., hs : hs + gm].astype(q_g.dtype)
            v_g = v_nbh[..., hs : hs + gm].astype(q_g.dtype)
            g_g = g_row[..., hs : hs + gm]
            if G == 2:
                q_in = _stack_bd(q_g, M)  # (my, 2W², 2M) block-diagonal
                g_in = _stack_bd(g_g, M)
            else:
                q_in, g_in = q_g, g_g
            scores = jax.lax.dot_general(
                q_in, k_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(_score_dtype(q_g.dtype))
            # (my, G·W², cols) — bf16 under BF16_SCORES via an epilogue cast
            # (Mosaic requires a 32-bit matmul acc), matching the forward's
            # rounding so the recomputed probs stay consistent
            if use_comb:
                # combined bias+mask class table: one add (vil_kernel
                # build_comb); rc is static via the unrolled row loop, or a
                # traced SMEM read under halo (spatial sharding)
                if G == 2:
                    scores = scores + combp_ref[
                        gidx if combp_ref.shape[0] > 1 else 0, rc
                    ]
                else:
                    # singleton-group index: equals grp[0] when pairing is
                    # off (full table), else 0 (one trailing odd head)
                    scores = scores + combs_ref[
                        grp[0] if combs_ref.shape[0] > 1 else 0, rc
                    ]
            else:
                if bias_tail is not None:
                    scores = scores + bias_grp[gidx][None]
                scores = scores + (mask2 if G == 2 else mask)
            if lse_ref is not None:
                # forward-stashed log-sum-exp: normalized probs in ONE exp
                # pass (the max/sum/divide recompute is skipped; masked
                # columns still underflow exp to exactly 0)
                if G == 2:
                    lse_row = jnp.concatenate(
                        [lse_ref[0, grp[0], i_row], lse_ref[0, grp[1], i_row]],
                        axis=1,
                    )  # (my, 2W²), head-major rows like the scores
                else:
                    lse_row = lse_ref[0, grp[0], i_row]
                p = _probs_lse(scores, lse_row, q_g.dtype)
            else:
                p = _probs_softmax(scores, q_g.dtype)
            dp = jax.lax.dot_general(
                g_in, v_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (my, G·W², cols) — global columns included (vg in the concat)
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - delta)
            ds_c = ds.astype(q_g.dtype)
            # dQ = dS · [K_nbh ‖ kg] in ONE GEMM (global term included);
            # for a pair the off-diagonal lane blocks are cross-head garbage
            # and only the diagonal (row block j, lane block j) is written
            dq_out = jax.lax.dot_general(
                ds_c, k_g, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (my, G·W², G·M)
            for j, h in enumerate(grp):
                dq_ref[0, i_row, :, :, h * M : (h + 1) * M] = dq_out[
                    :, j * w2 : (j + 1) * w2, j * M : (j + 1) * M
                ].astype(dq_ref.dtype)
            if has_bias:
                db = jnp.sum(ds, axis=0)  # (G·W², cols) f32, tail order
                for j, h in enumerate(grp):
                    dbj = db[j * w2 : (j + 1) * w2]
                    db_acc[h] = dbj if db_acc[h] is None else db_acc[h] + dbj
            p_c = p.astype(q_g.dtype)
            # transposed per-block contributions: query row i's block
            # (dx, dy) feeds dK/dV row (i+dx) with column roll −dy. ONE wide
            # (my, 9W²+Nglo, G·M) GEMM per tensor (9 separate 49-row GEMMs
            # waste ~60% of each 128-row MXU tile), then static sublane
            # slices. The GLOBAL columns ride the SAME GEMMs: output area
            # grows by Nglo/9W² (~0.2%) and dK_glo/dV_glo become a (my, M)
            # slice + reduce — the per-glo-column VPU broadcast-mul-reduce
            # alternative ((my, W², 1)-shaped, 1/128-lane) measured +0.8 ms
            # on the stage-1 kernel (6.47 vs 5.69 ms).
            wide = G == 2 or (WIDE_DKDV if WIDE_DKDV is not None else True)
            if wide:
                dk_wide = jax.lax.dot_general(
                    ds_c, q_in, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (my, 9W²+Nglo, G·M) — block-diag q_in separates heads
                dv_wide = jax.lax.dot_general(
                    p_c, g_in, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                for gi in range(nglo):
                    # 3-D slice keeps the reduce on the UNTILED major (my)
                    # axis — a 2-D slice would put my on sublanes at the
                    # glo row's nonzero sublane offset, which Mosaic's
                    # multi_reduction rejects
                    g0 = nloc + gi
                    dkg_c = jnp.sum(
                        dk_wide[:, g0 : g0 + 1, :], axis=0
                    )  # (1, G·M)
                    dvg_c = jnp.sum(dv_wide[:, g0 : g0 + 1, :], axis=0)
                    dkg_acc[gi][gidx] = (
                        dkg_c if dkg_acc[gi][gidx] is None
                        else dkg_acc[gi][gidx] + dkg_c
                    )
                    dvg_acc[gi][gidx] = (
                        dvg_c if dvg_acc[gi][gidx] is None
                        else dvg_acc[gi][gidx] + dvg_c
                    )
            else:
                for gi in range(nglo):
                    gcol = nloc + gi
                    # A/B fallback: per-glo-column broadcast-mul-reduce
                    dkg_c = jnp.sum(
                        ds[..., gcol : gcol + 1] * q_g.astype(jnp.float32),
                        axis=0,
                    )
                    dkg_c = jnp.sum(dkg_c, axis=0, keepdims=True)  # (1, M)
                    dvg_c = jnp.sum(
                        p[..., gcol : gcol + 1] * g_g.astype(jnp.float32),
                        axis=0,
                    )
                    dvg_c = jnp.sum(dvg_c, axis=0, keepdims=True)
                    dkg_acc[gi][gidx] = (
                        dkg_c if dkg_acc[gi][gidx] is None
                        else dkg_acc[gi][gidx] + dkg_c
                    )
                    dvg_acc[gi][gidx] = (
                        dvg_c if dvg_acc[gi][gidx] is None
                        else dvg_acc[gi][gidx] + dvg_c
                    )
            for bi, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
                c0 = bi * w2
                if wide:
                    dk_c = dk_wide[:, c0 : c0 + w2, :]
                    dv_c = dv_wide[:, c0 : c0 + w2, :]
                else:
                    dk_c = jax.lax.dot_general(
                        ds_c[:, :, c0 : c0 + w2], q_g,
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # (my, W², M)
                    dv_c = jax.lax.dot_general(
                        p_c[:, :, c0 : c0 + w2], g_g,
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                if my > 1:
                    dk_c = _roll0(dk_c, -dy)
                    dv_c = _roll0(dv_c, -dy)
                r = (i_row + dx + 1) if halo else (i_row + dx) % mx
                dk_acc[r][gidx] = (
                    dk_c if dk_acc[r][gidx] is None else dk_acc[r][gidx] + dk_c
                )
                dv_acc[r][gidx] = (
                    dv_c if dv_acc[r][gidx] is None else dv_acc[r][gidx] + dv_c
                )

    for r in range(n_rows_out):
        dk_ref[0, r] = jnp.concatenate(
            [a.astype(dk_ref.dtype) for a in dk_acc[r]], axis=-1
        )
        dv_ref[0, r] = jnp.concatenate(
            [a.astype(dv_ref.dtype) for a in dv_acc[r]], axis=-1
        )
    for gi in range(nglo):
        dkg_ref[0, gi : gi + 1] = jnp.concatenate(dkg_acc[gi], axis=-1)
        dvg_ref[0, gi : gi + 1] = jnp.concatenate(dvg_acc[gi], axis=-1)
    if has_bias:
        for h in range(H):
            @pl.when(b_idx == 0)
            def _(h=h):
                dbias_ref[h] = db_acc[h]

            @pl.when(b_idx != 0)
            def _(h=h):
                dbias_ref[h] += db_acc[h]


def _pass1_kernel(nglo, w2, my, H, has_bias, *refs):
    """refs: [q, k×3, v×3, g, (sg_row, dpg_row)?, (bias_loc)?, mask,
    dq, p_out, ds_out, (pg_out, dsg_out)?, (dbias_loc)?].

    Same layout discipline as the forward v6: global score/dP columns are
    PRECOMPUTED outside the kernel (cheap XLA einsums) and appended at the
    TAIL of the wide score tensors, so every in-kernel op runs at full lane
    width — no (my, W², 1)-shaped VPU work. The stash holds LOCAL columns
    only (pass 2 reads lane-offset-0 blocks); the tiny normalized pg / dSg
    tensors are emitted as separate small outputs and the global grads
    (dK_glo/dV_glo/dQ_glo/dbias_glo) become small XLA epilogue einsums.
    dbias_loc still accumulates in-kernel across the whole grid."""
    i = 0
    q_ref = refs[i]; i += 1
    k_refs = refs[i : i + 3]; i += 3
    v_refs = refs[i : i + 3]; i += 3
    g_ref = refs[i]; i += 1
    sg_ref = dpg_ref = None
    if nglo > 0:
        sg_ref = refs[i]; i += 1
        dpg_ref = refs[i]; i += 1
    bias_loc_ref = None
    if has_bias:
        bias_loc_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    p_ref = refs[i]; i += 1
    ds_ref = refs[i]; i += 1
    pg_ref = dsg_ref = None
    if nglo > 0:
        pg_ref = refs[i]; i += 1
        dsg_ref = refs[i]; i += 1
    dbias_loc_ref = None
    if has_bias:
        dbias_loc_ref = refs[i]; i += 1

    b_idx, i_idx = pl.program_id(0), pl.program_id(1)
    first_of_grid = jnp.logical_and(b_idx == 0, i_idx == 0)

    k_nbh = _nbh([kr[0, 0] for kr in k_refs], my)  # (my, 9W2, C)
    v_nbh = _nbh([vr[0, 0] for vr in v_refs], my)
    q_row = q_ref[0, 0]  # (my, W2, C)
    g_row = g_ref[0, 0]
    C = q_row.shape[-1]
    M = C // H
    mask = mask_ref[0]  # (my, wq, 9W2)
    nloc = 9 * w2

    for h in range(H):
        hs = h * M
        q_h = q_row[..., hs : hs + M]
        k_h = k_nbh[..., hs : hs + M]
        v_h = v_nbh[..., hs : hs + M]
        g_h = g_row[..., hs : hs + M]
        # score_dtype epilogue cast: keeps the recomputed scores rounded
        # identically to the forward's under VIL_TPU_BF16_SCORES (the
        # fwd/bwd-round-the-same invariant every other kernel observes)
        scores = jax.lax.dot_general(
            q_h, k_h.astype(q_h.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(_score_dtype(q_h.dtype))
        if has_bias:
            scores = scores + bias_loc_ref[h][None].astype(scores.dtype)
        scores = scores + mask.astype(scores.dtype)
        if nglo > 0:
            sg = sg_ref[0, 0][..., h * nglo : (h + 1) * nglo]
            scores = jnp.concatenate(
                [scores, sg.astype(scores.dtype)], axis=-1
            )  # tail append
        p = _probs_softmax(scores, q_h.dtype)  # (my, W2, 9W2+Nglo) normalized

        # dP = g · V^T (local) ‖ precomputed global columns
        dp = jax.lax.dot_general(
            g_h, v_h.astype(g_h.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (my, W2, 9W2)
        if nglo > 0:
            dpg = dpg_ref[0, 0][..., h * nglo : (h + 1) * nglo]
            dp = jnp.concatenate([dp, dpg], axis=-1)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)  # f32 (my, W2, 9W2+Nglo)

        # dQ(local part) = dS_loc · K_nbh; the dS_glo · k_glo term is a
        # small XLA epilogue einsum
        dq = jax.lax.dot_general(
            ds[..., :nloc].astype(q_h.dtype), k_h.astype(q_h.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, 0, :, :, hs : hs + M] = dq.astype(dq_ref.dtype)
        p_ref[0, 0, h] = p[..., :nloc].astype(p_ref.dtype)
        ds_ref[0, 0, h] = ds[..., :nloc].astype(ds_ref.dtype)
        if nglo > 0:
            pg_ref[0, 0, :, :, h * nglo : (h + 1) * nglo] = p[..., nloc:]
            dsg_ref[0, 0, :, :, h * nglo : (h + 1) * nglo] = ds[..., nloc:]

        if has_bias:
            db_loc = jnp.sum(ds[..., :nloc], axis=0)  # (W2, 9W2)

            @pl.when(first_of_grid)
            def _(db_loc=db_loc, h=h):
                dbias_loc_ref[h] = db_loc

            @pl.when(jnp.logical_not(first_of_grid))
            def _(db_loc=db_loc, h=h):
                dbias_loc_ref[h] += db_loc


def _pass2_kernel(w2, my, H, *refs):
    """refs: [ds×3, p×3, q×3, g×3, dk, dv]. Computes dK[r], dV[r] from the
    LOCAL-columns stash (9W² lanes, no global offset)."""
    ds_refs = refs[0:3]
    p_refs = refs[3:6]
    q_refs = refs[6:9]
    g_refs = refs[9:12]
    dk_ref, dv_ref = refs[12], refs[13]

    C = q_refs[0].shape[-1]
    M = C // H
    w2_ = w2

    for h in range(H):
        hs = h * M
        dk_acc = None
        dv_acc = None
        for bi, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
            # query row ρ = r - dx lives in refs index (−dx + 1)
            src = 1 - dx
            col0 = bi * w2_
            ds_blk = ds_refs[src][0, 0, h][:, :, col0 : col0 + w2_]  # (my,W2q,W2)
            p_blk = p_refs[src][0, 0, h][:, :, col0 : col0 + w2_]
            q_rho = q_refs[src][0, 0][..., hs : hs + M]  # (my, W2q, M)
            g_rho = g_refs[src][0, 0][..., hs : hs + M]
            # (my, W2q, W2)^T · (my, W2q, M) → (my, W2, M), batched over my
            dk_c = jax.lax.dot_general(
                ds_blk.astype(q_rho.dtype), q_rho,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv_c = jax.lax.dot_general(
                p_blk.astype(g_rho.dtype), g_rho,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # column un-roll: dk[r, c] takes the (c−dy)%my entry
            dk_c = _roll0(dk_c, -dy) if my > 1 else dk_c
            dv_c = _roll0(dv_c, -dy) if my > 1 else dv_c
            dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
            dv_acc = dv_c if dv_acc is None else dv_acc + dv_c
        dk_ref[0, 0, :, :, hs : hs + M] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, 0, :, :, hs : hs + M] = dv_acc.astype(dv_ref.dtype)


def _backward_whole_image(q, k, v, k_glo, v_glo, bias, g, mask_add, H,
                          interpret, lse=None):
    """Fused one-pass whole-image backward (see _bwd_kernel_img)."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = nglo + 9 * w2
    from .vil_kernel import build_comb, tail_mask_classes

    bias_tail = None
    if has_bias:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(jnp.float32)  # (H, W², 9W²+Nglo), tail order
    # combined bias+mask row-class table (one in-kernel add, see build_comb)
    classes_host, class_of = tail_mask_classes(np.asarray(mask_add), nglo)
    comb = build_comb(classes_host, bias_tail, w2)
    groups = _head_groups(H, C // H)
    comb_tables = [
        t.astype(_score_dtype(q.dtype))
        for t in pair_comb_tables(comb, groups, H)
    ]

    img_block = (1, mx, my, w2, C)
    img_spec = pl.BlockSpec(
        img_block, lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [img_spec, img_spec, img_spec, img_spec]
    operands = [q, k, v, g]
    if nglo > 0:
        # global rows pre-broadcast over my OUTSIDE the kernel (tiny tensors)
        kg_spec = pl.BlockSpec(
            (1, my, nglo, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [kg_spec, kg_spec]
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    for tbl in comb_tables:
        in_specs.append(
            pl.BlockSpec(tbl.shape, lambda b: (0,) * 5,
                         memory_space=pltpu.VMEM)
        )
        operands.append(tbl)
    if lse is not None:
        in_specs.append(
            pl.BlockSpec((1, H, mx, my, w2), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(lse)

    out_specs = [img_spec, img_spec, img_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, nglo, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [glo_spec, glo_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))

    results = pl.pallas_call(
        functools.partial(_bwd_kernel_img, nglo, w2, mx, my, H, groups,
                          has_bias, lse is not None, class_of, False),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dq, dk, dv = next(it), next(it), next(it)
    dkg = dvg = dbias = None
    if nglo > 0:
        # dQ's global term is already in the kernel's main GEMM; dK_glo/
        # dV_glo accumulate in-kernel — no XLA epilogue einsums (r2)
        dkg = next(it).astype(k_glo.dtype)
        dvg = next(it).astype(v_glo.dtype)
    if has_bias:
        db_tail = next(it)  # (H, W², 9W²+Nglo) f32, tail order
        nloc = 9 * w2
        dbias = jnp.concatenate(
            [db_tail[..., nloc:], db_tail[..., :nloc]], axis=-1
        )
    return dq, dk, dv, dkg, dvg, dbias


def backward_whole_image_halo(q, k_ext, v_ext, k_glo, v_glo, bias, g,
                              classes_host, row_class, H, interpret=None):
    """Fused whole-image backward over HALO-EXTENDED K/V — the spatial /
    sequence-parallel variant (_bwd_kernel_img with halo=True). dk/dv are
    returned with mx+2 rows (halo-row grads included; the caller's
    concat+ppermute transpose returns them to their owner shards).
    classes_host/row_class as in vil_kernel.make_fused_vil_attention_halo.
    Returns (dq, dk_ext, dv_ext, dk_glo, dv_glo, dbias)."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = nglo + 9 * w2
    if interpret is None:
        from . import vil_kernel as _vk

        interpret = INTERPRET or _vk.INTERPRET
    from .vil_kernel import build_comb

    bias_tail = None
    if has_bias:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(jnp.float32)
    comb = build_comb(np.asarray(classes_host, np.float32), bias_tail, w2)
    groups = _head_groups(H, C // H)
    comb_tables = [
        t.astype(_score_dtype(q.dtype))
        for t in pair_comb_tables(comb, groups, H)
    ]

    img_spec = pl.BlockSpec(
        (1, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    ext_spec = pl.BlockSpec(
        (1, mx + 2, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [img_spec, ext_spec, ext_spec, img_spec]
    operands = [q, k_ext, v_ext, g]
    if nglo > 0:
        kg_spec = pl.BlockSpec(
            (1, my, nglo, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [kg_spec, kg_spec]
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    for tbl in comb_tables:
        in_specs.append(
            pl.BlockSpec(tbl.shape, lambda b: (0,) * 5,
                         memory_space=pltpu.VMEM)
        )
        operands.append(tbl)
    in_specs.append(
        pl.BlockSpec((mx,), lambda b: (0,), memory_space=pltpu.SMEM)
    )
    operands.append(row_class.astype(jnp.int32))

    out_specs = [img_spec, ext_spec, ext_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k_ext.shape, k_ext.dtype),
        jax.ShapeDtypeStruct(v_ext.shape, v_ext.dtype),
    ]
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, nglo, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [glo_spec, glo_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))

    results = pl.pallas_call(
        functools.partial(_bwd_kernel_img, nglo, w2, mx, my, H, groups,
                          has_bias, False, None, True),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dq, dk, dv = next(it), next(it), next(it)
    dkg = dvg = dbias = None
    if nglo > 0:
        dkg = next(it).astype(k_glo.dtype)
        dvg = next(it).astype(v_glo.dtype)
    if has_bias:
        db_tail = next(it)
        nloc = 9 * w2
        dbias = jnp.concatenate(
            [db_tail[..., nloc:], db_tail[..., :nloc]], axis=-1
        )
    return dq, dk, dv, dkg, dvg, dbias


def _bwd_kernel_img_loop(nglo, w2, mx, my, H, groups, has_bias, with_lse,
                         *refs):
    """LOOP-rolled whole-image fused backward (grid (B,)) for grids whose
    statically-unrolled temp estimate exceeds the VMEM budget (e.g.
    14×14-chunk 384² stage-1 grids). Identical math to _bwd_kernel_img, but
    the row loop is a ``lax.fori_loop``: only ONE row's f32 score-sized
    temporaries are live at a time (Mosaic does not reuse stack slots
    across a static unroll — the 5·mx·H temps are what force the
    tiled/two-pass fallbacks at big grids). vs the super-row tiled kernel
    this keeps K/V resident ONCE per image (the tiles refetch 3×), has no
    (T+2)-row halo slabs and no XLA combine pass — dK/dV accumulate in f32
    VMEM scratch via dynamic-row read-modify-writes — and pays no per-tile
    pipeline flushes.

    Traced-row consequences: rows are addressed with dynamic indices
    (cyclic wrap via lax.rem), the comb-table row class is a traced SMEM
    read (same as the halo kernel), and db/dkg/dvg accumulate as fori_loop
    carries. The group loop stays statically unrolled (lane offsets must be
    static).

    refs: [q, k, v, g, (kg_row, vg_row)?, comb×n_comb, rc, (lse)?,
           dq, dk, dv, (dkg, dvg)?, (dbias_tail)?, dk_scr, dv_scr]."""
    n_pair = sum(1 for grp in groups if len(grp) == 2)
    n_single = sum(1 for grp in groups if len(grp) == 1)
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    g_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    combp_ref = combs_ref = None
    if n_pair:
        combp_ref = refs[i]; i += 1
    if n_single:
        combs_ref = refs[i]; i += 1
    rc_ref = refs[i]; i += 1  # (mx,) int32 SMEM: traced row classes
    lse_ref = None
    if with_lse:
        lse_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    dk_ref = refs[i]; i += 1
    dv_ref = refs[i]; i += 1
    dkg_ref = dvg_ref = None
    if nglo > 0:
        dkg_ref = refs[i]; i += 1
        dvg_ref = refs[i]; i += 1
    dbias_ref = None
    if has_bias:
        dbias_ref = refs[i]; i += 1
    dk_scr = refs[i]; i += 1  # (mx, my, W², C) f32 VMEM accumulators
    dv_scr = refs[i]; i += 1

    b_idx = pl.program_id(0)
    C = q_ref.shape[-1]
    M = C // H
    nloc = 9 * w2
    nG = len(groups)
    cols = nloc + nglo

    from .vil_kernel import _nbh_rows

    zero_row = jnp.zeros((my, w2, C), jnp.float32)
    for r in range(mx):
        dk_scr[r] = zero_row
        dv_scr[r] = zero_row

    db0 = tuple(jnp.zeros((w2, cols), jnp.float32) for _ in range(H))
    glo0 = tuple(
        jnp.zeros((1, len(grp) * M), jnp.float32)
        for _ in range(nglo) for grp in groups
    )

    def body(i_row, carry):
        db_acc, dkg_acc, dvg_acc = carry
        im1 = jax.lax.rem(i_row + mx - 1, mx)
        ip1 = jax.lax.rem(i_row + 1, mx)
        k_rows = [k_ref[0, im1], k_ref[0, i_row], k_ref[0, ip1]]
        v_rows = [v_ref[0, im1], v_ref[0, i_row], v_ref[0, ip1]]
        rc = rc_ref[i_row]
        k_nbh = _nbh_rows(k_rows, my, kg_row)
        v_nbh = _nbh_rows(v_rows, my, vg_row)
        q_row = q_ref[0, i_row]
        g_row = g_ref[0, i_row]
        db_new = list(db_acc)
        dkg_new = list(dkg_acc)
        dvg_new = list(dvg_acc)
        dk_parts = [[None] * nG for _ in range(3)]  # per dx ∈ (−1, 0, 1)
        dv_parts = [[None] * nG for _ in range(3)]
        for gidx, grp in enumerate(groups):
            G = len(grp)
            hs = grp[0] * M
            gm = G * M
            q_g = q_row[..., hs : hs + gm]
            k_g = k_nbh[..., hs : hs + gm].astype(q_g.dtype)
            v_g = v_nbh[..., hs : hs + gm].astype(q_g.dtype)
            g_g = g_row[..., hs : hs + gm]
            if G == 2:
                q_in = _stack_bd(q_g, M)
                g_in = _stack_bd(g_g, M)
            else:
                q_in, g_in = q_g, g_g
            scores = jax.lax.dot_general(
                q_in, k_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(_score_dtype(q_g.dtype))
            if G == 2:
                scores = scores + combp_ref[
                    gidx if combp_ref.shape[0] > 1 else 0, rc
                ]
            else:
                scores = scores + combs_ref[
                    grp[0] if combs_ref.shape[0] > 1 else 0, rc
                ]
            if lse_ref is not None:
                if G == 2:
                    lse_row = jnp.concatenate(
                        [lse_ref[0, grp[0], i_row],
                         lse_ref[0, grp[1], i_row]],
                        axis=1,
                    )
                else:
                    lse_row = lse_ref[0, grp[0], i_row]
                p = _probs_lse(scores, lse_row, q_g.dtype)
            else:
                p = _probs_softmax(scores, q_g.dtype)
            dp = jax.lax.dot_general(
                g_in, v_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - delta)
            ds_c = ds.astype(q_g.dtype)
            dq_out = jax.lax.dot_general(
                ds_c, k_g, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for j, h in enumerate(grp):
                dq_ref[0, i_row, :, :, h * M : (h + 1) * M] = dq_out[
                    :, j * w2 : (j + 1) * w2, j * M : (j + 1) * M
                ].astype(dq_ref.dtype)
            if has_bias:
                db = jnp.sum(ds, axis=0)
                for j, h in enumerate(grp):
                    db_new[h] = db_new[h] + db[j * w2 : (j + 1) * w2]
            p_c = p.astype(q_g.dtype)
            dk_wide = jax.lax.dot_general(
                ds_c, q_in, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv_wide = jax.lax.dot_general(
                p_c, g_in, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for gi in range(nglo):
                g0 = nloc + gi
                slot = gi * nG + gidx
                dkg_new[slot] = dkg_new[slot] + jnp.sum(
                    dk_wide[:, g0 : g0 + 1, :], axis=0
                )
                dvg_new[slot] = dvg_new[slot] + jnp.sum(
                    dv_wide[:, g0 : g0 + 1, :], axis=0
                )
            for bi, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
                c0 = bi * w2
                dk_c = dk_wide[:, c0 : c0 + w2, :]
                dv_c = dv_wide[:, c0 : c0 + w2, :]
                if my > 1:
                    dk_c = _roll0(dk_c, -dy)
                    dv_c = _roll0(dv_c, -dy)
                s = dx + 1
                dk_parts[s][gidx] = (
                    dk_c if dk_parts[s][gidx] is None
                    else dk_parts[s][gidx] + dk_c
                )
                dv_parts[s][gidx] = (
                    dv_c if dv_parts[s][gidx] is None
                    else dv_parts[s][gidx] + dv_c
                )
        # ONE read-modify-write per neighbor row: lane-concat the group
        # slices back to full C first
        for s, dx in ((0, -1), (1, 0), (2, 1)):
            r = jax.lax.rem(i_row + dx + mx, mx)
            dk_full = jnp.concatenate(dk_parts[s], axis=-1)
            dv_full = jnp.concatenate(dv_parts[s], axis=-1)
            dk_scr[r] += dk_full
            dv_scr[r] += dv_full
        return (tuple(db_new), tuple(dkg_new), tuple(dvg_new))

    db_acc, dkg_acc, dvg_acc = jax.lax.fori_loop(
        0, mx, body, (db0, glo0, glo0)
    )

    for r in range(mx):
        dk_ref[0, r] = dk_scr[r].astype(dk_ref.dtype)
        dv_ref[0, r] = dv_scr[r].astype(dv_ref.dtype)
    for gi in range(nglo):
        dkg_ref[0, gi : gi + 1] = jnp.concatenate(
            dkg_acc[gi * nG : (gi + 1) * nG], axis=-1
        )
        dvg_ref[0, gi : gi + 1] = jnp.concatenate(
            dvg_acc[gi * nG : (gi + 1) * nG], axis=-1
        )
    if has_bias:
        for h in range(H):
            @pl.when(b_idx == 0)
            def _(h=h):
                dbias_ref[h] = db_acc[h]

            @pl.when(b_idx != 0)
            def _(h=h):
                dbias_ref[h] += db_acc[h]


def _loop_vmem_bytes(mx, my, w2, C, H, nglo, has_bias, itemsize, ncls):
    """VMEM estimate for one grid step of _bwd_kernel_img_loop: one row's
    worth of f32 score temps (the loop reuses them), double-buffered image
    refs, the f32 dK/dV scratch, and the comb tables."""
    cols = nglo + 9 * w2
    groups = _head_groups(H, C // H)
    temp_rows = sum(5 * my * len(g) * w2 * cols * 4 for g in groups)
    comb_bytes = (H if has_bias else 1) * ncls * my * w2 * cols * 4
    n_pair = sum(1 for g in groups if len(g) == 2)
    if n_pair:
        # pair tables stack the two heads' rows (2·w2 wide); an ODD head
        # count adds the singleton table too — the old `else 2` missed it
        # and let the 512² 19×19 stage-1 shape through a tier whose actual
        # Mosaic stack (114.9 MB) blew the 110 MB scope
        mult = (2 * n_pair + (H % 2)) if has_bias else (2 + (H % 2))
        comb_bytes = mult * ncls * my * w2 * cols * 4
    img = mx * my * w2 * C
    return (
        temp_rows
        + 7 * 2 * img * itemsize  # q,k,v,g,dq,dk,dv ×2 grid buffers
        + 2 * img * 4             # dk/dv f32 scratch
        + comb_bytes
        + (H * w2 * cols * 4 if has_bias else 0)
    )


def _backward_whole_image_loop(q, k, v, k_glo, v_glo, bias, g, mask_add, H,
                               interpret, lse=None):
    """Loop-rolled whole-image fused backward (see _bwd_kernel_img_loop)."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = nglo + 9 * w2
    from .vil_kernel import build_comb, tail_mask_classes

    bias_tail = None
    if has_bias:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(jnp.float32)
    classes_host, class_of = tail_mask_classes(np.asarray(mask_add), nglo)
    comb = build_comb(classes_host, bias_tail, w2)
    groups = _head_groups(H, C // H)
    comb_tables = [
        t.astype(_score_dtype(q.dtype))
        for t in pair_comb_tables(comb, groups, H)
    ]

    img_spec = pl.BlockSpec(
        (1, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [img_spec, img_spec, img_spec, img_spec]
    operands = [q, k, v, g]
    if nglo > 0:
        kg_spec = pl.BlockSpec(
            (1, my, nglo, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [kg_spec, kg_spec]
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    for tbl in comb_tables:
        in_specs.append(
            pl.BlockSpec(tbl.shape, lambda b: (0,) * 5,
                         memory_space=pltpu.VMEM)
        )
        operands.append(tbl)
    in_specs.append(
        pl.BlockSpec((mx,), lambda b: (0,), memory_space=pltpu.SMEM)
    )
    operands.append(jnp.asarray(class_of, jnp.int32))
    if lse is not None:
        in_specs.append(
            pl.BlockSpec((1, H, mx, my, w2), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(lse)

    out_specs = [img_spec, img_spec, img_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, nglo, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [glo_spec, glo_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))

    results = pl.pallas_call(
        functools.partial(_bwd_kernel_img_loop, nglo, w2, mx, my, H, groups,
                          has_bias, lse is not None),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((mx, my, w2, C), jnp.float32),
            pltpu.VMEM((mx, my, w2, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dq, dk, dv = next(it), next(it), next(it)
    dkg = dvg = dbias = None
    if nglo > 0:
        dkg = next(it).astype(k_glo.dtype)
        dvg = next(it).astype(v_glo.dtype)
    if has_bias:
        db_tail = next(it)
        nloc = 9 * w2
        dbias = jnp.concatenate(
            [db_tail[..., nloc:], db_tail[..., :nloc]], axis=-1
        )
    return dq, dk, dv, dkg, dvg, dbias


def _bwd_kernel_tiled(nglo, w2, T, my, H, groups, has_bias, with_lse, *refs):
    """Super-row tiled fused backward (grid (B, n_tiles)) for images whose
    whole-image VMEM estimate exceeds the budget (e.g. 14×14-chunk 384²
    stage-1 grids). Identical math to _bwd_kernel_img, but each grid step
    owns T consecutive query rows; the K/V neighborhood comes from three
    T-row tile blocks (prev/center/next), and dK/dV contributions land in a
    per-tile (T+2)-row halo slab — slot s holds the contribution to global
    row t·T + s − 1 — summed into the final dK/dV by 3 static scatter-adds
    XLA-side. P and dS still never touch HBM (vs the two-pass variant's
    multi-GB stash; reference backward slidingchunk_2d.py:133-200).

    refs: [q, k×3, v×3, g, (kg_row, vg_row)?, (bias_tail)?, mask_tile,
    (lse_tile)?, dq, dk_slab, dv_slab, (pg_out, dsg_out)?, (dbias_tail)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_refs = refs[i : i + 3]; i += 3
    v_refs = refs[i : i + 3]; i += 3
    g_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    bias_tail = None
    if has_bias:
        bias_tail = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    lse_ref = None
    if with_lse:
        lse_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    dk_ref = refs[i]; i += 1  # (1, 1, T+2, my, W², C) halo slab
    dv_ref = refs[i]; i += 1
    dkg_ref = dvg_ref = None
    if nglo > 0:
        dkg_ref = refs[i]; i += 1  # (1, Nglo, C) f32, accumulated over t
        dvg_ref = refs[i]; i += 1
    dbias_ref = None
    if has_bias:
        dbias_ref = refs[i]; i += 1

    b_idx, t_idx = pl.program_id(0), pl.program_id(1)
    C = q_ref.shape[-1]
    M = C // H
    nloc = 9 * w2
    nG = len(groups)
    n_pair = sum(1 for grp in groups if len(grp) == 2)

    from .vil_kernel import _nbh_rows

    def kv_row(refs3, j):
        """Row j ∈ [−1, T] of the center tile (halo rows from prev/next)."""
        if j < 0:
            return refs3[0][0, T + j]
        if j >= T:
            return refs3[2][0, j - T]
        return refs3[1][0, j]

    dk_acc = [[None] * nG for _ in range(T + 2)]
    dv_acc = [[None] * nG for _ in range(T + 2)]
    db_acc = [None] * H
    dkg_acc = [[None] * nG for _ in range(nglo)]
    dvg_acc = [[None] * nG for _ in range(nglo)]

    # pair-stacked bias rows, hoisted out of the row loop
    bias_grp = [None] * nG
    if has_bias:
        for gidx, grp in enumerate(groups):
            bias_grp[gidx] = (
                jnp.concatenate([bias_tail[grp[0]], bias_tail[grp[1]]], axis=0)
                if len(grp) == 2 else bias_tail[grp[0]]
            )

    for i_row in range(T):
        k_rows = [kv_row(k_refs, i_row + dx) for dx in (-1, 0, 1)]
        v_rows = [kv_row(v_refs, i_row + dx) for dx in (-1, 0, 1)]
        k_nbh = _nbh_rows(k_rows, my, kg_row)  # (my, 9W²+Nglo, C)
        v_nbh = _nbh_rows(v_rows, my, vg_row)
        q_row = q_ref[0, i_row]  # (my, W², C)
        g_row = g_ref[0, i_row]
        mask = mask_ref[i_row]  # (my, W², 9W²+Nglo) f32, tail order
        mask2 = jnp.concatenate([mask, mask], axis=1) if n_pair else None
        for gidx, grp in enumerate(groups):
            G = len(grp)
            hs = grp[0] * M
            gm = G * M
            q_g = q_row[..., hs : hs + gm]
            k_g = k_nbh[..., hs : hs + gm].astype(q_g.dtype)
            v_g = v_nbh[..., hs : hs + gm].astype(q_g.dtype)
            g_g = g_row[..., hs : hs + gm]
            if G == 2:
                q_in = _stack_bd(q_g, M)  # (my, 2W², 2M) block-diagonal
                g_in = _stack_bd(g_g, M)
            else:
                q_in, g_in = q_g, g_g
            scores = jax.lax.dot_general(
                q_in, k_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(_score_dtype(q_g.dtype))  # (my, G·W², cols)
            if has_bias:
                scores = scores + bias_grp[gidx][None]
            scores = scores + (mask2 if G == 2 else mask)
            if lse_ref is not None:
                # forward-stashed log-sum-exp (see _bwd_kernel_img)
                if G == 2:
                    lse_row = jnp.concatenate(
                        [lse_ref[0, grp[0], i_row], lse_ref[0, grp[1], i_row]],
                        axis=1,
                    )
                else:
                    lse_row = lse_ref[0, grp[0], i_row]
                p = _probs_lse(scores, lse_row, q_g.dtype)
            else:
                p = _probs_softmax(scores, q_g.dtype)
            dp = jax.lax.dot_general(
                g_in, v_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - delta)
            ds_c = ds.astype(q_g.dtype)
            dq_out = jax.lax.dot_general(
                ds_c, k_g, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (my, G·W², G·M): diagonal blocks only (see _bwd_kernel_img)
            for j, h in enumerate(grp):
                dq_ref[0, i_row, :, :, h * M : (h + 1) * M] = dq_out[
                    :, j * w2 : (j + 1) * w2, j * M : (j + 1) * M
                ].astype(dq_ref.dtype)
            if has_bias:
                db = jnp.sum(ds, axis=0)  # (G·W², cols) f32, tail order
                for j, h in enumerate(grp):
                    dbj = db[j * w2 : (j + 1) * w2]
                    db_acc[h] = dbj if db_acc[h] is None else db_acc[h] + dbj
            p_c = p.astype(q_g.dtype)
            # wide (my, 9W²+Nglo, G·M) transposed-contribution GEMMs + static
            # sublane slices; the global columns ride the same GEMMs (same
            # rationale as the whole-image kernel)
            dk_wide = jax.lax.dot_general(
                ds_c, q_in, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv_wide = jax.lax.dot_general(
                p_c, g_in, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for gi in range(nglo):
                # 3-D slice + major-axis reduce (see whole-image kernel note)
                g0 = nloc + gi
                dkg_c = jnp.sum(dk_wide[:, g0 : g0 + 1, :], axis=0)  # (1,G·M)
                dvg_c = jnp.sum(dv_wide[:, g0 : g0 + 1, :], axis=0)
                dkg_acc[gi][gidx] = (
                    dkg_c if dkg_acc[gi][gidx] is None
                    else dkg_acc[gi][gidx] + dkg_c
                )
                dvg_acc[gi][gidx] = (
                    dvg_c if dvg_acc[gi][gidx] is None
                    else dvg_acc[gi][gidx] + dvg_c
                )
            for bi, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
                c0 = bi * w2
                dk_c = dk_wide[:, c0 : c0 + w2, :]
                dv_c = dv_wide[:, c0 : c0 + w2, :]
                if my > 1:
                    dk_c = _roll0(dk_c, -dy)
                    dv_c = _roll0(dv_c, -dy)
                s = i_row + dx + 1  # halo-slab slot for global row t·T+i+dx
                dk_acc[s][gidx] = (
                    dk_c if dk_acc[s][gidx] is None else dk_acc[s][gidx] + dk_c
                )
                dv_acc[s][gidx] = (
                    dv_c if dv_acc[s][gidx] is None else dv_acc[s][gidx] + dv_c
                )

    for s in range(T + 2):
        dk_ref[0, 0, s] = jnp.concatenate(
            [a.astype(dk_ref.dtype) for a in dk_acc[s]], axis=-1
        )
        dv_ref[0, 0, s] = jnp.concatenate(
            [a.astype(dv_ref.dtype) for a in dv_acc[s]], axis=-1
        )
    # dK_glo/dV_glo: per-image accumulation across the tile grid steps
    # (t is the inner grid dim — steps for one b are consecutive)
    for gi in range(nglo):
        dkg_t = jnp.concatenate(dkg_acc[gi], axis=-1)  # (1, C) f32
        dvg_t = jnp.concatenate(dvg_acc[gi], axis=-1)

        @pl.when(t_idx == 0)
        def _(gi=gi, dkg_t=dkg_t, dvg_t=dvg_t):
            dkg_ref[0, gi : gi + 1] = dkg_t
            dvg_ref[0, gi : gi + 1] = dvg_t

        @pl.when(t_idx != 0)
        def _(gi=gi, dkg_t=dkg_t, dvg_t=dvg_t):
            dkg_ref[0, gi : gi + 1] += dkg_t
            dvg_ref[0, gi : gi + 1] += dvg_t

    if has_bias:
        first = jnp.logical_and(b_idx == 0, t_idx == 0)
        for h in range(H):
            @pl.when(first)
            def _(h=h):
                dbias_ref[h] = db_acc[h]

            @pl.when(jnp.logical_not(first))
            def _(h=h):
                dbias_ref[h] += db_acc[h]


def _tiled_vmem_bytes(T, mx, my, w2, C, H, nglo, has_bias, itemsize, bias_size):
    """VMEM estimate for one (B, tile) grid step of _bwd_kernel_tiled (same
    accounting discipline as the whole-image estimate: Mosaic does not reuse
    temporary slots across the statically-unrolled T·H iterations)."""
    cols_tail = nglo + 9 * w2
    row_bytes = my * w2 * C * itemsize
    return (
        T * H * 5 * my * w2 * cols_tail * 4  # live f32 score-sized temps
        + 2 * (9 * T + 2 * (T + 2)) * row_bytes  # q,g,dq + k,v ×3 + slabs, ×2 buf
        + 2 * T * my * w2 * cols_tail * 4  # mask tile
        + (2 * bias_size * 4 if has_bias else 0)
        + 2 * 2 * T * my * w2 * H * nglo * itemsize  # pg/dsg outputs
    )


def _pick_tile_rows(mx, my, w2, C, H, nglo, has_bias, itemsize, bias_size):
    """Largest divisor T < mx whose tiled estimate fits the budget (0 = none)."""
    for T in sorted((t for t in range(1, mx) if mx % t == 0), reverse=True):
        if _tiled_vmem_bytes(T, mx, my, w2, C, H, nglo, has_bias, itemsize,
                             bias_size) <= WHOLE_IMAGE_VMEM_BYTES:
            return T
    return 0


def _backward_tiled(q, k, v, k_glo, v_glo, bias, g, mask_add, H, T, interpret,
                    lse=None):
    """Super-row tiled fused backward (see _bwd_kernel_tiled)."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = nglo + 9 * w2
    n_tiles = mx // T
    assert n_tiles * T == mx
    from .vil_kernel import expand_tail_mask

    sd = _score_dtype(q.dtype)
    mask_tail = expand_tail_mask(mask_add, nglo, w2).astype(sd)
    bias_tail = None
    if has_bias:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(sd)

    tile_block = (1, T, my, w2, C)

    def tile_spec(dt):
        return pl.BlockSpec(
            tile_block,
            lambda b, t, dt=dt: (b, (t + dt) % n_tiles, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = tile_spec(0)
    in_specs = [q_spec]
    in_specs += [tile_spec(dt) for dt in (-1, 0, 1)]
    in_specs += [tile_spec(dt) for dt in (-1, 0, 1)]
    in_specs += [q_spec]
    operands = [q, k, k, k, v, v, v, g]
    if nglo > 0:
        kg_spec = pl.BlockSpec(
            (1, my, nglo, C), lambda b, t: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [kg_spec, kg_spec]
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(bias_tail)
    in_specs.append(
        pl.BlockSpec((T, my, w2, cols), lambda b, t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(jnp.asarray(mask_tail))
    if lse is not None:
        in_specs.append(
            pl.BlockSpec((1, H, T, my, w2), lambda b, t: (b, 0, t, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(lse)

    slab_spec = pl.BlockSpec(
        (1, 1, T + 2, my, w2, C), lambda b, t: (b, t, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [q_spec, slab_spec, slab_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((B, n_tiles, T + 2, my, w2, C), k.dtype),
        jax.ShapeDtypeStruct((B, n_tiles, T + 2, my, w2, C), v.dtype),
    ]
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, nglo, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [glo_spec, glo_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))

    results = pl.pallas_call(
        functools.partial(_bwd_kernel_tiled, nglo, w2, T, my, H,
                          _head_groups(H, C // H), has_bias, lse is not None),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dq, dk_slab, dv_slab = next(it), next(it), next(it)

    # halo-slab combine: slot s of tile t holds row t·T + s − 1 (mod mx)
    rows_up = (np.arange(n_tiles) * T - 1) % mx
    rows_dn = (np.arange(n_tiles) * T + T) % mx

    def combine(slab, out_dtype):
        center = slab[:, :, 1 : T + 1].reshape(B, mx, my, w2, C)
        acc = center.astype(jnp.float32)
        acc = acc.at[:, rows_up].add(slab[:, :, 0].astype(jnp.float32))
        acc = acc.at[:, rows_dn].add(slab[:, :, T + 1].astype(jnp.float32))
        return acc.astype(out_dtype)

    dk = combine(dk_slab, k.dtype)
    dv = combine(dv_slab, v.dtype)
    dkg = dvg = dbias = None
    if nglo > 0:
        dkg = next(it).astype(k_glo.dtype)
        dvg = next(it).astype(v_glo.dtype)
    if has_bias:
        db_tail = next(it)
        nloc = 9 * w2
        dbias = jnp.concatenate(
            [db_tail[..., nloc:], db_tail[..., :nloc]], axis=-1
        )
    return dq, dk, dv, dkg, dvg, dbias


def vil_attention_backward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_glo: Optional[jax.Array],
    v_glo: Optional[jax.Array],
    bias: Optional[jax.Array],
    g: jax.Array,
    mask_add: np.ndarray,
    num_heads: int,
    *,
    lse: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
):
    """Returns (dq, dk, dv, dk_glo, dv_glo, dbias) for the MH forward.

    ``lse`` (B, H, mx, my, W²) f32 is the forward-stashed log-sum-exp; when
    present the fused kernels recompute normalized probs in ONE exp pass
    (p = exp(scores − L)) instead of max + exp + sum + divide."""
    B, mx, my, w2, C = q.shape
    H = num_heads
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = 9 * w2  # stash/mask/bias hold LOCAL columns only
    if interpret is None:
        from . import vil_kernel as _vk

        interpret = INTERPRET or _vk.INTERPRET

    # VMEM estimate for the fused whole-image variant. The dominant term is
    # the per-iteration f32 score-sized temporaries (~5 of them live per
    # (row, head) body): Mosaic's scoped-VMEM stack does NOT reuse slots
    # across the statically-unrolled mx·H iterations (measured: stage-1
    # f32 shapes request 115 MB with a naive estimate of 30 MB), so they
    # all count. Shapes over budget fall back to the two-pass variant.
    cols_tail = nglo + 9 * w2
    from .vil_kernel import tail_mask_classes

    ncls = tail_mask_classes(np.asarray(mask_add), nglo)[0].shape[0]
    comb_bytes = (H if has_bias else 1) * ncls * my * w2 * cols_tail * 4
    img_bytes = (
        mx * H * 5 * my * w2 * cols_tail * 4
        + 7 * 2 * (q.size // B) * q.dtype.itemsize
        + comb_bytes
        + (bias.size * 4 if has_bias else 0)  # dbias accumulator
        + 2 * mx * my * w2 * C * 4
    )
    if FORCE_BWD_LOOP:
        return _backward_whole_image_loop(
            q, k, v, k_glo, v_glo, bias, g, mask_add, H, interpret, lse=lse
        )
    if FORCE_TILE_T is not None:
        return _backward_tiled(
            q, k, v, k_glo, v_glo, bias, g, mask_add, H, FORCE_TILE_T,
            interpret, lse=lse,
        )
    if img_bytes <= WHOLE_IMAGE_VMEM_BYTES:
        return _backward_whole_image(
            q, k, v, k_glo, v_glo, bias, g, mask_add, H, interpret, lse=lse
        )
    # too big for the unrolled whole-image kernel: the LOOP-rolled variant
    # keeps the fused whole-image structure (K/V resident once, no slabs)
    # with only one row's temps live; super-row tiles and the two-pass
    # stash variant remain the fallbacks
    if FORCE_BWD_LOOP is None and _loop_vmem_bytes(
        mx, my, w2, C, H, nglo, has_bias, q.dtype.itemsize, ncls
    ) <= WHOLE_IMAGE_VMEM_BYTES:
        return _backward_whole_image_loop(
            q, k, v, k_glo, v_glo, bias, g, mask_add, H, interpret, lse=lse
        )
    T = _pick_tile_rows(
        mx, my, w2, C, H, nglo, has_bias, q.dtype.itemsize,
        bias.size if has_bias else 0,
    )
    if T:
        return _backward_tiled(
            q, k, v, k_glo, v_glo, bias, g, mask_add, H, T, interpret,
            lse=lse,
        )
    return _backward_two_pass(
        q, k, v, k_glo, v_glo, bias, g, mask_add, H, interpret=interpret
    )


def _backward_two_pass(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_glo: Optional[jax.Array],
    v_glo: Optional[jax.Array],
    bias: Optional[jax.Array],
    g: jax.Array,
    mask_add: np.ndarray,
    num_heads: int,
    *,
    interpret: bool = False,
):
    """v6 two-pass backward (P/dS stash in HBM) — the fallback for shapes
    whose whole-image VMEM estimate exceeds the budget (e.g. the 14×14-chunk
    384² stage-1 grids). Measured at batch 64 bf16: 10.5 ms stage 1 /
    3.4 ms stage 2 vs whole-image's 9.0 / 1.3 (benchmarks/bwd_bench.py)."""
    B, mx, my, w2, C = q.shape
    H = num_heads
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = 9 * w2  # stash/mask/bias hold LOCAL columns only

    # split bias / mask outside the kernel (lane-offset slices are free
    # here; the wq=1→W² expansion dodges the Mosaic broadcast-add crash —
    # see vil_kernel.expand_local_mask)
    from .vil_kernel import expand_local_mask

    mask_local = expand_local_mask(mask_add, nglo, w2)
    bias_loc = None
    if has_bias:
        bias_loc = bias[..., nglo:].astype(jnp.float32)
    # precompute the per-head global score / dP columns as XLA einsums
    # (forward v6 layout): sg/dpg (B, mx, my, W2, H·Nglo) f32
    sg_all = dpg_all = None
    if nglo > 0:
        M = C // H
        q5 = q.reshape(B, mx, my, w2, H, M)
        g5 = g.reshape(B, mx, my, w2, H, M)
        kg4 = k_glo.reshape(B, nglo, H, M)
        vg4 = v_glo.reshape(B, nglo, H, M)
        sg_all = jnp.einsum(
            "bxywhm,bghm->bxywhg", q5, kg4, preferred_element_type=jnp.float32
        )
        if has_bias:
            bias_glo = bias[..., :nglo].astype(jnp.float32)  # (H, W2, Nglo)
            sg_all = sg_all + bias_glo.transpose(1, 0, 2)[None, None, None]
        sg_all = sg_all.reshape(B, mx, my, w2, H * nglo)
        dpg_all = jnp.einsum(
            "bxywhm,bghm->bxywhg", g5, vg4, preferred_element_type=jnp.float32
        ).reshape(B, mx, my, w2, H * nglo)

    row_block = (1, 1, my, w2, C)

    def row_spec(dx):
        return pl.BlockSpec(
            row_block,
            lambda b, i, dx=dx: (b, (i + dx) % mx, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    q_spec = row_spec(0)
    # ---------------- pass 1 ----------------
    in_specs = [q_spec]
    in_specs += [row_spec(dx) for dx in (-1, 0, 1)]
    in_specs += [row_spec(dx) for dx in (-1, 0, 1)]
    in_specs += [q_spec]  # g
    operands = [q, k, k, k, v, v, v, g]
    if nglo > 0:
        hn = H * nglo
        sg_spec = pl.BlockSpec(
            (1, 1, my, w2, hn), lambda b, i: (b, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [sg_spec, sg_spec]
        operands += [sg_all, dpg_all]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(bias_loc)
    in_specs.append(
        pl.BlockSpec((1, my, w2, cols), lambda b, i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(jnp.asarray(mask_local))

    stash_block = (1, 1, H, my, w2, cols)  # head-major: mid-tensor
    # singleton indexing is unsupported for packed dtypes on Mosaic
    stash_spec = pl.BlockSpec(
        stash_block, lambda b, i: (b, i, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec(row_block, lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        stash_spec,
        stash_spec,
    ]
    # stash in the input dtype: bf16 in production halves the P/dS traffic
    # and keeps pass 2 within the VMEM scope (f32 in f32 tests for exactness)
    stash_dtype = q.dtype
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((B, mx, H, my, w2, cols), stash_dtype),
        jax.ShapeDtypeStruct((B, mx, H, my, w2, cols), stash_dtype),
    ]
    # normalized global probs / global dS: small f32 outputs consumed by
    # the XLA epilogue (dK_glo/dV_glo/dQ_glo/dbias_glo einsums); dbias_loc
    # accumulates in-kernel across the whole grid (constant-index block)
    if nglo > 0:
        out_specs += [sg_spec, sg_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, mx, my, w2, hn), jnp.float32),
            jax.ShapeDtypeStruct((B, mx, my, w2, hn), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))

    vmem_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    results = pl.pallas_call(
        functools.partial(_pass1_kernel, nglo, w2, my, H, has_bias),
        grid=(B, mx),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=vmem_params,
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dq, p_st, ds_st = next(it), next(it), next(it)
    dkg = dvg = dbias = None
    if nglo > 0:
        pg_out = next(it)   # (B, mx, my, W2, H·Nglo) f32, normalized
        dsg_out = next(it)
        M = C // H
        pg5 = pg_out.reshape(B, mx, my, w2, H, nglo)
        dsg5 = dsg_out.reshape(B, mx, my, w2, H, nglo)
        q5 = q.reshape(B, mx, my, w2, H, M).astype(jnp.float32)
        g5 = g.reshape(B, mx, my, w2, H, M).astype(jnp.float32)
        kg4 = k_glo.reshape(B, nglo, H, M).astype(jnp.float32)
        # dQ += dS_glo · k_glo ; dK_glo = Σ dS_glo ⊗ q ; dV_glo = Σ p_glo ⊗ g
        dq = dq + jnp.einsum(
            "bxywhg,bghm->bxywhm", dsg5, kg4
        ).reshape(B, mx, my, w2, C).astype(dq.dtype)
        dkg = jnp.einsum("bxywhg,bxywhm->bghm", dsg5, q5).reshape(
            B, nglo, C
        ).astype(k_glo.dtype)
        dvg = jnp.einsum("bxywhg,bxywhm->bghm", pg5, g5).reshape(
            B, nglo, C
        ).astype(v_glo.dtype)
    if has_bias:
        dbias_loc_out = next(it)
        if nglo > 0:
            # dbias_glo = Σ_{b,x,y·(rows)} dS_glo, back in (H, W2, Nglo)
            dbias_glo_out = jnp.sum(dsg5, axis=(0, 1, 2)).transpose(1, 0, 2)
            dbias = jnp.concatenate([dbias_glo_out, dbias_loc_out], axis=-1)
        else:
            dbias = dbias_loc_out

    # ---------------- pass 2 ----------------
    def stash_row_spec(dx):
        return pl.BlockSpec(
            stash_block,
            lambda b, i, dx=dx: (b, (i + dx) % mx, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    # _pass2_kernel indexes refs[1 - dx] for query row r - dx, so
    # refs[0] = row r-1, refs[1] = row r, refs[2] = row r+1.
    in_specs2 = [stash_row_spec(dx) for dx in (-1, 0, 1)]
    in_specs2 += [stash_row_spec(dx) for dx in (-1, 0, 1)]
    in_specs2 += [row_spec(dx) for dx in (-1, 0, 1)]
    in_specs2 += [row_spec(dx) for dx in (-1, 0, 1)]
    operands2 = [ds_st] * 3 + [p_st] * 3 + [q] * 3 + [g] * 3
    dk, dv = pl.pallas_call(
        functools.partial(_pass2_kernel, w2, my, H),
        grid=(B, mx),
        in_specs=in_specs2,
        out_specs=[
            pl.BlockSpec(row_block, lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=vmem_params,
        interpret=interpret,
    )(*operands2)

    return dq, dk, dv, dkg, dvg, dbias
