"""Fused Pallas kernels for the SAMPLED-NEIGHBOR (mode 1..8) attention path.

The reference's random-shift training (longformer2d.py:113-124,
slidingchunk_2d.py:15-24) attends each chunk to [self block ‖ ONE sampled
neighbor block] — kv span 2W² instead of 9W². The sampled block is chosen
per step, possibly on device (a traced scalar), so the kernel must be
mode-agnostic: the (sx, sy) roll that aligns the sampled block onto the self
chunk happens OUTSIDE the kernel as a cheap XLA ``jnp.roll`` (dynamic shifts
are fine in XLA; inside Mosaic they are not — no bf16 dynamic_rotate).
After the roll the attention is PER-CHUNK LOCAL: chunk (i, j) attends to
k_self[i, j] and k_nb[i, j] only. That makes both directions embarrassingly
parallel:

  forward: one fused pass reusing vil_kernel._attend_row with the
      2-part concat [self ‖ sampled] (+ global K rows at the tail, v7
      layout); mask/bias arrive in TAIL order [self ‖ nb ‖ glo] as device
      arrays (the per-mode tables are gathered from an 8-stack XLA-side —
      one compilation serves all modes).
  backward: single fused pass (no stash, no cross-row accumulation):
      recompute P/dS, dQ = dS·[K_cat] in one GEMM, dK/dV via ONE wide
      (my, 2W²+Nglo, G·M) transposed GEMM per tensor whose self/sampled
      slices go to separate outputs — the inverse roll of the sampled-block
      grads is XLA autodiff's job (the custom_vjp boundary takes k_nb/v_nb
      as inputs, so d(roll) is derived for free). dbias AND dK_glo/dV_glo
      accumulate in-kernel across the grid (r3 — the former pg/dS_glo
      outputs fed XLA epilogue einsums with relayout-copy costs).

Replaces the pure-XLA tier for MODE>0 training steps (it remains the
fallback for attention dropout / mode -1 / CPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vil_backward import (
    _head_groups,
    _probs_lse,
    _probs_softmax,
    _score_dtype,
    _stack_bd,
)
from .vil_kernel import _attend_row

INTERPRET = False

# whole-image variant budget (bytes); tests monkeypatch to 0 / huge
WHOLE_IMAGE_VMEM_BYTES = 48 * 2**20

_NEG_INF = float(np.finfo(np.float32).min) / 2


def _cat2(a, b, extra=None):
    """(my, W², C) × 2 (+ (my, Nglo, C)) → (my, 2W²[+Nglo], C)."""
    parts = [a, b]
    if extra is not None:
        parts.append(extra.astype(a.dtype))
    return jnp.concatenate(parts, axis=1)


def _fwd_row(groups, M, q_row, ks, knb, vs, vnb, kg_row, vg_row, bias_grp,
             mask, mask2, out_row, lse_out=None, comb_row=None):
    k_cat = _cat2(ks, knb, kg_row)
    v_cat = _cat2(vs, vnb, vg_row)  # global V rides the PV GEMM too (v8)
    _attend_row(
        q_row, k_cat, v_cat, bias_grp, mask, mask2, groups, M, out_row,
        lse_out, comb_row,
        # mode layout is [self W² ‖ neighbor W² ‖ glo]: the never-masked
        # self block (FAST_MAX's reduce window) leads the concat
        center_part=0,
    )


def _fwd_kernel_row(nglo, w2, num_heads, groups, has_bias, with_lse, *refs):
    """Row-grid forward body (grid (B, mx)). refs:
    [q, k_self, k_nb, v_self, v_nb, (kg_row, vg_row)?, (bias_tail)?, mask,
    out, (lse_row)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    ks_ref = refs[i]; i += 1
    knb_ref = refs[i]; i += 1
    vs_ref = refs[i]; i += 1
    vnb_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    bias_tail = None
    if has_bias:
        bias_tail = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_out = [] if with_lse else None
    M = q_ref.shape[-1] // num_heads
    n_pair = sum(1 for g in groups if len(g) == 2)
    mask = mask_ref[0]
    mask2 = jnp.concatenate([mask, mask], axis=1) if n_pair else None
    _fwd_row(
        groups, M, q_ref[0, 0], ks_ref[0, 0], knb_ref[0, 0],
        vs_ref[0, 0], vnb_ref[0, 0], kg_row, vg_row,
        _pair_bias(bias_tail, groups), mask, mask2, (out_ref, (0, 0)), lse_out,
    )
    if with_lse:
        lse_ref = refs[i]
        for h in range(num_heads):
            lse_ref[0, h, 0] = lse_out[h]


def _fwd_kernel_img(nglo, w2, mx, num_heads, groups, has_bias, with_lse,
                    class_of, n_comb, *refs):
    """Whole-image forward body (grid (B,)); rows unrolled statically.
    With ``class_of`` the separate bias/mask refs are replaced by the
    combined row-class tables (mode_tail_mask_classes / build_comb +
    pair_comb_tables; ``n_comb`` refs)."""
    i = 0
    q_ref = refs[i]; i += 1
    ks_ref = refs[i]; i += 1
    knb_ref = refs[i]; i += 1
    vs_ref = refs[i]; i += 1
    vnb_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    bias_tail = mask_ref = None
    comb_refs = ()
    if class_of is not None:
        comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    else:
        if has_bias:
            bias_tail = refs[i]; i += 1
        mask_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_ref = refs[i] if with_lse else None
    M = q_ref.shape[-1] // num_heads
    n_pair = sum(1 for g in groups if len(g) == 2)
    comb_pair = _comb_pair(comb_refs, groups) if comb_refs else None
    bias_grp = _pair_bias(bias_tail, groups)
    for r in range(mx):
        lse_out = [] if with_lse else None
        mask = mask2 = None
        if mask_ref is not None:
            mask = mask_ref[r]
            if n_pair:
                mask2 = jnp.concatenate([mask, mask], axis=1)
        _fwd_row(
            groups, M, q_ref[0, r], ks_ref[0, r],
            knb_ref[0, r], vs_ref[0, r], vnb_ref[0, r], kg_row, vg_row,
            bias_grp, mask, mask2, (out_ref, (0, r)), lse_out,
            comb_row=(
                None if comb_pair is None else (comb_pair, class_of[r])
            ),
        )
        if with_lse:
            for h in range(num_heads):
                lse_ref[0, h, r] = lse_out[h]


def _bwd_row(nglo, w2, H, groups, has_bias, q_row, ks, knb, vs, vnb, kg_row,
             vg_row, bias_grp, mask, lse_ref, g_row, outs, r, comb_row=None):
    """Backward for one chunk-row. ``outs`` = (dq, dks, dknb, dvs, dvnb)
    refs indexed at [0, r]; returns (per-head dbias list, dkg_row, dvg_row)
    where dkg_row/dvg_row are per-(glo index, group) (1, G·M) f32
    contributions — dK_glo/dV_glo accumulate IN-KERNEL (r3; the former
    pg/dS_glo HBM outputs fed XLA epilogue einsums that materialized f32
    relayout copies of the whole q/g, like the full-neighborhood path's
    pre-r2 design).
    ``lse_ref`` (1, H, rows, my, W²) | None: forward-stashed log-sum-exp —
    normalized probs in one exp pass (see vil_backward._bwd_kernel_img).
    ``comb_row`` (combp_ref, combs_ref, rc) | None: combined bias+mask class
    slabs — one VPU score add (see mode_tail_mask_classes).

    ``groups`` (static tuple from vil_backward._head_groups): head PAIRS are
    processed through merged GEMMs with block-diagonal stacked operands
    (vil_backward._stack_bd) — halving the MXU macro-passes of the
    K/N-starved per-head GEMMs; ``bias_grp`` is the per-group pre-stacked
    bias list (None entries without bias)."""
    k_cat = _cat2(ks, knb, kg_row)
    v_cat = _cat2(vs, vnb, vg_row)  # global V rides the dP GEMM too
    C = q_row.shape[-1]
    M = C // H
    nloc = 2 * w2
    dq_ref, dks_ref, dknb_ref, dvs_ref, dvnb_ref = outs
    db = [None] * H
    nG = len(groups)
    dkg_row = [[None] * nG for _ in range(nglo)]
    dvg_row = [[None] * nG for _ in range(nglo)]
    n_pair = sum(1 for grp in groups if len(grp) == 2)
    mask2 = None
    if mask is not None and n_pair:
        mask2 = jnp.concatenate([mask, mask], axis=1)
    for gidx, grp in enumerate(groups):
        G = len(grp)
        hs = grp[0] * M
        gm = G * M
        q_g = q_row[..., hs : hs + gm]
        k_g = k_cat[..., hs : hs + gm].astype(q_g.dtype)
        v_g = v_cat[..., hs : hs + gm].astype(q_g.dtype)
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
        # (my, G·W², 2W²+Nglo) — bf16 under BF16_SCORES via epilogue cast
        # (Mosaic requires a 32-bit matmul accumulator)
        if comb_row is not None:
            combp_ref, combs_ref, rc = comb_row
            if G == 2:
                scores = scores + combp_ref[
                    gidx if combp_ref.shape[0] > 1 else 0, rc
                ]
            else:
                scores = scores + combs_ref[
                    grp[0] if combs_ref.shape[0] > 1 else 0, rc
                ]
        else:
            if has_bias:
                scores = scores + bias_grp[gidx][None]
            scores = scores + (mask2 if G == 2 else mask)
        if lse_ref is not None:
            if G == 2:
                lse_row = jnp.concatenate(
                    [lse_ref[0, grp[0], r], lse_ref[0, grp[1], r]], axis=1
                )  # (my, 2W²), head-major rows like the scores
            else:
                lse_row = lse_ref[0, grp[0], r]
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
        p_c = p.astype(q_g.dtype)
        dq_out = jax.lax.dot_general(
            ds_c, k_g, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (my, G·W², G·M) — global term included (kg in the concat);
        # for a pair only the diagonal (row block j, lane block j) is valid
        for j, h in enumerate(grp):
            dq_ref[0, r, :, :, h * M : (h + 1) * M] = dq_out[
                :, j * w2 : (j + 1) * w2, j * M : (j + 1) * M
            ].astype(dq_ref.dtype)
        # ONE wide (my, 2W²+Nglo, G·M) transposed-contribution GEMM per
        # tensor, then static sublane slices — the global columns ride the
        # SAME GEMMs (output area grows by Nglo/2W² ≈ 1%) and dK_glo/dV_glo
        # become a (1, G·M) slice + reduce, mirroring the full-neighborhood
        # whole-image kernel (vil_backward._bwd_kernel_img).
        dk_wide = jax.lax.dot_general(
            ds_c, q_in, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (my, 2W²+Nglo, G·M) — block-diag q_in separates the heads' lanes
        dv_wide = jax.lax.dot_general(
            p_c, g_in, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for c0, dk_ref_, dv_ref_ in (
            (0, dks_ref, dvs_ref), (w2, dknb_ref, dvnb_ref)
        ):
            dk_ref_[0, r, :, :, hs : hs + gm] = dk_wide[
                :, c0 : c0 + w2
            ].astype(dk_ref_.dtype)
            dv_ref_[0, r, :, :, hs : hs + gm] = dv_wide[
                :, c0 : c0 + w2
            ].astype(dv_ref_.dtype)
        for gi in range(nglo):
            # 3-D slice keeps the reduce on the UNTILED major (my) axis
            # (a 2-D slice would put my on sublanes at the glo row's nonzero
            # sublane offset, which Mosaic's multi_reduction rejects)
            g0 = nloc + gi
            dkg_row[gi][gidx] = jnp.sum(
                dk_wide[:, g0 : g0 + 1, :], axis=0
            )  # (1, G·M)
            dvg_row[gi][gidx] = jnp.sum(dv_wide[:, g0 : g0 + 1, :], axis=0)
        if has_bias:
            for j, h in enumerate(grp):
                db[h] = jnp.sum(
                    ds[:, j * w2 : (j + 1) * w2], axis=0
                )  # (W², cols) f32, tail order
    return db, dkg_row, dvg_row


def _split_bwd_refs(nglo, has_bias, with_lse, n_comb, refs):
    i = 0
    q_ref = refs[i]; i += 1
    ks_ref = refs[i]; i += 1
    knb_ref = refs[i]; i += 1
    vs_ref = refs[i]; i += 1
    vnb_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    bias_tail = mask_ref = None
    comb_refs = ()
    if n_comb:
        comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    else:
        if has_bias:
            bias_tail = refs[i]; i += 1
        mask_ref = refs[i]; i += 1
    g_ref = refs[i]; i += 1
    lse_ref = None
    if with_lse:
        lse_ref = refs[i]; i += 1
    outs = tuple(refs[i : i + 5]); i += 5
    dkg_ref = dvg_ref = None
    if nglo > 0:
        dkg_ref = refs[i]; i += 1  # (1, Nglo, C) f32 per-image accumulators
        dvg_ref = refs[i]; i += 1
    dbias_ref = refs[i] if has_bias else None
    return (q_ref, ks_ref, knb_ref, vs_ref, vnb_ref, kg_row, vg_row,
            bias_tail, mask_ref, comb_refs, g_ref, lse_ref, outs,
            dkg_ref, dvg_ref, dbias_ref)


def _comb_pair(comb_refs, groups):
    """(combp_ref | None, combs_ref | None) from the kernel's table refs:
    [pair table][, singleton table] when pairs exist, else [full table]."""
    n_pair = sum(1 for grp in groups if len(grp) == 2)
    n_single = sum(1 for grp in groups if len(grp) == 1)
    it = iter(comb_refs)
    combp = next(it) if n_pair else None
    combs = next(it) if n_single else None
    return combp, combs


def _pair_bias(bias_tail, groups):
    """Per-group pre-stacked bias rows (pair rows concatenated on the query
    axis), hoisted out of the row loops."""
    if bias_tail is None:
        return None
    return [
        jnp.concatenate([bias_tail[grp[0]], bias_tail[grp[1]]], axis=0)
        if len(grp) == 2 else bias_tail[grp[0]]
        for grp in groups
    ]


def _bwd_kernel_row(nglo, w2, H, groups, has_bias, with_lse, *refs):
    (q_ref, ks_ref, knb_ref, vs_ref, vnb_ref, kg_row, vg_row, bias_tail,
     mask_ref, _comb, g_ref, lse_ref, outs, dkg_ref, dvg_ref,
     dbias_ref) = _split_bwd_refs(nglo, has_bias, with_lse, 0, refs)
    b_idx, i_idx = pl.program_id(0), pl.program_id(1)
    first = jnp.logical_and(b_idx == 0, i_idx == 0)
    # row-grid blocks are (1, 1, ...): re-point outs at row index 0
    db, dkg_row, dvg_row = _bwd_row(
        nglo, w2, H, groups, has_bias, q_ref[0, 0], ks_ref[0, 0],
        knb_ref[0, 0], vs_ref[0, 0], vnb_ref[0, 0], kg_row, vg_row,
        _pair_bias(bias_tail, groups), mask_ref[0],
        lse_ref, g_ref[0, 0], outs, 0,
    )
    # dK_glo/dV_glo: (b, i) grid steps for one image are consecutive (i is
    # the inner dim), so the constant-index (1, Nglo, C) output block
    # accumulates per image across chunk rows
    for gi in range(nglo):
        dkg_t = jnp.concatenate(dkg_row[gi], axis=-1)  # (1, C) f32
        dvg_t = jnp.concatenate(dvg_row[gi], axis=-1)

        @pl.when(i_idx == 0)
        def _(gi=gi, dkg_t=dkg_t, dvg_t=dvg_t):
            dkg_ref[0, gi : gi + 1] = dkg_t
            dvg_ref[0, gi : gi + 1] = dvg_t

        @pl.when(i_idx != 0)
        def _(gi=gi, dkg_t=dkg_t, dvg_t=dvg_t):
            dkg_ref[0, gi : gi + 1] += dkg_t
            dvg_ref[0, gi : gi + 1] += dvg_t
    if has_bias:
        for h in range(H):
            @pl.when(first)
            def _(h=h):
                dbias_ref[h] = db[h]

            @pl.when(jnp.logical_not(first))
            def _(h=h):
                dbias_ref[h] += db[h]


def _bwd_kernel_img(nglo, w2, mx, H, groups, has_bias, with_lse, class_of,
                    n_comb, *refs):
    (q_ref, ks_ref, knb_ref, vs_ref, vnb_ref, kg_row, vg_row, bias_tail,
     mask_ref, comb_refs, g_ref, lse_ref, outs, dkg_ref, dvg_ref,
     dbias_ref) = _split_bwd_refs(nglo, has_bias, with_lse, n_comb, refs)
    b_idx = pl.program_id(0)
    combp_ref = combs_ref = None
    if comb_refs:
        combp_ref, combs_ref = _comb_pair(comb_refs, groups)
    bias_grp = _pair_bias(bias_tail, groups)
    nG = len(groups)
    db_acc = [None] * H
    dkg_acc = [[None] * nG for _ in range(nglo)]
    dvg_acc = [[None] * nG for _ in range(nglo)]
    for r in range(mx):
        db, dkg_row, dvg_row = _bwd_row(
            nglo, w2, H, groups, has_bias, q_ref[0, r], ks_ref[0, r],
            knb_ref[0, r], vs_ref[0, r], vnb_ref[0, r], kg_row, vg_row,
            bias_grp,
            mask_ref[r] if mask_ref is not None else None,
            lse_ref, g_ref[0, r], outs, r,
            comb_row=(
                None if not comb_refs
                else (combp_ref, combs_ref, class_of[r])
            ),
        )
        for gi in range(nglo):
            for gidx in range(nG):
                dkg_acc[gi][gidx] = (
                    dkg_row[gi][gidx] if dkg_acc[gi][gidx] is None
                    else dkg_acc[gi][gidx] + dkg_row[gi][gidx]
                )
                dvg_acc[gi][gidx] = (
                    dvg_row[gi][gidx] if dvg_acc[gi][gidx] is None
                    else dvg_acc[gi][gidx] + dvg_row[gi][gidx]
                )
        if has_bias:
            for h in range(H):
                db_acc[h] = db[h] if db_acc[h] is None else db_acc[h] + db[h]
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


def _common_specs(B, mx, my, w2, C, nglo, has_bias, cols, whole_image, H,
                  comb_shape=None):
    """(in_specs for [q, ks, knb, vs, vnb, (kg,vg)?, comb | ((bias)?, mask)],
    img/row spec, const3 index map). ``comb_shape``: whole-image combined
    bias+mask class table replaces the separate bias/mask specs."""
    if whole_image:
        img_spec = pl.BlockSpec(
            (1, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        glo_idx = lambda b: (b, 0, 0, 0)
        const3 = lambda b: (0, 0, 0)
        mask_spec = pl.BlockSpec(
            (mx, my, w2, cols), lambda b: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        img_spec = pl.BlockSpec(
            (1, 1, my, w2, C), lambda b, i: (b, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        glo_idx = lambda b, i: (b, 0, 0, 0)
        const3 = lambda b, i: (0, 0, 0)
        mask_spec = pl.BlockSpec(
            (1, my, w2, cols), lambda b, i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    in_specs = [img_spec] * 5
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, my, nglo, C), glo_idx, memory_space=pltpu.VMEM
        )
        in_specs += [glo_spec, glo_spec]
    if comb_shape is not None:
        in_specs.append(
            pl.BlockSpec(comb_shape, lambda b: (0,) * 5,
                         memory_space=pltpu.VMEM)
        )
    else:
        if has_bias:
            in_specs.append(
                pl.BlockSpec((H, w2, cols), const3, memory_space=pltpu.VMEM)
            )
        in_specs.append(mask_spec)
    return in_specs, img_spec, const3


def mode_tail_mask(mx, my, padx, pady, w, exact, mode, nglo):
    """Additive f32 validity mask in TAIL order ([self ‖ nb ‖ glo]),
    expanded on device to (mx, my, W², 2W²+Nglo). For a traced ``mode`` the
    per-mode table is a dynamic gather from the 8-stack — one compilation
    serves all sampled blocks (masks.all_mode_masks)."""
    from .. import masks as masks_lib

    w2 = w * w

    def to_add(tbl):  # bool (…, mx·my, 2W²) → additive with zero glo cols
        add = np.where(tbl, _NEG_INF, 0.0).astype(np.float32)
        add = add.reshape(add.shape[:-2] + (mx, my, 1, 2 * w2))
        if nglo > 0:
            zeros = np.zeros(add.shape[:-1] + (nglo,), np.float32)
            add = np.concatenate([add, zeros], axis=-1)
        return add

    if isinstance(mode, (int, np.integer)):
        add = to_add(masks_lib.invalid_mask(mx, my, padx, pady, w, exact,
                                            int(mode)))
        sel = jnp.asarray(add)
    else:
        add = to_add(masks_lib.all_mode_masks(mx, my, padx, pady, w, exact))
        sel = jnp.asarray(add)[mode - 1]
    return jnp.broadcast_to(sel, (mx, my, w2, 2 * w2 + nglo))


def mode_tail_mask_classes(mx, my, padx, pady, w, exact, mode, nglo):
    """Row-class variant of mode_tail_mask for the whole-image kernels.

    Returns ``(classes_sel, class_of)``: classes_sel (ncls, my, 1, cols) f32
    device array — the ≤4 distinct chunk-row mask slabs, gathered from an
    8-stack when ``mode`` is traced — and class_of, a length-mx tuple of
    STATIC ints. The row partition is computed across ALL 8 modes jointly
    (rows share a class iff their masks agree for every mode), so a single
    static class_of serves every sampled mode under one compilation. The
    whole-image kernels' statically-unrolled row loops index the class table
    at trace time; combined with the RPE bias (vil_kernel.build_comb) the
    per-head score adjustment is ONE VPU add."""
    from .. import masks as masks_lib

    w2 = w * w

    def to_add(tbl):
        add = np.where(tbl, _NEG_INF, 0.0).astype(np.float32)
        add = add.reshape(add.shape[:-2] + (mx, my, 1, 2 * w2))
        if nglo > 0:
            zeros = np.zeros(add.shape[:-1] + (nglo,), np.float32)
            add = np.concatenate([add, zeros], axis=-1)
        return add

    all_add = to_add(masks_lib.all_mode_masks(mx, my, padx, pady, w, exact))
    # per-row fingerprint across all 8 modes → one static partition
    fp = all_add.transpose(1, 0, 2, 3, 4).reshape(mx, -1)
    _, rep_idx, class_of = np.unique(
        fp, axis=0, return_index=True, return_inverse=True
    )
    classes_all = all_add[:, rep_idx]  # (8, ncls, my, 1, cols)
    if isinstance(mode, (int, np.integer)):
        sel = jnp.asarray(classes_all[int(mode) - 1])
    else:
        sel = jnp.asarray(classes_all)[mode - 1]
    return sel, tuple(int(c) for c in np.asarray(class_of).ravel())


def mode_forward(q, ks, knb, vs, vnb, k_glo, v_glo, bias_tail, mask_tail,
                 num_heads, *, interpret=None, with_lse=False,
                 class_of=None):
    """Fused sampled-mode forward. q/ks/knb/vs/vnb: (B, mx, my, W², C);
    k_glo/v_glo (B, Nglo, C) | None; bias_tail (H, W², 2W²+Nglo) f32 | None
    (TAIL order [self ‖ nb ‖ glo], may be traced); mask_tail
    (mx, my, W², 2W²+Nglo) f32 additive device array — or, with
    ``class_of`` (static row-class tuple from mode_tail_mask_classes), the
    (ncls, my, 1, cols) class table. With ``with_lse`` returns (out, lse),
    lse (B, H, mx, my, W²) f32 — the per-query log-sum-exp consumed by
    mode_backward."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias_tail is not None
    cols = 2 * w2 + nglo
    if interpret is None:
        interpret = INTERPRET

    tab_bytes = (
        (num_heads if has_bias else 1) * mask_tail.shape[0] * my * w2 * cols * 4
        if class_of is not None else mx * my * w2 * cols * 4
    )
    # the mx·H·(live f32 score temps) term counts fully: Mosaic's scoped
    # stack does not reuse slots across the statically-unrolled iterations
    # (see vil_backward.vil_attention_backward)
    img_bytes = (
        mx * num_heads * 3 * my * w2 * cols * 4
        + 6 * 2 * (q.size // B) * q.dtype.itemsize
        + tab_bytes
    )
    whole_image = img_bytes <= WHOLE_IMAGE_VMEM_BYTES
    use_comb = class_of is not None and whole_image
    groups = _head_groups(num_heads, C // num_heads)
    comb_tables = []
    if use_comb:
        from .vil_backward import pair_comb_tables
        from .vil_kernel import build_comb

        comb_tables = [
            t.astype(_score_dtype(q.dtype))
            for t in pair_comb_tables(
                build_comb(mask_tail, bias_tail, w2), groups, num_heads
            )
        ]
    elif class_of is not None:
        # row-grid fallback indexes mask blocks by the traced grid row —
        # reconstruct the full (mx, my, W², cols) table from the classes
        mask_tail = jnp.broadcast_to(
            mask_tail[np.asarray(class_of)], (mx, my, w2, cols)
        )
    in_specs, img_spec, const3 = _common_specs(
        B, mx, my, w2, C, nglo, has_bias, cols, whole_image, num_heads,
        comb_shape=comb_tables[0].shape if use_comb else None,
    )
    if use_comb and len(comb_tables) > 1:
        in_specs.append(pl.BlockSpec(
            comb_tables[1].shape, lambda b: (0,) * 5,
            memory_space=pltpu.VMEM,
        ))
    operands = [q, ks, knb, vs, vnb]
    if nglo > 0:
        # global K AND V rows pre-broadcast over my: both ride the
        # neighborhood concats so the score and PV GEMMs cover the global
        # columns (v8 — the per-head VPU mul+reduce glo term is gone)
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
        glo_bcast = pl.BlockSpec(
            (1, my, nglo, C),
            (lambda b: (b, 0, 0, 0)) if whole_image
            else (lambda b, i: (b, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        in_specs[5] = glo_bcast
        in_specs[6] = glo_bcast
    if use_comb:
        operands.extend(comb_tables)
    else:
        if has_bias:
            operands.append(bias_tail.astype(_score_dtype(q.dtype)))
        operands.append(mask_tail.astype(_score_dtype(q.dtype)))

    kernel = (
        functools.partial(
            _fwd_kernel_img, nglo, w2, mx, num_heads, groups, has_bias,
            with_lse, class_of if use_comb else None, len(comb_tables))
        if whole_image
        else functools.partial(
            _fwd_kernel_row, nglo, w2, num_heads, groups, has_bias, with_lse)
    )
    out_specs = img_spec
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if with_lse:
        lse_spec = pl.BlockSpec(
            (1, num_heads, mx, my, w2) if whole_image
            else (1, num_heads, 1, my, w2),
            (lambda b: (b, 0, 0, 0, 0)) if whole_image
            else (lambda b, i: (b, 0, i, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        out_specs = [out_specs, lse_spec]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, num_heads, mx, my, w2), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=(B,) if whole_image else (B, mx),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def mode_backward(q, ks, knb, vs, vnb, k_glo, v_glo, bias_tail, mask_tail,
                  g, num_heads, *, lse=None, interpret=None, class_of=None):
    """Fused sampled-mode backward. Returns
    (dq, dks, dknb, dvs, dvnb, dkg, dvg, dbias_tail). ``lse`` is the
    forward-stashed log-sum-exp (see mode_forward with_lse); ``class_of``/
    class-table ``mask_tail`` as in mode_forward."""
    B, mx, my, w2, C = q.shape
    H = num_heads
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias_tail is not None
    cols = 2 * w2 + nglo
    if interpret is None:
        interpret = INTERPRET

    tab_bytes = (
        (H if has_bias else 1) * mask_tail.shape[0] * my * w2 * cols * 4
        if class_of is not None else mx * my * w2 * cols * 4
    )
    img_bytes = (
        mx * H * 6 * my * w2 * cols * 4  # unrolled-iteration f32 stack
        + 11 * 2 * (q.size // B) * q.dtype.itemsize
        + tab_bytes
    )
    whole_image = img_bytes <= WHOLE_IMAGE_VMEM_BYTES
    use_comb = class_of is not None and whole_image
    groups = _head_groups(H, C // H)
    comb_tables = []
    if use_comb:
        from .vil_backward import pair_comb_tables
        from .vil_kernel import build_comb

        comb_tables = [
            t.astype(_score_dtype(q.dtype))
            for t in pair_comb_tables(
                build_comb(mask_tail, bias_tail, w2), groups, H
            )
        ]
    elif class_of is not None:
        mask_tail = jnp.broadcast_to(
            mask_tail[np.asarray(class_of)], (mx, my, w2, cols)
        )
    in_specs, img_spec, const3 = _common_specs(
        B, mx, my, w2, C, nglo, has_bias, cols, whole_image, H,
        comb_shape=comb_tables[0].shape if use_comb else None,
    )
    if use_comb and len(comb_tables) > 1:
        # trailing odd head's singleton table rides an extra const spec
        # (the comb spec from _common_specs is the pair table, appended last)
        in_specs.append(pl.BlockSpec(
            comb_tables[1].shape, lambda b: (0,) * 5,
            memory_space=pltpu.VMEM,
        ))
    in_specs.append(img_spec)  # g
    operands = [q, ks, knb, vs, vnb]
    if nglo > 0:
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    if use_comb:
        operands.extend(comb_tables)
    else:
        if has_bias:
            operands.append(bias_tail.astype(_score_dtype(q.dtype)))
        operands.append(mask_tail.astype(_score_dtype(q.dtype)))
    operands.append(g)
    if lse is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, H, mx, my, w2) if whole_image else (1, H, 1, my, w2),
                (lambda b: (b, 0, 0, 0, 0)) if whole_image
                else (lambda b, i: (b, 0, i, 0, 0)),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(lse)

    out_specs = [img_spec] * 5
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype) for _ in range(5)]
    if nglo > 0:
        # dK_glo/dV_glo accumulate IN-KERNEL (r3): per-image (1, Nglo, C)
        # f32 blocks, constant over the row-grid's inner i dim so the
        # accumulation spans one image's consecutive grid steps
        glo_out_spec = pl.BlockSpec(
            (1, nglo, C),
            (lambda b: (b, 0, 0)) if whole_image else (lambda b, i: (b, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        out_specs += [glo_out_spec, glo_out_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), const3, memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))

    kernel = (
        functools.partial(
            _bwd_kernel_img, nglo, w2, mx, H, groups, has_bias,
            lse is not None, class_of if use_comb else None,
            len(comb_tables))
        if whole_image
        else functools.partial(
            _bwd_kernel_row, nglo, w2, H, groups, has_bias, lse is not None)
    )
    results = pl.pallas_call(
        kernel,
        grid=(B,) if whole_image else (B, mx),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dq, dks, dknb, dvs, dvnb = (next(it) for _ in range(5))
    dkg = dvg = dbias = None
    if nglo > 0:
        dkg = next(it).astype(k_glo.dtype)
        dvg = next(it).astype(v_glo.dtype)
    if has_bias:
        dbias = next(it)  # (H, W², cols) f32, tail order
    return dq, dks, dknb, dvs, dvnb, dkg, dvg, dbias


def make_fused_mode_attention(num_heads: int, class_of=None):
    """custom_vjp wrapper: fused(q, ks, knb, vs, vnb, kg, vg, bias_tail,
    mask_tail) → (B, mx, my, W², C).

    bias_tail/mask_tail are TAIL-order ([self ‖ nb ‖ glo]) and may be traced
    (per-mode gathers) — bias is differentiable (RPE table), mask gets a
    symbolic-zero gradient. With ``class_of`` the mask_tail argument is the
    (ncls, my, 1, cols) row-class table from mode_tail_mask_classes. The
    k_nb/v_nb inputs are the PRE-ROLLED sampled blocks; taking them as
    custom_vjp inputs makes XLA derive the inverse roll for dK/dV
    automatically."""

    from .vil_kernel import hint_default_layout

    @jax.custom_vjp
    def fused(q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail):
        q, ks, knb, vs, vnb = hint_default_layout(q, ks, knb, vs, vnb)
        return mode_forward(
            q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail, num_heads,
            class_of=class_of,
        )

    def fwd(q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail):
        q, ks, knb, vs, vnb = hint_default_layout(q, ks, knb, vs, vnb)
        # train-path forward stashes the per-query log-sum-exp so the
        # backward recomputes normalized probs in one exp pass
        out, lse = mode_forward(
            q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail, num_heads,
            with_lse=True, class_of=class_of,
        )
        return out, (q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail, lse)

    def bwd(res, g):
        q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail, lse = res
        g = hint_default_layout(g)
        dq, dks, dknb, dvs, dvnb, dkg, dvg, dbias = mode_backward(
            q, ks, knb, vs, vnb, kg, vg, bias_tail, mask_tail, g, num_heads,
            lse=lse, class_of=class_of,
        )
        return (
            dq, dks, dknb, dvs, dvnb,
            dkg if kg is not None else None,
            dvg if vg is not None else None,
            dbias.astype(bias_tail.dtype) if bias_tail is not None else None,
            jnp.zeros_like(mask_tail),
        )

    fused.defvjp(fwd, bwd)
    return fused
