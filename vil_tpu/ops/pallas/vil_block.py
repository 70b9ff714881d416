"""Fused ATTENTION-BLOCK Pallas kernel: QKV projections + 2-D sliding-chunk
attention + output projection in ONE whole-image kernel (v9).

Why: the standalone attention kernels pin row-major operand layouts, but
XLA lowers the surrounding Dense projections on the 5-D chunked activations
as 1×1 convolutions whose TPU output layout puts the batch in sublanes —
every kernel operand (q/k/v) and cotangent (dq/dk/dv/g) therefore pays a
standalone relayout copy, ~4.9 ms/step at ViL-Small 224 b64 (the "relayout
tax", docs/BENCHMARKS.md). Both XLA-side attacks failed (2-D-dot
flattening, with_layout_constraint — measured and documented); this kernel
removes the boundary instead: its operands are the LayerNorm output ``x``
(an elementwise fusion, whose layout XLA can produce to order for free) and
the projection weight matrices, so no conv output ever feeds a Pallas
custom call. The projections ride the MXU in-kernel; the backward emits
``dx`` and the weight/bias gradients directly, so the conv GRADIENTS (the
other relayout consumers) disappear too.

Scope: the whole-image mode-0 path (the 224² hot path). Shapes that don't
fit the whole-image VMEM budgets never route here — models/attention.py
gates on ``block_fits`` and keeps them on the classic split kernels (which
have row-grid/tiled tiers); the in-wrapper fallback to the differentiable
XLA reference exists for off-TPU correctness only.

VERDICT (measured, 1× v5e ViL-Small 224 b64): a DEAD END — default OFF
(VIL_TPU_FUSED_BLOCK=0). Train 1517 vs 1668 img/s, inference 6712 vs 6745:
the relayout copies it removes are cheaper than what it adds — the
projections become my-batched (W², C)·(C, C) MXU dots (vs XLA's
all-tokens conv GEMMs at near-peak), and the backward re-projects q/k/v
and runs every dW GEMM in-kernel. Third documented angle on the relayout
tax after 2-D-dot flattening and with_layout_constraint
(docs/BENCHMARKS.md).

The kernel also OUTPUTS the projected k/v image tensors: under shared
weights the model's global-token branch consumes the same k/v
(models/attention.py); their cotangents are folded into dx/dW with plain
XLA GEMMs in the VJP (no Pallas boundary, no conv).

Reference behavior: longformer2d.py:152-200 (projections + local attention
+ proj); the reference runs these as four separate cuBLAS/TVM calls.
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
from .vil_backward import (
    WHOLE_IMAGE_VMEM_BYTES as BWD_BUDGET,
    _head_groups,
    _probs_lse,
    _roll0,
    _stack_bd,
    pair_comb_tables,
)
from .vil_kernel import (
    WHOLE_IMAGE_VMEM_BYTES as FWD_BUDGET,
    _attend_row,
    _comb_pair_refs,
    _nbh_rows,
    build_comb,
    tail_mask_classes,
)

INTERPRET = False


def _mm_rows(t, w_b):
    """(my, W², C) · pre-broadcast (my, C, C) weights → (my, W², C), as an
    my-BATCHED MXU dot. A flat (my·W², C) 2-D GEMM would be denser, but the
    (my, W²) merge is an unaligned sublane reshape Mosaic rejects
    (W² = 49 ∤ the 8-sublane tile); weights are broadcast over my XLA-side
    (tiny) because in-kernel broadcasts lower as unsupported gathers."""
    return jax.lax.dot_general(
        t, w_b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _project_rows(x_ref, w_b, b, mx, dtype):
    """All chunk rows through one projection, in-kernel. ``b``: bias
    pre-broadcast to (W², C) f32 (the in-kernel add then only broadcasts
    over the MAJOR my axis — sublane broadcasts crash Mosaic). Separate
    per-projection weights (not a packed (C, 3C) matrix): lane-slicing a
    packed output at offsets C/2C leaves offset-carrying vectors Mosaic's
    concat/reshape lowerings reject."""
    rows = []
    for r in range(mx):
        y = _mm_rows(x_ref[0, r], w_b)
        if b is not None:
            y = y + b[None]
        rows.append(y.astype(dtype))
    return rows


def _block_fwd_kernel(nglo, w2, mx, my, H, groups, has_qkv_bias, with_lse,
                      class_of, n_comb, *refs):
    """Whole-image fused-block forward (grid (B,)).

    refs: [x, wq, wk, wv, (bq, bk, bv)?, wo, bo, (kg_row, vg_row)?,
    comb×n_comb, y_out, k_out, v_out, (lse)?, attn_scratch].

    wq arrives with the attention scale FOLDED IN (wq·M^-1/2, bq·M^-1/2,
    XLA-side); kg_row/vg_row are the PROJECTED global K/V rows
    (pre-broadcast over my) — the global tokens' kv projection happens
    XLA-side on the tiny (B, Nglo, C) x_glo."""
    i = 0
    x_ref = refs[i]; i += 1
    wq_ref = refs[i]; i += 1
    wk_ref = refs[i]; i += 1
    wv_ref = refs[i]; i += 1
    bq = bk = bv = None
    if has_qkv_bias:
        bq = refs[i][...]; i += 1  # (W², C) f32, pre-broadcast
        bk = refs[i][...]; i += 1
        bv = refs[i][...]; i += 1
    wo_ref = refs[i]; i += 1  # weights (my, C, C), pre-broadcast
    bo = refs[i][...]; i += 1  # (W², C) f32
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    y_ref = refs[i]; i += 1
    k_out_ref = refs[i]; i += 1
    v_out_ref = refs[i]; i += 1
    lse_ref = None
    if with_lse:
        lse_ref = refs[i]; i += 1
    attn_ref = refs[i]  # VMEM scratch (my, W², C)

    C = x_ref.shape[-1]
    M = C // H
    dtype = y_ref.dtype
    comb_pair = _comb_pair_refs(comb_refs, groups)

    q_rows = _project_rows(x_ref, wq_ref[...], bq, mx, dtype)
    k_rows = _project_rows(x_ref, wk_ref[...], bk, mx, dtype)
    v_rows = _project_rows(x_ref, wv_ref[...], bv, mx, dtype)
    for r in range(mx):
        k_out_ref[0, r] = k_rows[r]
        v_out_ref[0, r] = v_rows[r]

    wo = wo_ref[...]
    for r in range(mx):
        k3 = [k_rows[(r + dx) % mx] for dx in (-1, 0, 1)]
        v3 = [v_rows[(r + dx) % mx] for dx in (-1, 0, 1)]
        lse_out = [] if with_lse else None
        _attend_row(
            q_rows[r], _nbh_rows(k3, my, kg_row), _nbh_rows(v3, my, vg_row),
            None, None, None, groups, M, (attn_ref, ()), lse_out,
            comb_row=(comb_pair, class_of[r]),
        )
        if with_lse:
            for h in range(H):
                lse_ref[0, h, r] = lse_out[h]
        # output projection rides the same kernel (my-batched dot)
        y = _mm_rows(attn_ref[...], wo) + bo[None]
        y_ref[0, r] = y.astype(dtype)


def _block_bwd_kernel(nglo, w2, mx, my, H, groups, has_qkv_bias,
                      has_rpe_bias, class_of, n_comb, *refs):
    """Whole-image fused-block backward (grid (B,)).

    refs: [x, wq, wk, wv, (bq, bk, bv)?, wo, woT, wqT, wkT, wvT,
    (kg_row, vg_row)?, comb×n_comb, g, lse,
    dx, dwq, dwk, dwv, (dbq, dbk, dbv)?, dwo, dbo, (dkg, dvg)?, (dbias)?,
    dq_scr, dk_scr(rows f32? no – see below), attn_scr].

    Recomputes q/k/v from x (same GEMMs as the forward), then per row:
    normalized probs from the stashed LSE, dS, the wide transposed dK/dV
    GEMMs with in-kernel dK_glo/dV_glo (the vil_backward._bwd_kernel_img
    math), attention-output recompute for dWo, and finally the projection
    backward: dx = dq·Wqᵀ + dk·Wkᵀ + dv·Wvᵀ and dW = xᵀ·d(·), accumulated
    in f32 across rows and the batch grid. The pair-diagonal dq head slices
    go through a VMEM scratch (stores relayout the sublane-offset vectors;
    concat would not — see vil_kernel._attend_row)."""
    i = 0
    x_ref = refs[i]; i += 1
    wq_ref = refs[i]; i += 1
    wk_ref = refs[i]; i += 1
    wv_ref = refs[i]; i += 1
    bq = bk = bv = None
    if has_qkv_bias:
        bq = refs[i][...]; i += 1
        bk = refs[i][...]; i += 1
        bv = refs[i][...]; i += 1
    woT_ref = refs[i]; i += 1
    wqT_ref = refs[i]; i += 1
    wkT_ref = refs[i]; i += 1
    wvT_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    g_ref = refs[i]; i += 1
    lse_ref = refs[i]; i += 1
    dx_ref = refs[i]; i += 1
    dwq_ref = refs[i]; i += 1
    dwk_ref = refs[i]; i += 1
    dwv_ref = refs[i]; i += 1
    dbq_ref = dbk_ref = dbv_ref = None
    if has_qkv_bias:
        dbq_ref = refs[i]; i += 1
        dbk_ref = refs[i]; i += 1
        dbv_ref = refs[i]; i += 1
    dwo_ref = refs[i]; i += 1
    dbo_ref = refs[i]; i += 1
    dkg_ref = dvg_ref = None
    if nglo > 0:
        dkg_ref = refs[i]; i += 1
        dvg_ref = refs[i]; i += 1
    dbias_ref = None
    if has_rpe_bias:
        dbias_ref = refs[i]; i += 1
    dq_scr = refs[i]; i += 1   # (my, W², C) bf16 VMEM scratch
    attn_scr = refs[i]         # (my, W², C) bf16 VMEM scratch

    b_idx = pl.program_id(0)
    C = x_ref.shape[-1]
    M = C // H
    dtype = x_ref.dtype
    nloc = 9 * w2
    nG = len(groups)
    comb_pair = _comb_pair_refs(comb_refs, groups)
    has_bias = has_rpe_bias

    q_rows = _project_rows(x_ref, wq_ref[...], bq, mx, dtype)
    k_rows = _project_rows(x_ref, wk_ref[...], bk, mx, dtype)
    v_rows = _project_rows(x_ref, wv_ref[...], bv, mx, dtype)

    woT = woT_ref[...]
    wqT = wqT_ref[...]
    wkT = wkT_ref[...]
    wvT = wvT_ref[...]

    dk_acc = [[None] * nG for _ in range(mx)]
    dv_acc = [[None] * nG for _ in range(mx)]
    db_acc = [None] * H
    dkg_acc = [[None] * nG for _ in range(nglo)]
    dvg_acc = [[None] * nG for _ in range(nglo)]
    dwq_acc = dwk_acc = dwv_acc = dwo_acc = None
    dbq_acc = dbk_acc = dbv_acc = dbo_acc = None
    dx_rows_qpart = [None] * mx

    for i_row in range(mx):
        k3 = [k_rows[(i_row + dx) % mx] for dx in (-1, 0, 1)]
        v3 = [v_rows[(i_row + dx) % mx] for dx in (-1, 0, 1)]
        k_nbh = _nbh_rows(k3, my, kg_row)
        v_nbh = _nbh_rows(v3, my, vg_row)
        q_row = q_rows[i_row]
        # dattn = g · Woᵀ (the proj backward), in place of the classic
        # kernel's g operand; my-batched dot — the flat (my·W², C) merge is
        # an unaligned sublane reshape Mosaic rejects (W² ∤ 8)
        g_row = g_ref[0, i_row]  # (my, W², C)
        dattn = _mm_rows(g_row, woT).astype(dtype)
        # bias-grad accumulators stay 3-D (my, 1, C): a 2-D (my, C)
        # sublane-reduced value carries an implicit-dim layout whose
        # accumulator add Mosaic rejects (invalid relayout)
        dbo_t = jnp.sum(g_row.astype(jnp.float32), axis=1, keepdims=True)
        dbo_acc = dbo_t if dbo_acc is None else dbo_acc + dbo_t
        rc = class_of[i_row]
        for gidx, grp in enumerate(groups):
            G = len(grp)
            hs = grp[0] * M
            gm = G * M
            q_g = q_row[..., hs : hs + gm]
            k_g = k_nbh[..., hs : hs + gm].astype(q_g.dtype)
            v_g = v_nbh[..., hs : hs + gm].astype(q_g.dtype)
            g_g = dattn[..., hs : hs + gm]
            if G == 2:
                q_in = _stack_bd(q_g, M)
                g_in = _stack_bd(g_g, M)
            else:
                q_in, g_in = q_g, g_g
            scores = jax.lax.dot_general(
                q_in, k_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            combp_ref, combs_ref = comb_pair
            if G == 2:
                scores = scores + combp_ref[
                    gidx if combp_ref.shape[0] > 1 else 0, rc
                ]
            else:
                scores = scores + combs_ref[
                    grp[0] if combs_ref.shape[0] > 1 else 0, rc
                ]
            if G == 2:
                lse_row = jnp.concatenate(
                    [lse_ref[0, grp[0], i_row], lse_ref[0, grp[1], i_row]],
                    axis=1,
                )
            else:
                lse_row = lse_ref[0, grp[0], i_row]
            p = _probs_lse(scores, lse_row, q_g.dtype)
            p_c = p.astype(q_g.dtype)
            # attention-output recompute for dWo (the forward's PV GEMM,
            # normalized probs): diagonal blocks via the scratch store
            attn_out = jax.lax.dot_general(
                p_c, v_g, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for j, h in enumerate(grp):
                attn_scr[:, :, h * M : (h + 1) * M] = attn_out[
                    :, j * w2 : (j + 1) * w2, j * M : (j + 1) * M
                ].astype(dtype)
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
                dq_scr[:, :, h * M : (h + 1) * M] = dq_out[
                    :, j * w2 : (j + 1) * w2, j * M : (j + 1) * M
                ].astype(dtype)
            if has_bias:
                db = jnp.sum(ds, axis=0)
                for j, h in enumerate(grp):
                    dbj = db[j * w2 : (j + 1) * w2]
                    db_acc[h] = dbj if db_acc[h] is None else db_acc[h] + dbj
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
                dkg_c = jnp.sum(dk_wide[:, g0 : g0 + 1, :], axis=0)
                dvg_c = jnp.sum(dv_wide[:, g0 : g0 + 1, :], axis=0)
                dkg_acc[gi][gidx] = (
                    dkg_c if dkg_acc[gi][gidx] is None
                    else dkg_acc[gi][gidx] + dkg_c
                )
                dvg_acc[gi][gidx] = (
                    dvg_c if dvg_acc[gi][gidx] is None
                    else dvg_acc[gi][gidx] + dvg_c
                )
            for bi, (dx_, dy_) in enumerate(NEIGHBOR_OFFSETS):
                c0 = bi * w2
                dk_c = dk_wide[:, c0 : c0 + w2, :]
                dv_c = dv_wide[:, c0 : c0 + w2, :]
                if my > 1:
                    dk_c = _roll0(dk_c, -dy_)
                    dv_c = _roll0(dv_c, -dy_)
                rr = (i_row + dx_) % mx
                dk_acc[rr][gidx] = (
                    dk_c if dk_acc[rr][gidx] is None
                    else dk_acc[rr][gidx] + dk_c
                )
                dv_acc[rr][gidx] = (
                    dv_c if dv_acc[rr][gidx] is None
                    else dv_acc[rr][gidx] + dv_c
                )
        # projection backward, q part (dk/dv parts need all rows' gathers —
        # handled after the loop). dW accumulators stay my-BATCHED
        # (my, C, C) f32 — summed over my once, after the row loop.
        attn_row = attn_scr[...]  # (my, W², C)
        dwo_t = jax.lax.dot_general(
            attn_row, g_row, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (my, C, C)
        dwo_acc = dwo_t if dwo_acc is None else dwo_acc + dwo_t
        dq_row = dq_scr[...]  # (my, W², C)
        x_row = x_ref[0, i_row]
        dx_rows_qpart[i_row] = _mm_rows(dq_row, wqT)  # f32 (my, W², C)
        dwq_t = jax.lax.dot_general(
            x_row, dq_row, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dwq_acc = dwq_t if dwq_acc is None else dwq_acc + dwq_t
        if has_qkv_bias:
            dbq_t = jnp.sum(dq_row.astype(jnp.float32), axis=1,
                            keepdims=True)
            dbq_acc = dbq_t if dbq_acc is None else dbq_acc + dbq_t

    # dk/dv full rows → dx and dWk/dWv/db (my-batched dots throughout)
    for r in range(mx):
        dk_r = jnp.concatenate(
            [a.astype(dtype) for a in dk_acc[r]], axis=-1
        )  # (my, W², C)
        dv_r = jnp.concatenate(
            [a.astype(dtype) for a in dv_acc[r]], axis=-1
        )
        x_row = x_ref[0, r]
        dx_r = (
            dx_rows_qpart[r] + _mm_rows(dk_r, wkT) + _mm_rows(dv_r, wvT)
        )
        dx_ref[0, r] = dx_r.astype(dx_ref.dtype)
        dwk_t = jax.lax.dot_general(
            x_row, dk_r, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dwk_acc = dwk_t if dwk_acc is None else dwk_acc + dwk_t
        dwv_t = jax.lax.dot_general(
            x_row, dv_r, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dwv_acc = dwv_t if dwv_acc is None else dwv_acc + dwv_t
        if has_qkv_bias:
            dbk_t = jnp.sum(dk_r.astype(jnp.float32), axis=1,
                            keepdims=True)
            dbk_acc = dbk_t if dbk_acc is None else dbk_acc + dbk_t
            dbv_t = jnp.sum(dv_r.astype(jnp.float32), axis=1,
                            keepdims=True)
            dbv_acc = dbv_t if dbv_acc is None else dbv_acc + dbv_t

    for gi in range(nglo):
        dkg_ref[0, gi : gi + 1] = jnp.concatenate(dkg_acc[gi], axis=-1)
        dvg_ref[0, gi : gi + 1] = jnp.concatenate(dvg_acc[gi], axis=-1)

    # weight/bias grads: reduce the my-batch axis once, then accumulate
    # across the batch grid
    w_final = lambda a: jnp.sum(a, axis=0)  # (my, C, C) → (C, C)
    b_final = lambda a: jnp.sum(a, axis=0)  # (my, 1, C) → (1, C)
    accs = [
        (dwq_ref, w_final(dwq_acc)), (dwk_ref, w_final(dwk_acc)),
        (dwv_ref, w_final(dwv_acc)), (dwo_ref, w_final(dwo_acc)),
        (dbo_ref, b_final(dbo_acc)),
    ]
    if has_qkv_bias:
        accs += [
            (dbq_ref, b_final(dbq_acc)), (dbk_ref, b_final(dbk_acc)),
            (dbv_ref, b_final(dbv_acc)),
        ]

    for ref, acc in accs:
        @pl.when(b_idx == 0)
        def _(ref=ref, acc=acc):
            ref[...] = acc

        @pl.when(b_idx != 0)
        def _(ref=ref, acc=acc):
            ref[...] += acc

    if has_bias:
        for h in range(H):
            @pl.when(b_idx == 0)
            def _(h=h):
                dbias_ref[h] = db_acc[h]

            @pl.when(b_idx != 0)
            def _(h=h):
                dbias_ref[h] += db_acc[h]


def _comb_for(mask_add, nglo, bias, w2, groups, num_heads):
    """(comb_tables, class_of, bias_tail) for the block kernels."""
    bias_tail = None
    if bias is not None:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(jnp.float32)
    classes_host, class_of = tail_mask_classes(np.asarray(mask_add), nglo)
    tables = pair_comb_tables(
        build_comb(classes_host, bias_tail, w2), groups, num_heads
    )
    return tables, class_of


def _fits_fwd(x, num_heads, nglo, has_bias, w2, my, cols):
    B = x.shape[0]
    comb_bytes = (num_heads if has_bias else 1) * 4 * my * w2 * cols * 4
    img_bytes = (
        7 * 2 * x.size // B * x.dtype.itemsize  # x,y,k,v refs ×2 + q/k/v vals
        + comb_bytes
        + 3 * my * w2 * cols * 4
    )
    return img_bytes <= FWD_BUDGET


def _fits_bwd(x, num_heads, nglo, has_bias, w2, mx, my, cols):
    B, C = x.shape[0], x.shape[-1]
    comb_bytes = (num_heads if has_bias else 1) * 4 * my * w2 * cols * 4
    img_bytes = (
        mx * num_heads * 5 * my * w2 * cols * 4  # unrolled f32 score temps
        + 9 * 2 * x.size // B * x.dtype.itemsize  # x,g,dx refs + q/k/v vals…
        + 2 * mx * my * w2 * C * 4  # dk/dv f32 row accumulators
        + comb_bytes
    )
    return img_bytes <= BWD_BUDGET


def block_fits(x, num_heads: int, nglo: int, has_bias: bool) -> bool:
    """True when BOTH fused-block kernels fit the whole-image VMEM budgets
    at ``x``'s (B, mx, my, W², C) shape — the model-level routing gate
    (models/attention.py): non-fitting shapes (e.g. 14×14-chunk 384² grids)
    stay on the classic split kernels, which have row-grid/tiled tiers."""
    B, mx, my, w2, C = x.shape
    cols = 9 * w2 + nglo
    return _fits_fwd(x, num_heads, nglo, has_bias, w2, my, cols) and (
        _fits_bwd(x, num_heads, nglo, has_bias, w2, mx, my, cols)
    )


def _pallas_block_forward(x, wq, bq, wk, bk, wv, bv, wo, bo, k_glo, v_glo,
                          bias, mask_add, num_heads, *, with_lse=False,
                          interpret=None):
    """Fused-block forward. x (B, mx, my, W², C); w* (C, C) in the compute
    dtype (wq/bq scale-folded); b* (1, C) f32 | None; k_glo/v_glo
    (B, Nglo, C) PROJECTED global rows | None. Returns (y, k_img, v_img)
    (+ lse with ``with_lse``)."""
    B, mx, my, w2, C = x.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    cols = 9 * w2 + nglo
    if interpret is None:
        interpret = INTERPRET
    groups = _head_groups(num_heads, C // num_heads)
    comb_tables, class_of = _comb_for(mask_add, nglo, bias, w2, groups,
                                      num_heads)
    has_qkv_bias = bq is not None

    img_spec = pl.BlockSpec(
        (1, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # weights pre-broadcast over my XLA-side (tiny) so the in-kernel
    # projections are my-BATCHED dots — in-kernel broadcasts lower as
    # unsupported Mosaic gathers, and the flat (my·W², C) 2-D-GEMM merge is
    # an unaligned sublane reshape Mosaic rejects. Biases to (W², C) f32 so
    # the in-kernel add only broadcasts over the MAJOR my axis.
    w_b = lambda w: jnp.broadcast_to(w[None], (my,) + w.shape)
    bias_b = lambda t: jnp.broadcast_to(
        t.astype(jnp.float32), (w2, C)
    )
    w_spec = pl.BlockSpec((my, C, C), lambda b: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((w2, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [img_spec, w_spec, w_spec, w_spec]
    operands = [x, w_b(wq), w_b(wk), w_b(wv)]
    if has_qkv_bias:
        in_specs += [b_spec] * 3
        operands += [bias_b(bq), bias_b(bk), bias_b(bv)]
    in_specs += [w_spec, b_spec]
    operands += [w_b(wo), bias_b(bo)]
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, my, nglo, C), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [glo_spec, glo_spec]
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

    out_specs = [img_spec, img_spec, img_spec]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)] * 3
    if with_lse:
        out_specs.append(pl.BlockSpec(
            (1, num_heads, mx, my, w2), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, num_heads, mx, my, w2), jnp.float32)
        )

    kernel = functools.partial(
        _block_fwd_kernel, nglo, w2, mx, my, num_heads, groups,
        has_qkv_bias, with_lse, class_of, len(comb_tables),
    )
    results = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((my, w2, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    if with_lse:
        y, k_img, v_img, lse = results
        return y, k_img, v_img, lse
    y, k_img, v_img = results
    return y, k_img, v_img


def _pallas_block_backward(x, wq, bq, wk, bk, wv, bv, wo, bo, k_glo, v_glo,
                           bias, mask_add, num_heads, g, lse,
                           *, interpret=None):
    """Fused-block backward. Returns (dx, dwq, dbq, dwk, dbk, dwv, dbv,
    dwo, dbo, dkg, dvg, dbias) — all in f32 except dx (input dtype); the
    caller casts/unfolds the scale."""
    B, mx, my, w2, C = x.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    cols = 9 * w2 + nglo
    if interpret is None:
        interpret = INTERPRET
    groups = _head_groups(num_heads, C // num_heads)
    comb_tables, class_of = _comb_for(mask_add, nglo, bias, w2, groups,
                                      num_heads)
    has_qkv_bias = bq is not None
    has_rpe_bias = bias is not None

    img_spec = pl.BlockSpec(
        (1, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # weights/biases pre-broadcast over my / W² XLA-side — see
    # _pallas_block_forward
    w_b = lambda w: jnp.broadcast_to(w[None], (my,) + w.shape)
    bias_b = lambda t: jnp.broadcast_to(t.astype(jnp.float32), (w2, C))
    w_spec = pl.BlockSpec((my, C, C), lambda b: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((w2, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [img_spec, w_spec, w_spec, w_spec]
    operands = [x, w_b(wq), w_b(wk), w_b(wv)]
    if has_qkv_bias:
        in_specs += [b_spec] * 3
        operands += [bias_b(bq), bias_b(bk), bias_b(bv)]
    in_specs += [w_spec] * 4
    # transposed XLA-side (tiny)
    operands += [w_b(wo.T), w_b(wq.T), w_b(wk.T), w_b(wv.T)]
    if nglo > 0:
        glo_spec = pl.BlockSpec(
            (1, my, nglo, C), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [glo_spec, glo_spec]
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
    in_specs.append(img_spec)
    operands.append(g)
    in_specs.append(pl.BlockSpec(
        (1, num_heads, mx, my, w2), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    ))
    operands.append(lse)

    wgrad_spec = pl.BlockSpec((C, C), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    bgrad_spec = pl.BlockSpec((1, C), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    out_specs = [img_spec, wgrad_spec, wgrad_spec, wgrad_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((C, C), jnp.float32),
        jax.ShapeDtypeStruct((C, C), jnp.float32),
        jax.ShapeDtypeStruct((C, C), jnp.float32),
    ]
    if has_qkv_bias:
        out_specs += [bgrad_spec] * 3
        out_shapes += [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 3
    out_specs += [wgrad_spec, bgrad_spec]
    out_shapes += [
        jax.ShapeDtypeStruct((C, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    ]
    if nglo > 0:
        glo_out = pl.BlockSpec((1, nglo, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        out_specs += [glo_out, glo_out]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_rpe_bias:
        out_specs.append(pl.BlockSpec(
            (num_heads, w2, cols), lambda b: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((num_heads, w2, cols), jnp.float32)
        )

    kernel = functools.partial(
        _block_bwd_kernel, nglo, w2, mx, my, num_heads, groups,
        has_qkv_bias, has_rpe_bias, class_of, len(comb_tables),
    )
    results = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((my, w2, C), x.dtype),  # dq
            pltpu.VMEM((my, w2, C), x.dtype),  # attn recompute
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    it = iter(results)
    dx = next(it)
    dwq, dwk, dwv = next(it), next(it), next(it)
    dbq = dbk = dbv = None
    if has_qkv_bias:
        dbq, dbk, dbv = next(it), next(it), next(it)
    dwo, dbo = next(it), next(it)
    dkg = dvg = dbias = None
    if nglo > 0:
        dkg, dvg = next(it), next(it)
    if has_rpe_bias:
        dbias = next(it)  # (H, W², cols) f32, TAIL order
    return dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dkg, dvg, dbias


def _xla_block_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, k_glo, v_glo,
                         bias, mask_add, num_heads):
    """Pure-XLA fallback/oracle of the fused block (projections + classic
    attention reference + out projection). Differentiable — the custom_vjp
    fallback recomputes through it."""
    from .vil_kernel import _xla_reference_mh

    def proj(t, w, b):
        y = jnp.einsum("...c,cd->...d", t, w.astype(t.dtype),
                       preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(t.dtype)

    q = proj(x, wq, bq)
    k = proj(x, wk, bk)
    v = proj(x, wv, bv)
    attn = _xla_reference_mh(q, k, v, k_glo, v_glo, bias, mask_add,
                             num_heads)
    y = proj(attn, wo, bo)
    return y, k, v


def make_fused_vil_block(mask_add: np.ndarray, num_heads: int,
                         use_pallas: bool = True):
    """custom_vjp factory for the fused attention block.

    fused(x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias)
        → (y, k_img, v_img)

    ``wq``/``bq`` arrive SCALE-FOLDED (·M^-1/2) — the caller applies the
    fold and autodiff of the fold handles the unfold; kg/vg are the
    PROJECTED global K/V rows (XLA-side kv of x_glo). k_img/v_img are the
    in-kernel-projected image K/V, exposed for the shared-weight global
    branch; their cotangents fold into dx/dW with plain XLA GEMMs here (no
    Pallas boundary). Falls back to the XLA reference (projections + oracle
    attention) off-TPU or when the whole-image VMEM estimate doesn't fit."""
    mask_add = np.asarray(mask_add, dtype=np.float32)

    def _ok(x, nglo, has_bias, bwd=False):
        B, mx, my, w2, C = x.shape
        cols = 9 * w2 + nglo
        if bwd:
            return _fits_bwd(x, num_heads, nglo, has_bias, w2, mx, my, cols)
        return _fits_fwd(x, num_heads, nglo, has_bias, w2, my, cols)

    def _use_pallas(x, nglo, has_bias, bwd=False):
        return (
            use_pallas
            and (jax.default_backend() == "tpu" or INTERPRET)
            and _ok(x, nglo, has_bias, bwd)
        )

    @jax.custom_vjp
    def fused(x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias):
        nglo = 0 if kg is None else kg.shape[1]
        if _use_pallas(x, nglo, bias is not None):
            return _pallas_block_forward(
                x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, mask_add,
                num_heads,
            )
        return _xla_block_reference(
            x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, mask_add,
            num_heads,
        )

    def fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias):
        nglo = 0 if kg is None else kg.shape[1]
        pallas_both = (
            _use_pallas(x, nglo, bias is not None)
            and _use_pallas(x, nglo, bias is not None, bwd=True)
        )
        if pallas_both:
            y, k_img, v_img, lse = _pallas_block_forward(
                x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, mask_add,
                num_heads, with_lse=True,
            )
            return (y, k_img, v_img), (
                x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, lse,
            )
        out = fused(x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias)
        return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, None)

    def bwd(res, gs):
        x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, lse = res
        g_y, g_k, g_v = gs
        nglo = 0 if kg is None else kg.shape[1]
        B, mx, my, w2, C = x.shape
        if lse is not None:
            (dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dkg, dvg,
             dbias_tail) = _pallas_block_backward(
                x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias, mask_add,
                num_heads, g_y, lse,
            )
            # k_img/v_img cotangents (shared-weight global branch): plain
            # XLA GEMMs — dx += g_k·Wkᵀ + g_v·Wvᵀ, dWk += xᵀ·g_k, … (no
            # Pallas boundary, no conv)
            x2 = x.reshape(-1, C)
            for g_t, w_t, accw, accb, slot in (
                (g_k, wk, dwk, dbk, "k"), (g_v, wv, dwv, dbv, "v"),
            ):
                if g_t is None:
                    continue
                g2 = g_t.reshape(-1, C)
                dx = dx + jnp.matmul(
                    g2, w_t.T.astype(g2.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(dx.dtype).reshape(x.shape)
                dw_extra = jnp.matmul(
                    x2.T.astype(g2.dtype), g2,
                    preferred_element_type=jnp.float32,
                )
                db_extra = (
                    jnp.sum(g2.astype(jnp.float32), axis=0, keepdims=True)
                    if accb is not None else None
                )
                if slot == "k":
                    dwk = dwk + dw_extra
                    if dbk is not None:
                        dbk = dbk + db_extra
                else:
                    dwv = dwv + dw_extra
                    if dbv is not None:
                        dbv = dbv + db_extra
            dbias = None
            if bias is not None:
                # kernel dbias is TAIL order [local ‖ glo] → FRONT order
                nloc = 9 * w2
                dbias = jnp.concatenate(
                    [dbias_tail[..., nloc:], dbias_tail[..., :nloc]],
                    axis=-1,
                ).astype(bias.dtype)
            return (
                dx,
                dwq.astype(wq.dtype),
                None if bq is None else dbq.astype(bq.dtype),
                dwk.astype(wk.dtype),
                None if bk is None else dbk.astype(bk.dtype),
                dwv.astype(wv.dtype),
                None if bv is None else dbv.astype(bv.dtype),
                dwo.astype(wo.dtype),
                dbo.astype(bo.dtype),
                dkg.astype(kg.dtype) if kg is not None else None,
                dvg.astype(vg.dtype) if vg is not None else None,
                dbias,
            )
        # fallback: differentiate through the XLA reference
        diff = tuple(
            a for a in (x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias)
            if a is not None
        )

        def wrapped(*args):
            it = iter(args)
            full = [next(it) if a is not None else None
                    for a in (x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg,
                              bias)]
            return _xla_block_reference(*full, mask_add, num_heads)

        _, vjp = jax.vjp(wrapped, *diff)
        # all three outputs share x's shape/dtype; unused cotangents arrive
        # as None/zeros
        gs_full = tuple(
            jnp.zeros(x.shape, x.dtype) if g_t is None else g_t for g_t in gs
        )
        grads = iter(vjp(gs_full))
        return tuple(
            next(grads) if a is not None else None
            for a in (x, wq, bq, wk, bk, wv, bv, wo, bo, kg, vg, bias)
        )

    fused.defvjp(fwd, bwd)
    return fused
