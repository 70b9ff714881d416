"""Pallas backward kernels for the fused 2-D sliding-chunk attention.

Flash-style two-pass backward for the multi-head forward in vil_kernel:

  pass 1 (grid (B, mx)): recompute scores/probs for row i (the same
      3-row K/V neighborhood as the forward), form
          dP = g·[vg ‖ V_nbh]ᵀ,   dS = P ⊙ (dP − rowsum(dP ⊙ P)),
      emit dQ[i] = dS·[kg ‖ K_nbh] and STORE P, dS (these are the only
      saved intermediates — (B, mx, my, W², H, cols), never the reference's
      autograd graph of 9 rolled copies).
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


def _pass1_kernel(nglo, w2, my, H, has_bias, *refs):
    """refs: [q, k×3, v×3, g, (kg, vg)?, (bias)?, mask, dq, p_out, ds_out]"""
    i = 0
    q_ref = refs[i]; i += 1
    k_refs = refs[i : i + 3]; i += 3
    v_refs = refs[i : i + 3]; i += 3
    g_ref = refs[i]; i += 1
    if nglo > 0:
        kg_ref = refs[i]; i += 1
        vg_ref = refs[i]; i += 1
    if has_bias:
        bias_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    dq_ref, p_ref, ds_ref = refs[i], refs[i + 1], refs[i + 2]

    k_nbh = _nbh([kr[0, 0] for kr in k_refs], my)  # (my, 9W2, C)
    v_nbh = _nbh([vr[0, 0] for vr in v_refs], my)
    q_row = q_ref[0, 0]  # (my, W2, C)
    g_row = g_ref[0, 0]
    C = q_row.shape[-1]
    M = C // H
    mask = mask_ref[0]

    for h in range(H):
        hs = h * M
        q_h = q_row[..., hs : hs + M]
        k_h = k_nbh[..., hs : hs + M]
        v_h = v_nbh[..., hs : hs + M]
        g_h = g_row[..., hs : hs + M]
        scores = jax.lax.dot_general(
            q_h, k_h.astype(q_h.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if nglo > 0:
            kg = kg_ref[0][:, hs : hs + M].astype(jnp.float32)
            qf = q_h.astype(jnp.float32)
            sg = jnp.sum(qf[:, :, None, :] * kg[None, None, :, :], axis=-1)
            scores = jnp.concatenate([sg, scores], axis=-1)
        if has_bias:
            scores = scores + bias_ref[h][None]
        scores = scores + mask
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32 (my, W2, cols)

        # dP = g · [vg ‖ V_nbh]^T
        dp_loc = jax.lax.dot_general(
            g_h, v_h.astype(g_h.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (my, W2, 9W2)
        if nglo > 0:
            vg = vg_ref[0][:, hs : hs + M].astype(jnp.float32)
            gf = g_h.astype(jnp.float32)
            dp_glo = jnp.sum(gf[:, :, None, :] * vg[None, None, :, :], axis=-1)
            dp = jnp.concatenate([dp_glo, dp_loc], axis=-1)
        else:
            dp = dp_loc
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)  # f32 (my, W2, cols)

        # dQ = dS_loc · K_nbh (+ dS_glo · kg)
        dq = jax.lax.dot_general(
            ds[..., nglo:].astype(q_h.dtype), k_h.astype(q_h.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if nglo > 0:
            dq = dq + jnp.sum(
                ds[..., :nglo][:, :, :, None] * kg[None, None, :, :], axis=2
            )
        dq_ref[0, 0, :, :, hs : hs + M] = dq.astype(dq_ref.dtype)
        p_ref[0, 0, h] = p.astype(p_ref.dtype)
        ds_ref[0, 0, h] = ds.astype(ds_ref.dtype)


def _pass2_kernel(nglo, w2, my, H, *refs):
    """refs: [ds×3, p×3, q×3, g×3, dk, dv]. Computes dK[r], dV[r]."""
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
            col0 = nglo + bi * w2_
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
    interpret: Optional[bool] = None,
):
    """Returns (dq, dk, dv, dk_glo, dv_glo, dbias) for the MH forward."""
    B, mx, my, w2, C = q.shape
    H = num_heads
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = nglo + 9 * w2
    if interpret is None:
        from . import vil_kernel as _vk

        interpret = INTERPRET or _vk.INTERPRET

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
        glo_spec = pl.BlockSpec(
            (1, nglo, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [glo_spec, glo_spec]
        operands += [k_glo, v_glo]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(bias.astype(jnp.float32))
    wq = mask_add.shape[2]
    in_specs.append(
        pl.BlockSpec((1, my, wq, cols), lambda b, i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(jnp.asarray(mask_add, dtype=jnp.float32))

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
    vmem_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    dq, p_st, ds_st = pl.pallas_call(
        functools.partial(_pass1_kernel, nglo, w2, my, H, has_bias),
        grid=(B, mx),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, mx, H, my, w2, cols), stash_dtype),
            jax.ShapeDtypeStruct((B, mx, H, my, w2, cols), stash_dtype),
        ],
        compiler_params=vmem_params,
        interpret=interpret,
    )(*operands)

    # ---------------- XLA epilogue: dbias / d(k_glo) / d(v_glo) -------------
    dbias = None
    if has_bias:
        # accumulate in f32: the stash may be bf16 and this reduction spans
        # B·mx·my terms
        dbias = jnp.sum(ds_st, axis=(0, 1, 3), dtype=jnp.float32)  # (H,W2,cols)
    dkg = dvg = None
    if nglo > 0:
        q_h = q.reshape(B, mx, my, w2, H, C // H)
        g_h = g.reshape(B, mx, my, w2, H, C // H)
        # (…, H, nglo) ⊗ (…, H, M) → (nglo, H, M) → (nglo, C)
        dkg = jnp.einsum(
            "bihjlg,bijlhm->bghm", ds_st[..., :nglo], q_h.astype(jnp.float32)
        ).reshape(B, nglo, C).astype(k_glo.dtype)
        dvg = jnp.einsum(
            "bihjlg,bijlhm->bghm", p_st[..., :nglo], g_h.astype(jnp.float32)
        ).reshape(B, nglo, C).astype(v_glo.dtype)

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
        functools.partial(_pass2_kernel, nglo, w2, my, H),
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
