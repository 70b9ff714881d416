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
    """refs: [q, k×3, v×3, g, (kg, vg)?, (bias_loc, bias_glo?)?, mask,
    dq, p_out, ds_out, (dkg, dvg)?, (dbias_loc, dbias_glo?)?].

    Global columns never enter the local score tensor (joint softmax via a
    shared running max — same layout trick as the forward); the stash holds
    LOCAL columns only. dK_glo/dV_glo/dbias accumulate in-kernel across the
    grid (constant-index output blocks stay VMEM-resident), so no epilogue
    re-reads the ~GB stash."""
    i = 0
    q_ref = refs[i]; i += 1
    k_refs = refs[i : i + 3]; i += 3
    v_refs = refs[i : i + 3]; i += 3
    g_ref = refs[i]; i += 1
    if nglo > 0:
        kg_ref = refs[i]; i += 1
        vg_ref = refs[i]; i += 1
    bias_loc_ref = bias_glo_ref = None
    if has_bias:
        bias_loc_ref = refs[i]; i += 1
        if nglo > 0:
            bias_glo_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    p_ref = refs[i]; i += 1
    ds_ref = refs[i]; i += 1
    dkg_ref = dvg_ref = None
    if nglo > 0:
        dkg_ref = refs[i]; i += 1
        dvg_ref = refs[i]; i += 1
    dbias_loc_ref = dbias_glo_ref = None
    if has_bias:
        dbias_loc_ref = refs[i]; i += 1
        if nglo > 0:
            dbias_glo_ref = refs[i]; i += 1

    b_idx, i_idx = pl.program_id(0), pl.program_id(1)
    first_of_image = i_idx == 0
    first_of_grid = jnp.logical_and(b_idx == 0, first_of_image)

    k_nbh = _nbh([kr[0, 0] for kr in k_refs], my)  # (my, 9W2, C)
    v_nbh = _nbh([vr[0, 0] for vr in v_refs], my)
    q_row = q_ref[0, 0]  # (my, W2, C)
    g_row = g_ref[0, 0]
    C = q_row.shape[-1]
    M = C // H
    mask = mask_ref[0]  # (my, wq, 9W2)

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
        if has_bias:
            scores = scores + bias_loc_ref[h][None]
        scores = scores + mask
        m = jnp.max(scores, axis=-1, keepdims=True)
        sg = None
        if nglo > 0:
            kg = kg_ref[0][:, hs : hs + M].astype(jnp.float32)
            qf = q_h.astype(jnp.float32)
            sg = jnp.sum(qf[:, :, None, :] * kg[None, None, :, :], axis=-1)
            if has_bias:
                sg = sg + bias_glo_ref[h][None]
            m = jnp.maximum(m, jnp.max(sg, axis=-1, keepdims=True))
        e = jnp.exp(scores - m)  # (my, W2, 9W2) f32
        z = jnp.sum(e, axis=-1, keepdims=True)
        if nglo > 0:
            eg = jnp.exp(sg - m)  # (my, W2, Nglo) f32
            z = z + jnp.sum(eg, axis=-1, keepdims=True)
        recip_z = 1.0 / z
        p = e * recip_z  # normalized local probs, f32
        pg = eg * recip_z if nglo > 0 else None

        # dP = g · V^T (local) and g · vg^T (global)
        dp_loc = jax.lax.dot_general(
            g_h, v_h.astype(g_h.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (my, W2, 9W2)
        delta = jnp.sum(dp_loc * p, axis=-1, keepdims=True)
        dp_glo = None
        if nglo > 0:
            vg = vg_ref[0][:, hs : hs + M].astype(jnp.float32)
            gf = g_h.astype(jnp.float32)
            dp_glo = jnp.sum(gf[:, :, None, :] * vg[None, None, :, :], axis=-1)
            delta = delta + jnp.sum(dp_glo * pg, axis=-1, keepdims=True)
        ds = p * (dp_loc - delta)  # f32 (my, W2, 9W2)
        ds_glo = pg * (dp_glo - delta) if nglo > 0 else None

        # dQ = dS_loc · K_nbh (+ dS_glo · kg)
        dq = jax.lax.dot_general(
            ds.astype(q_h.dtype), k_h.astype(q_h.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if nglo > 0:
            dq = dq + jnp.sum(
                ds_glo[:, :, :, None] * kg[None, None, :, :], axis=2
            )
        dq_ref[0, 0, :, :, hs : hs + M] = dq.astype(dq_ref.dtype)
        p_ref[0, 0, h] = p.astype(p_ref.dtype)
        ds_ref[0, 0, h] = ds.astype(ds_ref.dtype)

        # ---- in-kernel accumulated reductions (f32 outputs) ----
        if nglo > 0:
            # dkg += Σ_{my,W2} dS_glo ⊗ q;  dvg += Σ pg ⊗ g
            dkg_c = jnp.sum(
                ds_glo[:, :, :, None] * q_h.astype(jnp.float32)[:, :, None, :],
                axis=(0, 1),
            )  # (Nglo, M)
            dvg_c = jnp.sum(
                pg[:, :, :, None] * g_h.astype(jnp.float32)[:, :, None, :],
                axis=(0, 1),
            )

            @pl.when(first_of_image)
            def _(dkg_c=dkg_c, dvg_c=dvg_c, hs=hs):
                dkg_ref[0, :, hs : hs + M] = dkg_c
                dvg_ref[0, :, hs : hs + M] = dvg_c

            @pl.when(jnp.logical_not(first_of_image))
            def _(dkg_c=dkg_c, dvg_c=dvg_c, hs=hs):
                dkg_ref[0, :, hs : hs + M] += dkg_c
                dvg_ref[0, :, hs : hs + M] += dvg_c

        if has_bias:
            db_loc = jnp.sum(ds, axis=0)  # (W2, 9W2)

            @pl.when(first_of_grid)
            def _(db_loc=db_loc, h=h):
                dbias_loc_ref[h] = db_loc

            @pl.when(jnp.logical_not(first_of_grid))
            def _(db_loc=db_loc, h=h):
                dbias_loc_ref[h] += db_loc

            if nglo > 0:
                db_glo = jnp.sum(ds_glo, axis=0)  # (W2, Nglo)

                @pl.when(first_of_grid)
                def _(db_glo=db_glo, h=h):
                    dbias_glo_ref[h] = db_glo

                @pl.when(jnp.logical_not(first_of_grid))
                def _(db_glo=db_glo, h=h):
                    dbias_glo_ref[h] += db_glo


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
    cols = 9 * w2  # stash/mask/bias hold LOCAL columns only
    if interpret is None:
        from . import vil_kernel as _vk

        interpret = INTERPRET or _vk.INTERPRET

    # split bias / mask outside the kernel (lane-offset slices are free
    # here; the wq=1→W² expansion dodges the Mosaic broadcast-add crash —
    # see vil_kernel.expand_local_mask)
    from .vil_kernel import expand_local_mask

    mask_local = expand_local_mask(mask_add, nglo, w2)
    bias_loc = bias_glo = None
    if has_bias:
        bias_loc = bias[..., nglo:].astype(jnp.float32)
        if nglo > 0:
            bias_glo = bias[..., :nglo].astype(jnp.float32)

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
        operands.append(bias_loc)
        if nglo > 0:
            in_specs.append(
                pl.BlockSpec((H, w2, nglo), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            operands.append(bias_glo)
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
    # accumulated reductions: dkg/dvg per image (block resident across the
    # mx steps of each b), dbias across the whole grid (block resident for
    # the entire kernel) — replaces the epilogue that re-read the stash
    if nglo > 0:
        glo_out_spec = pl.BlockSpec(
            (1, nglo, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [glo_out_spec, glo_out_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nglo, C), jnp.float32),
        ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((H, w2, cols), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((H, w2, cols), jnp.float32))
        if nglo > 0:
            out_specs.append(
                pl.BlockSpec((H, w2, nglo), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((H, w2, nglo), jnp.float32)
            )

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
        dkg = next(it).astype(k_glo.dtype)
        dvg = next(it).astype(v_glo.dtype)
    if has_bias:
        dbias_loc_out = next(it)
        if nglo > 0:
            dbias_glo_out = next(it)
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
