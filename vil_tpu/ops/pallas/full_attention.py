"""Fused Pallas TPU kernel for dense (full) multi-head self-attention.

Replaces the unfused XLA scores→softmax→AV chain of the FullAttention module
(reference /root/reference/src/models/msvit.py:37-120) on the stages the
MsViT ARCH string marks s=0 (e.g. ViL stages 3/4: 14×14 and 7×7 grids at
224², 24×24 / 12×12 at 384²). At these sequence lengths (N ≤ ~600) the
ENTIRE per-image Q/K/V fits VMEM, so no online-softmax streaming is needed:
one grid step per image computes all heads with a single-pass max-subtracted
softmax, never materializing the (B, H, N, N) f32 score tensor in HBM.

Design notes (shared with vil_kernel):
* Blocks carry the full channel dim C = H·M; heads unroll in-register.
* Scores in f32 on the MXU; probs cast to the input dtype in the same pass
  as the exp; flash-style deferred normalization (the softmax denominator
  scales the (N, M) output, not the (N, N) probability tensor).
* Optional joint global+local relative position bias (H, N, N) added to the
  scores (msvit.py:93-114 semantics — the bias table is assembled by the
  caller, the kernel just adds it).
* Backward (r3): a fused whole-image Pallas kernel — the forward stashes the
  per-query log-sum-exp, the backward recomputes the normalized probabilities
  in ONE exp pass and runs all five GEMMs (S, dP, dV, dQ, dK) with the score
  tensors resident in VMEM. At 384² stage 3 (16 blocks, N=577) the XLA
  recompute backward materialized (B, H, N, N) f32 score tensors in HBM and
  spent ~5 ms/step in softmax-recompute loop fusions. dBias accumulates
  in-kernel across the batch grid. Shapes over the VMEM budget (or with
  attention dropout) keep the XLA recompute fallback.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flip in CPU tests for interpreter mode
INTERPRET = False


def _score_dtype(dtype):
    """Score-tensor dtype (vil_kernel.score_dtype — bf16 under
    VIL_TPU_BF16_SCORES for bf16 inputs, else f32)."""
    from .vil_kernel import score_dtype

    return score_dtype(dtype)


def _fast_max() -> bool:
    """Shared cheap-softmax-max policy (vil_kernel.FAST_MAX)."""
    from .vil_kernel import FAST_MAX

    return FAST_MAX


def _fast_max_clamp() -> float:
    from .vil_kernel import FAST_MAX_CLAMP

    return FAST_MAX_CLAMP

# whole-image kernel VMEM budgets: the pallas_calls raise the Mosaic scope to
# 64 MB; estimates count every statically-unrolled head's f32 score-sized
# temporaries (Mosaic does not reuse stack slots across the head unroll —
# same lesson as vil_kernel's row unroll).
VMEM_BUDGET_BYTES = 56 * 2**20

# the BIASED backward carries two extra (H, N, N) f32 tensors (bias +
# resident dbias accumulator), which pushed every RPE model at 384² stage-3
# shapes past the 56 MB budget; supported_bwd compares biased estimates
# against this and _pallas_backward raises the Mosaic scope to 96 MB (the
# q-tiled tier already runs at 100 MB on the 128 MB v5e VMEM) so e.g.
# H=8/C=512 and H=6/C=384 @ N=577 engage. H=12/C=768 (base_wide) still
# estimates ~108 MB and keeps the XLA-recompute fallback.
BIASED_BWD_VMEM_BUDGET_BYTES = 84 * 2**20

# q-tiled forward tier budget (its pallas_call raises the scope to 100 MB)
TILED_VMEM_BUDGET_BYTES = 88 * 2**20


def _kernel(num_heads: int, has_bias: bool, with_lse: bool, *refs):
    """refs: [q, k, v, (bias)?, out, (lse)?]; q/k/v/out blocks (1, N, C);
    lse (1, H, N) f32 — per-query log-sum-exp stashed for the fused
    backward (train path)."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias = None
    if has_bias:
        bias = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_ref = refs[i] if with_lse else None

    q = q_ref[0]  # (N, C)
    k = k_ref[0]
    v = v_ref[0]
    C = q.shape[-1]
    M = C // num_heads
    outs = []
    for h in range(num_heads):
        hs = h * M
        q_h = q[:, hs : hs + M]
        scores = jax.lax.dot_general(
            q_h, k[:, hs : hs + M], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_score_dtype(q_h.dtype))
        # (N, N) — bf16 under BF16_SCORES via an epilogue cast (Mosaic
        # requires a 32-bit matmul acc); bias arrives pre-cast
        if bias is not None:
            scores = scores + bias[h]
        m = jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores - m).astype(q_h.dtype)  # unnormalized
        denom = jnp.sum(probs, axis=-1, keepdims=True, dtype=jnp.float32)
        if with_lse:
            lse_ref[0, h] = (m + jnp.log(denom))[:, 0]
        recip = 1.0 / denom
        acc = jax.lax.dot_general(
            probs, v[:, hs : hs + M], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, M)
        outs.append((acc * recip).astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


def _pallas_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    num_heads: int,
    *,
    interpret: Optional[bool] = None,
    with_lse: bool = False,
) -> jax.Array:
    """q, k, v: (B, N, C) with q pre-scaled; bias: (H, N, N) f32 or None.
    Returns (B, N, C); with ``with_lse`` returns (out, lse) where lse
    (B, H, N) f32 feeds the fused backward."""
    B, N, C = q.shape
    has_bias = bias is not None
    if interpret is None:
        interpret = INTERPRET

    blk = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [blk, blk, blk]
    operands = [q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec(
                (num_heads, N, N), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(bias.astype(_score_dtype(q.dtype)))

    out_specs = blk
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if with_lse:
        out_specs = [blk, pl.BlockSpec(
            (1, num_heads, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, num_heads, N), jnp.float32),
        ]
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, has_bias, with_lse),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * N * C,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _tiled_kernel(num_heads: int, has_bias: bool, with_lse: bool, *refs):
    """Q-TILED forward body (grid (B, Npad/TQ)) for sequences too long for
    the whole-image kernel (the s=0 stages at huge resolutions: 1024² stage 3
    is N=4097 — the XLA fallback there round-trips (B, H, N, N) f32 score
    tensors through HBM and was measured at ~146 of the 178 ms forward,
    82%). K/V stay VMEM-resident with row-constant index maps (fetched once
    per image); Q/out tiles stream; per head the (TQ, N) score tile lives
    only in VMEM with single-pass max-subtracted softmax and deferred
    normalization. Padded QUERY rows (Npad = ceil(N/TQ)·TQ) produce garbage
    rows the caller slices off; keys are never padded so no masking is
    needed. RPE bias (r5): the (H, N, N) table stays in HBM and streams as
    (H, TQ, N) row tiles alongside Q (index constant in the batch
    coordinate — shared across images). refs: [q_tile, k, v, (bias_tile)?,
    out_tile, (lse_tile)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias_ref = None
    if has_bias:
        bias_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_ref = refs[i] if with_lse else None

    q = q_ref[0]  # (TQ, C)
    C = q.shape[-1]
    M = C // num_heads
    outs = []
    for h in range(num_heads):
        hs = h * M
        q_h = q[:, hs : hs + M]
        k_h = k_ref[0, :, hs : hs + M]  # (N, M)
        scores = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_score_dtype(q_h.dtype))  # (TQ, N)
        if bias_ref is not None:
            scores = scores + bias_ref[h]
        if _fast_max() and not with_lse and scores.shape[-1] > 128:
            # r5 (vil_kernel.FAST_MAX, same shift-invariance argument,
            # INFERENCE only — the train path keeps exact max/LSE): the
            # N-wide row max costs a full VPU pass over the score tile —
            # reduce a static 128-column prefix instead and clamp the
            # shifted scores. This tier has NO masks (only the optional RPE
            # bias), so the prefix max trails the true max by the finite
            # score spread; the clamp (inert in practice) bounds the
            # theoretical tail and the deferred normalization divides any
            # shift out exactly.
            m = jnp.max(scores[:, :128], axis=-1, keepdims=True)
            shifted = jnp.minimum(
                scores - m, jnp.asarray(_fast_max_clamp(), scores.dtype)
            )
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            shifted = scores - m
        probs = jnp.exp(shifted).astype(q_h.dtype)
        denom = jnp.sum(probs, axis=-1, keepdims=True, dtype=jnp.float32)
        if with_lse:
            lse_ref[0, h] = (m + jnp.log(denom))[:, 0]
        acc = jax.lax.dot_general(
            probs, v_ref[0, :, hs : hs + M], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, M)
        outs.append((acc * (1.0 / denom)).astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


def _env_tile(name: str, N: int) -> Optional[int]:
    """Tile-size override for sweeps: ``VIL_TPU_DENSE_TILE_Q[_BWD]`` is
    either a bare int (applies to every dense-tiled stage) or a
    comma-separated ``N:tq`` map (e.g. ``4097:64,1025:256``), optionally
    mixed with one bare default (exact ``N:tq`` matches win over the bare
    default regardless of order). No VMEM check — sweep values must fit
    the raised scope or Mosaic rejects the kernel. Read at TRACE time: the
    jit cache does not key on the env var, so sweeps must use one process
    per setting (tools/tpu_queue.sh runs queue files that way)."""
    v = os.environ.get(name, "")
    if not v:
        return None
    default = None
    for part in v.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            n, t = part.split(":")
            if int(n) == N:
                return int(t)
        else:
            default = int(part)
    return default


def _pick_tile_q(N: int, C: int, num_heads: int, has_bias: bool = False,
                 with_lse: bool = True) -> Optional[int]:
    """Largest query tile whose VMEM estimate fits the raised (100 MB −
    margin) scope: K/V resident (×2 buffers) + per-head (TQ, N) f32+bf16
    score temporaries ×num_heads (static head unroll — Mosaic keeps every
    head's stack slots live, vil_kernel's row-unroll lesson) + the
    streamed (H, TQ, N) f32 bias tile when biased.

    Mosaic requires block last-dims divisible by (8, 128) or full: the
    (1, H, TQ) lse OUTPUT tile puts TQ on the lane axis, so with_lse
    (train) tiles must be multiples of 128; without the lse stash
    (inference) the out tile (1, TQ, C) only needs TQ % 8 == 0, so sub-128
    fallbacks stay available. Tier GATING (supported_tiled) uses the
    conservative with_lse=True list so one shape never splits tiers
    between train and inference."""
    cands = (512, 384, 256, 128) if with_lse else (512, 384, 256, 128, 64, 32)
    for tq in cands:
        est = (
            2 * 2 * N * C * 2        # k, v resident ×2 pipeline buffers
            + 2 * 2 * tq * C * 2     # q, out tiles ×2 buffers
            + num_heads * 8 * tq * N  # scores f32 + probs bf16 + temps
            + (num_heads * 2 * tq * N * 4 if has_bias else 0)  # bias ×2
        )
        if est <= TILED_VMEM_BUDGET_BYTES:
            return tq
    return None


def _pallas_forward_tiled(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    bias: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    with_lse: bool = False,
    tile_q: Optional[int] = None,
):
    """Q-tiled dense forward. q, k, v: (B, N, C), q pre-scaled; bias
    (H, N, N) f32 or None — kept in HBM, streamed as (H, TQ, N) row tiles.
    Returns (B, N, C) (+ lse (B, H, N) f32 with ``with_lse``)."""
    B, N, C = q.shape
    has_bias = bias is not None
    if interpret is None:
        interpret = INTERPRET
    tq = (tile_q or _env_tile("VIL_TPU_DENSE_TILE_Q", N)
          or _pick_tile_q(N, C, num_heads, has_bias, with_lse=with_lse))
    npad = -(-N // tq) * tq
    if npad != N:
        q = jnp.pad(q, ((0, 0), (0, npad - N), (0, 0)))
        if has_bias:
            bias = jnp.pad(bias, ((0, 0), (0, npad - N), (0, 0)))

    tile = pl.BlockSpec((1, tq, C), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    in_specs = [tile, kv, kv]
    operands = [q, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (num_heads, tq, N), lambda b, i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(bias.astype(_score_dtype(q.dtype)))
    out_specs = tile
    out_shape = jax.ShapeDtypeStruct((B, npad, C), q.dtype)
    if with_lse:
        out_specs = [tile, pl.BlockSpec(
            (1, num_heads, tq), lambda b, i: (b, 0, i),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, num_heads, npad), jnp.float32),
        ]
    res = pl.pallas_call(
        functools.partial(_tiled_kernel, num_heads, has_bias, with_lse),
        grid=(B, npad // tq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * npad * N * C,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=B * num_heads * npad * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    if with_lse:
        out, lse = res
        return out[:, :N], lse[..., :N]
    return res[:, :N]


def _tiled_bwd_kernel(num_heads: int, has_bias: bool, *refs):
    """Q-TILED fused backward body (grid (B, Npad/TQ)), the train-path twin
    of _tiled_kernel: K/V stay VMEM-resident; per q-tile and head it
    recomputes P = exp(S − lse) in ONE pass (no max/sum), then
    dP = g·vᵀ, δ = Σ P⊙dP, dS = P⊙(dP − δ), dq = dS·K — and ACCUMULATES
    dK += dSᵀ·q, dV += Pᵀ·g into f32 whole-sequence output blocks whose
    index maps are constant in the tile coordinate (Pallas keeps them
    resident across the image's tiles and writes back once). Padded query
    rows are exact no-ops: q/g pad with zeros and lse with +1e9 → P = 0 and
    dS = 0, so their dK/dV/dbias contributions vanish and their dq rows are
    sliced off. RPE bias (r5): the (H, N, N) table streams in as (H, TQ, N)
    row tiles for the S recompute; dbias cannot accumulate across the batch
    in-kernel (its block index varies in the INNER grid coordinate, so
    Pallas revisits would be non-consecutive) — instead each (b, iq) step
    writes its (H, TQ, N) dS tile ONCE into a per-batch partial tensor
    (B, H, Npad, N) f32 and the caller sums over B XLA-side.
    refs: [q_tile, k, v, g_tile, lse_tile, (bias_tile)?, dq_tile, dk, dv,
    (dbias_tile)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    g_ref = refs[i]; i += 1
    lse_ref = refs[i]; i += 1
    bias_ref = None
    if has_bias:
        bias_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    dk_ref = refs[i]; i += 1
    dv_ref = refs[i]; i += 1
    dbias_ref = refs[i] if has_bias else None
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    q = q_ref[0]  # (TQ, C)
    g = g_ref[0]
    C = q.shape[-1]
    M = C // num_heads
    dqs = []
    for h in range(num_heads):
        hs = h * M
        q_h = q[:, hs : hs + M]
        g_h = g[:, hs : hs + M]
        k_h = k_ref[0, :, hs : hs + M]  # (N, M)
        v_h = v_ref[0, :, hs : hs + M]
        s = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_score_dtype(q_h.dtype))  # (TQ, N)
        if bias_ref is not None:
            s = s + bias_ref[h]
        # lse arrives TRANSPOSED (1, TQ, H): TQ on the sublane axis keeps
        # sub-128 tiles lowerable (a (1, H, TQ) tile puts TQ on the lane
        # axis, which Mosaic only accepts at multiples of 128). The train
        # forward always uses the exact max, so z ≤ 0 unconditionally.
        z = s - lse_ref[0, :, h][:, None]
        p = jnp.exp(z).astype(q_h.dtype)
        dp = jax.lax.dot_general(
            g_h, v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, N) f32
        delta = jnp.sum(
            p.astype(jnp.float32) * dp, axis=-1, keepdims=True
        )
        ds_f32 = p.astype(jnp.float32) * (dp - delta)
        if dbias_ref is not None:
            dbias_ref[0, h] = ds_f32
        ds = ds_f32.astype(q_h.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype))  # (TQ, M)
        dk_ref[0, :, hs : hs + M] += jax.lax.dot_general(
            ds, q_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, M) f32
        dv_ref[0, :, hs : hs + M] += jax.lax.dot_general(
            p, g_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)


def _pick_tile_q_bwd(N: int, C: int, num_heads: int,
                     has_bias: bool = False) -> Optional[int]:
    """Backward tile size: K/V + f32 dK/dV resident (×2 buffers) + per-head
    S/P/dP/dS/δ temporaries (~16 B per score element, ×num_heads unrolled)
    + streamed f32 bias-in and dbias-out tiles (×2 buffers each) when
    biased. Sub-128 tiles are legal here (unlike the forward): the lse
    streams in TRANSPOSED (TQ, H) tiles, and every other block keeps its
    full array dim on the lane axis."""
    for tq in (256, 128, 64, 32):
        est = (
            2 * 2 * N * C * 2        # k, v resident ×2 buffers
            + 2 * 2 * N * C * 4      # dk, dv f32 resident ×2 buffers
            + 6 * 2 * tq * C * 2     # q, g, dq tiles ×2 buffers
            + num_heads * 16 * tq * N
            + (num_heads * 4 * tq * N * 4 if has_bias else 0)
        )
        if est <= TILED_VMEM_BUDGET_BYTES:
            return tq
    return None


# HBM ceiling for the biased tiled backward's per-batch dbias partials
# (B, H, Npad, N) f32 — at 1024² stage 3 (B=4, H=8, N=4097) that is ~2.1 GB
# of transient HBM on a 16 GB chip; past this, fall back to XLA recompute
# rather than risk an OOM inside the train step.
DBIAS_PARTIAL_HBM_BUDGET_BYTES = 3 * 2**30


def supported_bwd_tiled(B: int, N: int, C: int, num_heads: int,
                        has_bias: bool) -> bool:
    tq = _pick_tile_q_bwd(N, C, num_heads, has_bias)
    if tq is None:
        return False
    if has_bias:
        # the guard uses the DEFAULT tile's npad; a VIL_TPU_DENSE_TILE_Q_BWD
        # sweep that changes npad near the ceiling is expert-mode (the env
        # override deliberately bypasses every fit check)
        npad = -(-N // tq) * tq
        if B * num_heads * npad * N * 4 > DBIAS_PARTIAL_HBM_BUDGET_BYTES:
            return False
    return True


def _pallas_backward_tiled(
    q: jax.Array, k: jax.Array, v: jax.Array, g: jax.Array, lse: jax.Array,
    num_heads: int, *, bias: Optional[jax.Array] = None,
    interpret: Optional[bool] = None, tile_q: Optional[int] = None,
):
    """Tiled dense backward: q/k/v/g (B, N, C), lse (B, H, N) from the tiled
    forward, bias (H, N, N) f32 or None. Returns (dq, dk, dv) in q's dtype,
    plus dbias (H, N, N) f32 (summed over the batch XLA-side from the
    kernel's per-batch partials) when biased."""
    B, N, C = q.shape
    has_bias = bias is not None
    if interpret is None:
        interpret = INTERPRET
    tq = (tile_q or _env_tile("VIL_TPU_DENSE_TILE_Q_BWD", N)
          or _pick_tile_q_bwd(N, C, num_heads, has_bias))
    npad = -(-N // tq) * tq
    # TRANSPOSE the lse to (B, Npad, H): TQ rides the sublane axis so
    # sub-128 backward tiles lower (Mosaic lane-axis tiles must be ×128)
    lse_t = jnp.swapaxes(lse, 1, 2)  # (B, N, H) f32 — tiny
    if npad != N:
        pad = ((0, 0), (0, npad - N), (0, 0))
        q, g = jnp.pad(q, pad), jnp.pad(g, pad)
        # +1e9 (not 0): padded rows must give P = exp(S − lse) = 0 so the
        # biased S (= bias at q=0) can never contribute to dV via P
        lse_t = jnp.pad(lse_t, pad, constant_values=1e9)
        if has_bias:
            bias = jnp.pad(bias, ((0, 0), (0, npad - N), (0, 0)))

    tile = pl.BlockSpec((1, tq, C), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, tq, num_heads), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [tile, kv, kv, tile, lse_spec]
    operands = [q, k, v, g, lse_t]
    out_specs = [tile, kv, kv]
    out_shape = [
        jax.ShapeDtypeStruct((B, npad, C), q.dtype),
        jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        jax.ShapeDtypeStruct((B, N, C), jnp.float32),
    ]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (num_heads, tq, N), lambda b, i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(bias.astype(_score_dtype(q.dtype)))
        out_specs.append(pl.BlockSpec(
            (1, num_heads, tq, N), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape.append(
            jax.ShapeDtypeStruct((B, num_heads, npad, N), jnp.float32)
        )
    res = pl.pallas_call(
        functools.partial(_tiled_bwd_kernel, num_heads, has_bias),
        grid=(B, npad // tq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * npad * N * C,
            bytes_accessed=8 * q.size * q.dtype.itemsize,
            transcendentals=B * num_heads * npad * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    dq, dk, dv = res[:3]
    out = (dq[:, :N], dk.astype(q.dtype), dv.astype(q.dtype))
    if has_bias:
        dbias = res[3].sum(axis=0)[:, :N, :]
        return out + (dbias,)
    return out


def _bwd_kernel(num_heads: int, has_bias: bool, *refs):
    """Fused backward body (grid (B,)). refs: [q, k, v, g, lse, (bias)?,
    dq, dk, dv, (dbias)?]; q/k/v/g/dq/dk/dv blocks (1, N, C); lse (1, H, N)
    f32; bias/dbias (H, N, N) f32 — dbias ACCUMULATES across the sequential
    batch grid (init at step 0).

    Per head: S = q_h·k_hᵀ (+bias); P = exp(S − lse) — already normalized,
    ONE exp pass, no max/sum recompute; dP = g_h·v_hᵀ; δ = Σ_j P⊙dP (equal to
    Σ_m g⊙out without loading out); dS = P⊙(dP − δ); dV = Pᵀ·g_h;
    dQ = dS·k_h; dK = dSᵀ·q_h. All (N, N) tensors live only in VMEM."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    g_ref = refs[i]; i += 1
    lse_ref = refs[i]; i += 1
    bias = None
    if has_bias:
        bias = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    dk_ref = refs[i]; i += 1
    dv_ref = refs[i]; i += 1
    dbias_ref = refs[i] if has_bias else None

    q = q_ref[0]  # (N, C)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    C = q.shape[-1]
    M = C // num_heads
    first = pl.program_id(0) == 0
    for h in range(num_heads):
        hs = h * M
        sl = slice(hs, hs + M)
        q_h = q[:, sl]
        k_h = k[:, sl]
        scores = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_score_dtype(q_h.dtype))
        # (N, N) — bf16 under BF16_SCORES (epilogue cast, 32-bit MXU acc),
        # matching the forward rounding
        if bias is not None:
            scores = scores + bias[h]
        # normalized probs in ONE exp pass from the forward-stashed LSE,
        # rounded to the compute dtype exactly like the forward's PV operand
        probs = jnp.exp(scores - lse_ref[0, h][:, None]).astype(q_h.dtype)
        g_h = g[:, sl]
        dp = jax.lax.dot_general(
            g_h, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, N)
        delta = jnp.sum(
            probs.astype(jnp.float32) * dp, axis=-1, keepdims=True
        )  # (N, 1) == rowsum(g ⊙ out)
        ds = (probs.astype(jnp.float32) * (dp - delta))
        if dbias_ref is not None:
            @pl.when(first)
            def _():
                dbias_ref[h] = ds

            @pl.when(jnp.logical_not(first))
            def _():
                dbias_ref[h] += ds
        ds = ds.astype(q_h.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            probs, g_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, q_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _pallas_backward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    lse: jax.Array,
    bias: Optional[jax.Array],
    num_heads: int,
    *,
    interpret: Optional[bool] = None,
):
    """Fused backward: returns (dq, dk, dv[, dbias]) — dbias (H, N, N) f32
    summed over the batch, present only when ``bias`` is."""
    B, N, C = q.shape
    has_bias = bias is not None
    if interpret is None:
        interpret = INTERPRET

    blk = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec(
        (1, num_heads, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [blk, blk, blk, blk, lse_spec]
    operands = [q, k, v, g, lse]
    bias_spec = pl.BlockSpec(
        (num_heads, N, N), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    if has_bias:
        in_specs.append(bias_spec)
        operands.append(bias.astype(_score_dtype(q.dtype)))

    out_specs = [blk, blk, blk]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype) for _ in range(3)]
    if has_bias:
        out_specs.append(bias_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32)
        )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, has_bias),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * N * N * C,
            bytes_accessed=7 * q.size * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            # biased shapes carry the (H, N, N) bias + resident dbias
            # accumulator past 64 MB (supported_bwd gates on the 84 MB
            # biased budget)
            vmem_limit_bytes=(96 if has_bias else 64) * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _xla_reference(q, k, v, bias, num_heads):
    """Unfused reference: identical math in plain XLA (backward path and
    CPU fallback). Head split via reshape; softmax max-subtracted in f32."""
    B, N, C = q.shape
    M = C // num_heads
    q4 = q.reshape(B, N, num_heads, M)
    k4 = k.reshape(B, N, num_heads, M)
    v4 = v.reshape(B, N, num_heads, M)
    scores = jnp.einsum(
        "bnhm,bthm->bhnt", q4, k4, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias[None].astype(jnp.float32)
    m = jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores - m, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhnt,bthm->bnhm", probs, v4, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.reshape(B, N, C)


def supported(B: int, N: int, C: int, num_heads: int, has_bias: bool) -> bool:
    """True when the whole-image forward kernel fits the VMEM budget.
    Per-head f32 score-sized temporaries count ×num_heads — the head loop is
    a static unroll and Mosaic does not reuse its stack slots."""
    itemsize = 2  # bf16 compute path
    est = (
        4 * 2 * N * C * itemsize  # q, k, v, out ×2 pipeline buffers
        + (num_heads * N * N * 4 if has_bias else 0)
        + num_heads * 8 * N * N  # scores f32 + probs + reduction temps
    )
    return est <= VMEM_BUDGET_BYTES


def supported_tiled(B: int, N: int, C: int, num_heads: int,
                    has_bias: bool) -> bool:
    """True when the q-tiled forward tier applies: some tile size fits the
    raised scope. The dispatcher tries ``supported`` first — this tier is
    the huge-N escape (1024² s=0 stages: N=4097 / N=1025). Biased shapes
    (r5) stream the (H, N, N) bias from HBM as (H, TQ, N) row tiles."""
    return _pick_tile_q(N, C, num_heads, has_bias) is not None


def supported_bwd(B: int, N: int, C: int, num_heads: int,
                  has_bias: bool) -> bool:
    """True when the fused backward kernel fits the VMEM budget (per-head:
    S f32, P bf16, dP f32, dS f32+bf16 ≈ 16 bytes/score element, unrolled
    ×num_heads; with bias both the bias and the resident dbias accumulator
    are full (H, N, N) f32 tensors).

    Biased estimates compare against the raised BIASED_BWD_VMEM_BUDGET_BYTES
    (its pallas_call runs at a 96 MB Mosaic scope) so e.g. H=8/C=512 and
    H=6/C=384 RPE shapes @ N=577 engage; H=12/C=768 (base_wide) still
    estimates ~108 MB and keeps the XLA-recompute fallback."""
    if has_bias and os.environ.get("VIL_TPU_NO_BIASED_BWD", "0") == "1":
        return False  # A/B knob: force the XLA-recompute fallback
    itemsize = 2
    est = (
        7 * 2 * N * C * itemsize  # q, k, v, g, dq, dk, dv ×2 buffers
        + (2 * num_heads * N * N * 4 if has_bias else 0)  # bias + dbias
        + num_heads * 16 * N * N
    )
    budget = BIASED_BWD_VMEM_BUDGET_BYTES if has_bias else VMEM_BUDGET_BYTES
    return est <= budget


def make_fused_full_attention_rpe(num_heads: int, assemble_fn,
                                  use_pallas: bool = True,
                                  pallas_bwd: bool = True):
    """RPE variant of :func:`make_fused_full_attention` whose custom VJP
    boundary encloses the bias ASSEMBLY: ``assemble_fn(*bias_params) →
    (H, N, N) f32``. The residuals saved for the backward are the tiny
    table params, not the assembled tensor — at 1024² stage 3 the
    (6, 4097, 4097) f32 bias is 403 MB and saving it per block OOMed the
    chip (8 blocks ≈ 3.2 GB over a 16 GB HBM; measured: 18.7 GB requested).
    The backward re-assembles the bias (one extra gather per layer) and
    routes dbias through ``jax.vjp(assemble_fn)`` (the gather's scatter-add
    transpose). Returns ``fused(q, k, v, *bias_params)``."""

    inner = make_fused_full_attention(num_heads, use_pallas, pallas_bwd)

    @jax.custom_vjp
    def fused(q, k, v, *bias_params):
        return inner(q, k, v, assemble_fn(*bias_params))

    def fwd(q, k, v, *bias_params):
        bias = assemble_fn(*bias_params)
        out, res = _fused_fwd_parts(
            q, k, v, bias, num_heads, use_pallas, pallas_bwd
        )
        q_, k_, v_, _, lse = res
        return out, (q_, k_, v_, lse, bias_params)

    def bwd(res, g):
        q, k, v, lse, bias_params = res
        bias, assemble_vjp = jax.vjp(assemble_fn, *bias_params)
        dq, dk, dv, dbias = _fused_bwd_parts(
            (q, k, v, bias, lse), g, num_heads, use_pallas
        )
        if dbias is None:
            dparams = tuple(
                jnp.zeros_like(p) for p in bias_params
            )
        else:
            dparams = assemble_vjp(dbias.astype(bias.dtype))
        return (dq, dk, dv, *dparams)

    fused.defvjp(fwd, bwd)
    return fused


def make_fused_full_attention(num_heads: int, use_pallas: bool = True,
                              pallas_bwd: bool = True):
    """Dense attention with custom VJP. Forward: fused Pallas kernel (the
    train path also stashes the per-query log-sum-exp); backward: fused
    Pallas kernel when the shape fits ``supported_bwd``, else XLA recompute
    from the saved inputs."""

    @jax.custom_vjp
    def fused(q, k, v, bias):
        if use_pallas:
            return _forward_dispatch(q, k, v, bias, num_heads)
        return _xla_reference(q, k, v, bias, num_heads)

    def fwd(q, k, v, bias):
        return _fused_fwd_parts(q, k, v, bias, num_heads, use_pallas,
                                pallas_bwd)

    def bwd(res, g):
        return _fused_bwd_parts(res, g, num_heads, use_pallas)

    fused.defvjp(fwd, bwd)
    return fused


def _forward_dispatch(q, k, v, bias, num_heads, with_lse=False):
    """Tier choice: whole-image kernel when it fits, else the q-tiled
    kernel (huge N, bias streamed), else the XLA reference."""
    B, N, C = q.shape
    if supported(B, N, C, num_heads, bias is not None):
        return _pallas_forward(q, k, v, bias, num_heads, with_lse=with_lse)
    if supported_tiled(B, N, C, num_heads, bias is not None):
        return _pallas_forward_tiled(q, k, v, num_heads, bias=bias,
                                     with_lse=with_lse)
    out = _xla_reference(q, k, v, bias, num_heads)
    return (out, None) if with_lse else out


def _fused_fwd_parts(q, k, v, bias, num_heads, use_pallas, pallas_bwd):
    """Shared custom-VJP forward: returns (out, (q, k, v, bias, lse))."""
    B, N, C = q.shape
    has_bias = bias is not None
    fused_bwd = (
        use_pallas
        and pallas_bwd
        and supported(B, N, C, num_heads, has_bias)
        and supported_bwd(B, N, C, num_heads, has_bias)
    )
    tiled_bwd = (
        use_pallas
        and pallas_bwd
        and not fused_bwd
        and not supported(B, N, C, num_heads, has_bias)
        and supported_tiled(B, N, C, num_heads, has_bias)
        and supported_bwd_tiled(B, N, C, num_heads, has_bias)
    )
    if fused_bwd:
        out, lse = _pallas_forward(q, k, v, bias, num_heads, with_lse=True)
        return out, (q, k, v, bias, lse)
    if tiled_bwd:
        out, lse = _pallas_forward_tiled(
            q, k, v, num_heads, bias=bias, with_lse=True
        )
        return out, (q, k, v, bias, lse)
    out = (
        _forward_dispatch(q, k, v, bias, num_heads)
        if use_pallas
        else _xla_reference(q, k, v, bias, num_heads)
    )
    return out, (q, k, v, bias, None)


def _fused_bwd_parts(res, g, num_heads, use_pallas):
    """Shared custom-VJP backward: returns (dq, dk, dv, dbias|None)."""
    q, k, v, bias, lse = res
    if lse is not None:
        B, N, C = q.shape
        # the forward's tier choice is a pure function of the shapes —
        # re-derive which backward the stashed lse belongs to
        if supported(B, N, C, num_heads, bias is not None):
            grads = _pallas_backward(q, k, v, g, lse, bias, num_heads)
            dq, dk, dv = grads[:3]
            dbias = (
                grads[3].astype(bias.dtype) if bias is not None else None
            )
            return dq, dk, dv, dbias
        grads = _pallas_backward_tiled(
            q, k, v, g, lse, num_heads, bias=bias
        )
        dq, dk, dv = grads[:3]
        dbias = grads[3].astype(bias.dtype) if bias is not None else None
        return dq, dk, dv, dbias

    diff_args = tuple(a for a in (q, k, v, bias) if a is not None)

    def wrapped(*args):
        it = iter(args)
        full = [next(it) if a is not None else None for a in (q, k, v, bias)]
        return _xla_reference(*full, num_heads)

    _, vjp = jax.vjp(wrapped, *diff_args)
    grads = iter(vjp(g))
    return tuple(
        next(grads) if a is not None else None for a in (q, k, v, bias)
    )
