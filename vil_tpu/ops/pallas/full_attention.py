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
* Backward recomputes through plain XLA einsums under ``jax.custom_vjp``
  (the score matrix is cheap at these N; no residuals are saved).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flip in CPU tests for interpreter mode
INTERPRET = False

# whole-image kernel VMEM budget (default Mosaic scope is 16 MB)
VMEM_BUDGET_BYTES = 10 * 2**20


def _kernel(num_heads: int, has_bias: bool, *refs):
    """refs: [q, k, v, (bias)?, out]; q/k/v/out blocks (1, N, C)."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias = None
    if has_bias:
        bias = refs[i]; i += 1
    out_ref = refs[i]

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
        )  # (N, N)
        if bias is not None:
            scores = scores + bias[h]
        m = jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores - m).astype(q_h.dtype)  # unnormalized
        recip = 1.0 / jnp.sum(probs, axis=-1, keepdims=True, dtype=jnp.float32)
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
) -> jax.Array:
    """q, k, v: (B, N, C) with q pre-scaled; bias: (H, N, N) f32 or None.
    Returns (B, N, C)."""
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
        operands.append(bias.astype(jnp.float32))

    return pl.pallas_call(
        functools.partial(_kernel, num_heads, has_bias),
        grid=(B,),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * N * C,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
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
    """True when the whole-image kernel fits the VMEM budget."""
    itemsize = 2  # bf16 compute path
    est = (
        4 * 2 * N * C * itemsize  # q, k, v, out ×2 pipeline buffers
        + (num_heads * N * N * 4 if has_bias else 0)
        + 3 * N * N * 4  # live f32 score/prob intermediates
    )
    return est <= VMEM_BUDGET_BYTES


def make_fused_full_attention(num_heads: int, use_pallas: bool = True):
    """Dense attention with custom VJP. Forward: fused Pallas kernel;
    backward: XLA recompute (nothing saved but the inputs)."""

    @jax.custom_vjp
    def fused(q, k, v, bias):
        if use_pallas:
            return _pallas_forward(q, k, v, bias, num_heads)
        return _xla_reference(q, k, v, bias, num_heads)

    def fwd(q, k, v, bias):
        return fused(q, k, v, bias), (q, k, v, bias)

    def bwd(res, g):
        q, k, v, bias = res
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

    fused.defvjp(fwd, bwd)
    return fused
