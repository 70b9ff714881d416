"""Fused LayerNorm forward/backward Pallas kernels.

Motivation (train-step profile, docs/ROADMAP.md): with flax's LayerNorm the
backward pass materializes f32 casts of the SAVED bf16 activations
(`copy.993`-class ops — ~10s of MB per LN site per step at batch 64).
These kernels read the bf16 residuals directly and do all statistics /
accumulation in f32 **in registers**, so no activation-sized f32 tensor
ever exists in HBM:

* forward: one pass — mean/var/normalize/affine computed in f32 from the
  input tile, emitted in the input dtype. Only ``(x, gamma)`` are saved for
  the backward (statistics are recomputed — two VPU reductions are cheaper
  than an HBM round-trip of mean/rstd for these row counts).
* backward: recomputes mean/rstd, then
      dx = rstd·(γ·dy − mean_c(γ·dy) − x̂·mean_c(γ·dy·x̂))
  emitted in the input dtype; dγ/dβ accumulate across the row-tile grid in
  a constant-index f32 output block (same discipline as the attention
  kernels' dbias).

The public entry ``layer_norm(x, gamma, beta, eps)`` flattens leading axes,
tiles rows, and falls back to a pure-XLA implementation when the row count
doesn't tile or the platform has no Mosaic (CPU tests run interpret mode).

Replaces torch ``nn.LayerNorm`` sites of the reference (msvit.py:245-316
pre-norms, patch-embed norms) — clean-room TPU design, no reference code.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

# row-tile candidates: largest divisor of the flattened row count wins
_ROW_TILES = (1024, 512, 256, 128, 64, 32, 16, 8)


def _stats(x, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc, jax.lax.rsqrt(var + eps)


def _ln_fwd_kernel(eps, x_ref, g_ref, b_ref, y_ref):
    x = x_ref[...].astype(jnp.float32)
    xc, rstd = _stats(x, eps)
    y = xc * rstd * g_ref[...] + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_bwd_kernel(eps, x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    xc, rstd = _stats(x, eps)
    xhat = xc * rstd
    wdy = dy * g_ref[...]
    c1 = jnp.mean(wdy, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    dx = rstd * (wdy - c1 - xhat * c2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)  # (1, C) f32
    db = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = dg
        db_ref[...] = db

    @pl.when(i != 0)
    def _():
        dg_ref[...] += dg
        db_ref[...] += db


def _pick_row_tile(rows: int) -> int:
    for t in _ROW_TILES:
        if rows % t == 0:
            return t
    return 0


def _xla_layer_norm(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, gamma, beta, eps: float = 1e-6):
    """LayerNorm over the last axis with fused Pallas fwd/bwd.

    x: (..., C) any leading shape; gamma/beta: (C,) f32 params.
    """
    return _ln_forward(x, gamma, beta, eps)


def _ln_forward(x, gamma, beta, eps):
    C = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    tile = _pick_row_tile(rows)
    if tile == 0:
        return _xla_layer_norm(x, gamma, beta, eps)
    x2 = x.reshape(rows, C)
    y2 = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        interpret=INTERPRET,
    )(x2, gamma.astype(jnp.float32)[None], beta.astype(jnp.float32)[None])
    return y2.reshape(x.shape)


def _ln_fwd_rule(x, gamma, beta, eps):
    return _ln_forward(x, gamma, beta, eps), (x, gamma)


def _ln_bwd_rule(eps, res, dy):
    x, gamma = res
    C = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    tile = _pick_row_tile(rows)
    if tile == 0:
        _, vjp = jax.vjp(
            lambda x_, g_, b_: _xla_layer_norm(x_, g_, b_, eps),
            x, gamma, jnp.zeros((C,), gamma.dtype),
        )
        return vjp(dy)
    x2 = x.reshape(rows, C)
    dy2 = dy.reshape(rows, C)
    row_spec = pl.BlockSpec((tile, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, C), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    dx2, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps),
        grid=(rows // tile,),
        in_specs=[row_spec, const_spec, row_spec],
        out_specs=[row_spec, const_spec, const_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=INTERPRET,
    )(x2, gamma.astype(jnp.float32)[None], dy2)
    return (
        dx2.reshape(x.shape),
        dg[0].astype(gamma.dtype),
        db[0].astype(gamma.dtype),
    )


layer_norm.defvjp(_ln_fwd_rule, _ln_bwd_rule)
