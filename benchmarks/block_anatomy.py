#!/usr/bin/env python
"""Micro-anatomy of one VilAttention block: time each constituent op in
isolation at real stage shapes (chained two-point timing, see bench.py).

Locates where the non-kernel per-block time goes (LN, QKV GEMMs, chunkify,
global-score einsum, unchunkify, proj, global branch, residual), to direct
fusion work. Run ONE TPU process at a time (docs/BENCHMARKS.md rule).

Usage: python benchmarks/block_anatomy.py [--batch 128] [--stage 1|2]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

from layer_breakdown import two_point_ms  # noqa: E402

from vil_tpu.ops import masks as masks_lib  # noqa: E402
from vil_tpu.ops import sliding_chunk as sc  # noqa: E402
from vil_tpu.ops.pallas import vil_kernel  # noqa: E402

STAGES = {
    1: dict(nx=56, C=96, H=3, W=7),
    2: dict(nx=28, C=192, H=3, W=7),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stage", type=int, default=1)
    args = ap.parse_args()
    s = STAGES[args.stage]
    B, nx, C, H, W = args.batch, s["nx"], s["C"], s["H"], s["W"]
    ny, nglo = nx, 1
    Nloc, N = nx * ny, nx * ny + 1
    M, W2 = C // H, W * W
    padx, pady, mx, my = sc.chunk_grid(nx, ny, W)
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    x = jax.random.normal(key, (B, N, C), dt)
    xc = jax.random.normal(key, (B, mx, my, W2, C), dt)
    wq = jax.random.normal(key, (C, C), dt) * 0.05
    wkv = jax.random.normal(key, (C, 2 * C), dt) * 0.05
    gamma = jnp.ones((C,), jnp.float32)
    kg = jax.random.normal(key, (B, nglo, C), dt)
    probs_g = jax.random.normal(key, (B, H, nglo, N), dt)

    mask_bool = masks_lib.invalid_mask(mx, my, padx, pady, W, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, W2, nglo)
    fused = vil_kernel.make_fused_vil_attention_mh(mask_add, H)

    results = {}

    def t(name, fn, inp):
        results[name] = two_point_ms(fn, inp)
        print(f"  {name:34s} {results[name]:7.3f} ms")

    print(f"stage {args.stage}: B={B} N={N} C={C} H={H} grid {mx}x{my} W2={W2}")

    # elementwise / normalization
    ln = lambda t_: (jax.nn.standardize(t_.astype(jnp.float32), axis=-1,
                                        epsilon=1e-6) * gamma).astype(dt)
    t("layernorm (B,N,C)", ln, x)

    # projections
    t("query GEMM C->C", lambda v: v @ wq, x)
    t("kv GEMM C->2C", lambda v: v @ wkv, x)
    t("qkv GEMM C->3C (combined)",
      lambda v: v @ jnp.concatenate([wq, wkv], axis=1), x)

    # layout ops
    tok = x[:, nglo:]
    t("chunkify x1", lambda v: sc.chunkify(v, nx, ny, W), tok)
    t("chunkify x3", lambda v: jnp.stack([
        sc.chunkify(v, nx, ny, W),
        sc.chunkify(v * 1.0001, nx, ny, W),
        sc.chunkify(v * 0.9999, nx, ny, W)]), tok)
    t("unchunkify", lambda v: sc.unchunkify(v, nx, ny, W), xc)

    # global-score precompute (XLA side of the kernel)
    def sg(q):
        q5 = q.reshape(B, mx, my, W2, H, M)
        kg4 = kg.reshape(B, nglo, H, M)
        return jnp.einsum("bxywhm,bghm->bxywhg", q5, kg4,
                          preferred_element_type=jnp.float32)
    t("global-score einsum", sg, xc)

    # variant: elementwise-multiply + lane reduce (no degenerate 1-col GEMM)
    def sg_mulred(q):
        q5 = q.reshape(B, mx, my, W2, H, M)
        kg5 = kg.reshape(B, 1, 1, 1, H * nglo, M)  # nglo folded into head axis
        prod = q5.reshape(B, mx, my, W2, H, 1, M) * kg.reshape(
            B, 1, 1, 1, H, nglo, M
        )
        return jnp.sum(prod.astype(jnp.float32), axis=-1)
    t("global-score mul+reduce", sg_mulred, xc)

    # the fused kernel itself
    t("vil kernel (fused fwd)",
      lambda q: fused(q, xc, xc, kg, kg, None), xc)

    # global branch (dense attention of nglo queries over all tokens)
    def glo_branch(k_tok):
        k4 = k_tok.reshape(B, N, H, M)
        qg = kg.reshape(B, nglo, H, M)
        a0 = jnp.einsum("bnhm,bthm->bhnt", qg, k4,
                        preferred_element_type=jnp.float32)
        p = jax.nn.softmax(a0, axis=-1).astype(dt)
        return jnp.einsum("bhnt,bthm->bnhm", p, k4,
                          preferred_element_type=jnp.float32)
    t("global branch (q_glo over N)", glo_branch, x)

    # variant: scores and AV as elementwise-mult + reductions (one pass over
    # K and one over V, no degenerate single-row GEMMs)
    def glo_branch_mulred(k_tok):
        k4 = k_tok.reshape(B, N, H, M)
        qg = kg.reshape(B, 1, H, nglo, M)
        s = jnp.sum(
            (k4.reshape(B, N, H, 1, M) * qg).astype(jnp.float32), axis=-1
        )  # (B, N, H, nglo)
        p = jax.nn.softmax(s, axis=1).astype(dt)
        return jnp.sum(p[..., None] * k4.reshape(B, N, H, 1, M), axis=1)
    t("global branch mul+reduce", glo_branch_mulred, x)

    # residual + concat epilogue
    t("residual add (B,N,C)", lambda v: v + v * 1.0001, x)

    non_kernel = sum(v for k, v in results.items()
                     if k not in ("vil kernel (fused fwd)",
                                  "qkv GEMM C->3C (combined)",
                                  "chunkify x1"))
    print(f"  sum of non-kernel parts ≈ {non_kernel:.3f} ms "
          f"(block target: see layer_breakdown)")


if __name__ == "__main__":
    main()
