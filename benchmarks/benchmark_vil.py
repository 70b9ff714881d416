#!/usr/bin/env python
"""Attention-implementation benchmark (reference src/tests/benchmark_vil.py).

Sweeps image sizes and compares, per implementation, forward(+backward) time
and peak device memory:

    full        dense attention
    sc_xla      sliding-chunk, pure-XLA roll-einsum tier
    sc_pallas   fused Pallas kernel (TPU)
    linformer / srformer / performer

Usage:
    python benchmarks/benchmark_vil.py [--train] [--sizes 56 112 224]
        [--dim 96] [--heads 3] [--batch 8] [--cpu]

Timing uses K iterations chained in one jit with a host fetch (see bench.py
notes on the axon backend's async dispatch).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def attention_module(kind: str, dim: int, heads: int, seq_len: int, w: int):
    from vil_tpu.models.attention import FullAttention, VilAttention
    from vil_tpu.models.attention_efficient import (
        LinformerAttention,
        PerformerAttention,
        SRAttention,
    )

    common = dict(dim=dim, num_heads=heads)
    if kind == "full":
        return FullAttention(**common)
    if kind == "sc_xla":
        return VilAttention(w=w, nglo=1, sharew=True, use_pallas=False, **common)
    if kind == "sc_pallas":
        return VilAttention(w=w, nglo=1, sharew=True, use_pallas=True, **common)
    if kind == "linformer":
        return LinformerAttention(seq_len=seq_len, num_feats=256, **common)
    if kind == "srformer":
        return SRAttention(rratio=2, **common)
    if kind == "performer":
        return PerformerAttention(nb_features=256, **common)
    raise ValueError(kind)


def bench_one(kind: str, size: int, dim: int, heads: int, batch: int,
              train: bool, iters: int = 10) -> dict:
    nglo = 1 if kind in ("full", "sc_xla", "sc_pallas") else 0
    seq_len = size * size + nglo
    mod = attention_module(kind, dim, heads, seq_len, w=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, seq_len, dim))
    variables = mod.init({"params": jax.random.PRNGKey(1)}, x, size, size, True)

    if train:
        def loss(v, x):
            return jnp.sum(mod.apply(v, x, size, size, True) ** 2)

        def one(v, x):
            l, g = jax.value_and_grad(loss)(v, x)
            return l + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-30
    else:
        def one(v, x):
            return jnp.sum(mod.apply(v, x, size, size, True)).astype(jnp.float32)

    def chained(n):
        @jax.jit
        def run(v, x):
            def body(i, c):
                return c + one(v, x * (1 + 1e-24 * c).astype(x.dtype)) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    ra, rb = chained(2), chained(2 + iters)
    float(ra(variables, x)); float(rb(variables, x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(ra(variables, x)); ta = time.time() - t0
        t0 = time.time(); float(rb(variables, x)); tb = time.time() - t0
        per = (tb - ta) / iters
        if 0 < per < best:
            best = per
    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        mem = stats.get("peak_bytes_in_use", None)
    except Exception:
        pass
    return {"impl": kind, "size": size, "ms": best * 1e3,
            "peak_mb": None if mem is None else mem / 2**20}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[28, 56, 112])
    p.add_argument("--impls", nargs="+",
                   default=["full", "sc_xla", "sc_pallas", "linformer",
                            "srformer", "performer"])
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--heads", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--train", action="store_true", help="bench fwd+bwd")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "tpu" and "sc_pallas" in args.impls:
        args.impls = [i for i in args.impls if i != "sc_pallas"]
    for size in args.sizes:
        for impl in args.impls:
            if impl == "full" and size > 112:
                continue  # quadratic blowup, mirrors reference OOM skips
            try:
                r = bench_one(impl, size, args.dim, args.heads, args.batch,
                              args.train)
                print(json.dumps(r))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"impl": impl, "size": size,
                                  "error": f"{type(e).__name__}: {e}"[:200]}))


if __name__ == "__main__":
    main()
