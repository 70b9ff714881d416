#!/usr/bin/env python
"""Whole-model inference throughput for any zoo config (chained two-point
timing — see bench.py docstring). Run ONE TPU process at a time.

Usage: python benchmarks/model_bench.py [--arch vil_small] [--img 224]
       [--batch 128] [--no-pallas] [--f32]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="vil_small")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, nargs=2, default=(4, 12),
                    metavar=("A", "B"))
    ap.add_argument("--rpe", action="store_true",
                    help="relative position encoding (a0 on every stage)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sitecustomize axon "
                         "plugin ignores JAX_PLATFORMS)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a device trace and print the per-op "
                         "anatomy (tools/xplane.py)")
    ap.add_argument("--rpe-cache", action="store_true",
                    help="precompute the RPE biases once (serving mode — "
                         "models.precompute_rpe_cache)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vil_tpu.models import ARCH_ZOO, MsViT

    on_tpu = jax.default_backend() == "tpu"
    arch = ARCH_ZOO[args.arch]
    if args.rpe:
        import re

        arch = "_".join(
            re.sub(r"a\d+", "a0", s) if ",a" in s else s + ",a0"
            for s in arch.split("_")
        )
    model = MsViT(
        arch=arch, img_size=args.img, num_classes=1000,
        attn_type="longformerhand", sharew=True, norm_embed=True,
        dtype=jnp.float32 if args.f32 or not on_tpu else jnp.bfloat16,
        use_pallas=on_tpu and not args.no_pallas,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.img, args.img, 3), jnp.float32
    )
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    if args.rpe_cache:
        from vil_tpu.models import precompute_rpe_cache

        variables = precompute_rpe_cache(model, variables, x)

    def chained(iters):
        @jax.jit
        def run(v, x):
            def body(i, carry):
                x_i = x * (1 + 1e-24 * carry).astype(x.dtype)
                logits = model.apply(v, x_i, deterministic=True)
                return carry + jnp.sum(logits).astype(jnp.float32) * 1e-30

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    ia, ib = args.iters
    ra, rb = chained(ia), chained(ib)

    def t(fn):
        t0 = time.time()
        float(fn(variables, x))
        return time.time() - t0

    t(ra), t(rb)

    if args.profile:
        # device-clocked per-op anatomy (tools/xplane.py), mirroring
        # train_bench --profile
        import glob
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tools"))
        import xplane

        with jax.profiler.trace(args.profile):
            t(ra)
        pb = sorted(glob.glob(
            os.path.join(args.profile, "plugins/profile/*/*.xplane.pb")))[-1]
        print(f"\nper-op device anatomy ({ia} chained forwards):")
        for kind, cnt, ms in xplane.summarize(pb, topk=25):
            print(f"  {ms / ia:9.3f} ms/fwd  {cnt / ia:6.1f}x  {kind}")
    best = float("inf")
    for _ in range(3):
        d = (t(rb) - t(ra)) / (ib - ia)
        if 0 < d < best:
            best = d
    print(
        f"{args.arch} {args.img}px batch={args.batch} "
        f"pallas={not args.no_pallas}: "
        f"{best * 1e3:.2f} ms = {args.batch / best:.1f} img/s"
    )


if __name__ == "__main__":
    main()
