#!/usr/bin/env python
"""A/B micro-benchmark for the sliding-chunk attention BACKWARD variants.

Times vil_backward's whole-image, row-parts, and legacy two-pass
implementations on per-stage ViL shapes (chained-iteration two-point
timing, see bench.py docstring). Run ONE TPU process at a time.

Usage: python benchmarks/bwd_bench.py [--batch 64] [--stages 1,2]
       [--variants whole_image,row_parts,two_pass] [--bias]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

from benchmarks.kernel_bench import ALL_STAGES, two_point  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stages", default="1,2")
    ap.add_argument("--variants", default="whole_image,two_pass")
    ap.add_argument("--bias", action="store_true", help="include an RPE bias")
    ap.add_argument("--wide", choices=["auto", "on", "off"], default="auto",
                    help="force the wide dK/dV GEMM variant")
    ap.add_argument("--pair", choices=["auto", "on", "off"], default="auto",
                    help="force head-pair GEMM merging")
    ap.add_argument("--tile-t", type=int, default=0,
                    help="rows per tile for the tiled variant (0 = auto)")
    args = ap.parse_args()

    from vil_tpu.ops import masks as masks_lib
    from vil_tpu.ops.pallas import vil_backward, vil_kernel

    if args.wide != "auto":
        vil_backward.WIDE_DKDV = args.wide == "on"
    if args.pair != "auto":
        vil_backward.PAIR_HEADS = args.pair == "on"

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch

    for key in args.stages.split(","):
        name, mx, my, W, C, H, nglo = ALL_STAGES[key.strip()]
        w2 = W * W
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        mk = lambda k_, shp: jax.random.normal(k_, shp, dtype)
        q = mk(ks[0], (B, mx, my, w2, C))
        k = mk(ks[1], (B, mx, my, w2, C))
        v = mk(ks[2], (B, mx, my, w2, C))
        g = mk(ks[6], (B, mx, my, w2, C))
        kg = mk(ks[3], (B, nglo, C)) if nglo else None
        vg = mk(ks[4], (B, nglo, C)) if nglo else None
        bias = (
            jax.random.normal(ks[5], (H, w2, nglo + 9 * w2), jnp.float32)
            if args.bias else None
        )
        mask_bool = masks_lib.invalid_mask(mx, my, 0, 0, W, 0, 0)
        mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)

        fns = {"whole_image": vil_backward._backward_whole_image}

        def two_pass(*a):
            return vil_backward._backward_two_pass(*a[:-1], interpret=a[-1])

        fns["two_pass"] = two_pass

        def tiled(*a, mx=mx, my=my, w2=w2, C=C, H=H, nglo=nglo):
            T = args.tile_t or vil_backward._pick_tile_rows(
                mx, my, w2, C, H, nglo, a[5] is not None,
                a[0].dtype.itemsize, a[5].size if a[5] is not None else 0,
            ) or 1
            return vil_backward._backward_tiled(*a[:-2], a[-2], T, a[-1])

        fns["tiled"] = tiled
        fns["loop"] = vil_backward._backward_whole_image_loop

        # backward FLOPs: 5 score-sized GEMM units (QK, dP, dQ, dK, dV)
        cols = nglo + 9 * w2
        gflop = 5 * 2 * B * mx * my * w2 * 9 * w2 * C / 1e9

        for vname in args.variants.split(","):
            fn = fns[vname.strip()]

            def bwd(gin, fn=fn):
                outs = fn(q, k, v, kg, vg, bias, gin, mask_add, H, False)
                return outs[0] + outs[1] + outs[2]

            @jax.jit
            def run(x, iters, bwd=bwd):
                def body(i, carry):
                    x_i = x * (1 + 1e-24 * carry).astype(x.dtype)
                    out = bwd(x_i)
                    return carry + jnp.sum(out).astype(jnp.float32) * 1e-30

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            try:
                ms = two_point(run, g)
            except Exception as e:  # noqa: BLE001 — report OOMs per variant
                print(f"{name}: {vname:12s} FAILED: {type(e).__name__}")
                continue
            print(f"{name}: {vname:12s} {ms:8.3f} ms ({gflop / ms:6.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
