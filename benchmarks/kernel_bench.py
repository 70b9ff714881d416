#!/usr/bin/env python
"""Standalone TPU micro-benchmark for the fused ViL attention kernel.

Times _pallas_forward_mh (and the XLA reference tier) on per-stage ViL
shapes with the chained-iteration harness (bench.py docstring). Small
compile units → fast iteration when tuning the kernel.

Usage: python benchmarks/kernel_bench.py [--batch 128] [--xla] [--stages 1,2]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

# (name, mx, my, W, C, H, nglo) — ViL-Small 224 stage shapes
STAGES_224 = {
    "1": ("stage1 56x56 C96 H3", 8, 8, 7, 96, 3, 1),
    "2": ("stage2 28x28 C192 H3", 4, 4, 7, 192, 3, 1),
    # anatomy variant: stage 1 WITHOUT the global-token tail (isolates the
    # Nglo concat/columns cost; pair with VIL_TPU_ABLATE for phase timing)
    "1g0": ("stage1 56x56 C96 H3 nglo0", 8, 8, 7, 96, 3, 0),
}
# ViL-Small/Medium @384: stage1 96x96 grid → 14 chunks w/ pad
STAGES_384 = {
    "1@384": ("stage1 96x96 C96 H3", 14, 14, 7, 96, 3, 1),
    "2@384": ("stage2 48x48 C192 H3", 7, 7, 7, 192, 3, 1),
}
ALL_STAGES = {**STAGES_224, **STAGES_384}


def two_point(run, x, iters_a=4, iters_b=20, reps=3):
    def fetch(n):
        t0 = time.time()
        float(run(x, jnp.int32(n)))
        return time.time() - t0

    fetch(iters_a)
    best = float("inf")
    for _ in range(reps):
        ta, tb = fetch(iters_a), fetch(iters_b)
        per = (tb - ta) / (iters_b - iters_a)
        if 0 < per < best:
            best = per
    return best * 1e3


def device_clock_ms(run, x, iters=8, out="/tmp/kernel_bench_trace"):
    """Per-call custom-call duration from a device trace (tools/xplane.py) —
    device-clocked, immune to the tunnel-RTT noise that can corrupt the
    two-point host timing (seen: stage-2 reading 0.80 ms vs its true 0.17)."""
    import glob
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import xplane

    with jax.profiler.trace(out):
        float(run(x, jnp.int32(iters)))
    pb = sorted(glob.glob(out + "/plugins/profile/*/*.xplane.pb"))[-1]
    total = 0.0
    for plane in xplane.device_planes(pb):
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                if "custom-call" in e.name:
                    total += e.duration_ps / 1e9
    return total / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--xla", action="store_true", help="time the XLA tier too")
    ap.add_argument("--stages", default="1,2")
    ap.add_argument("--host-clock", action="store_true",
                    help="use the legacy two-point host timing instead of "
                         "the device-clock trace")
    args = ap.parse_args()

    from vil_tpu.ops import masks as masks_lib
    from vil_tpu.ops.pallas import vil_kernel

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch

    for key in args.stages.split(","):
        name, mx, my, W, C, H, nglo = ALL_STAGES[key.strip()]
        w2 = W * W
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        q = jax.random.normal(ks[0], (B, mx, my, w2, C), dtype)
        k = jax.random.normal(ks[1], (B, mx, my, w2, C), dtype)
        v = jax.random.normal(ks[2], (B, mx, my, w2, C), dtype)
        kg = jax.random.normal(ks[3], (B, nglo, C), dtype) if nglo else None
        vg = jax.random.normal(ks[4], (B, nglo, C), dtype) if nglo else None
        mask_bool = masks_lib.invalid_mask(mx, my, 0, 0, W, 0, 0)
        mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)

        def chained(fn):
            @jax.jit
            def run(x, iters):
                def body(i, carry):
                    x_i = x * (1 + 1e-24 * carry).astype(x.dtype)
                    out = fn(x_i)
                    return carry + jnp.sum(out).astype(jnp.float32) * 1e-30

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            return run

        pallas_fn = lambda x: vil_kernel._pallas_forward_mh(
            x, k, v, kg, vg, None, mask_add, H
        )
        run = chained(pallas_fn)
        if args.host_clock or jax.default_backend() != "tpu":
            ms = two_point(run, q)
            clock = "host"
        else:
            two_point(run, q, reps=1)  # compile + warmup
            ms = device_clock_ms(run, q)
            clock = "device"
        cols = nglo + 9 * w2
        gflop = 2 * 2 * B * mx * my * w2 * cols * C / 1e9
        print(f"{name}: pallas {ms:8.3f} ms  ({gflop / ms:6.2f} TFLOP/s, "
              f"{clock} clock)")

        # numerics check vs the XLA tier (bf16 tolerance)
        out_p = pallas_fn(q)
        out_x = vil_kernel._xla_reference_mh(q, k, v, kg, vg, None, mask_add, H)
        err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                    - out_x.astype(jnp.float32))))
        print(f"{name}: max |pallas - xla| = {err:.2e}")

        if args.xla:
            xla_fn = lambda x: vil_kernel._xla_reference_mh(
                x, k, v, kg, vg, None, mask_add, H
            )
            ms = two_point(chained(xla_fn), q)
            print(f"{name}: xla    {ms:8.3f} ms  ({gflop / ms:6.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
