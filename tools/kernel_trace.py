#!/usr/bin/env python
"""In-kernel phase anatomy of the fused ViL forward kernel.

``jax.named_scope`` inside a Pallas TPU kernel lowers to Mosaic
``tpu.trace_start``/``tpu.trace_stop`` ops, so with
``VIL_TPU_KERNEL_TRACE=1`` (vil_kernel._scope) every annotated phase —
nbh_concat / score_gemm / score_add / softmax_max / softmax_exp /
lse_stash / pv_gemm / out_store / kv_row_load — shows up as a device trace
event in a ``jax.profiler`` capture. This tool runs the stage-shaped fused
forward under the profiler and prints the aggregated per-phase anatomy the
roadmap's ABLATE knob could only approximate (docs/ROADMAP.md).

Usage:
    VIL_TPU_KERNEL_TRACE=1 python tools/kernel_trace.py [--batch 128]
        [--stage 1] [--iters 8] [--out /tmp/vil_kernel_trace] [--lse]

Run ONE TPU process at a time (docs/BENCHMARKS.md measurement rule).
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import os.path as op
import sys

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))
sys.path.insert(0, op.dirname(op.abspath(__file__)))  # tools/ (xplane)

PHASES = (
    "nbh_concat", "score_gemm", "score_add", "softmax_max", "softmax_exp",
    "lse_stash", "pv_gemm", "out_store", "kv_row_load",
)


def capture(args):
    import jax
    import jax.numpy as jnp

    from vil_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()

    from benchmarks.kernel_bench import ALL_STAGES
    from vil_tpu.ops import masks as masks_lib
    from vil_tpu.ops.pallas import vil_kernel

    if not vil_kernel.KERNEL_TRACE:
        raise SystemExit("set VIL_TPU_KERNEL_TRACE=1 (before jax imports)")

    name, mx, my, W, C, H, nglo = ALL_STAGES[args.stage]
    w2 = W * W
    B = args.batch
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, mx, my, w2, C), dtype)
    k = jax.random.normal(ks[1], (B, mx, my, w2, C), dtype)
    v = jax.random.normal(ks[2], (B, mx, my, w2, C), dtype)
    kg = jax.random.normal(ks[3], (B, nglo, C), dtype) if nglo else None
    vg = jax.random.normal(ks[4], (B, nglo, C), dtype) if nglo else None
    mask_bool = masks_lib.invalid_mask(mx, my, 0, 0, W, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)

    @jax.jit
    def run(q, k, v):
        out = q
        for _ in range(args.iters):
            out = vil_kernel._pallas_forward_mh(
                out, k, v, kg, vg, None, mask_add, H, with_lse=args.lse
            )
            if args.lse:
                out = out[0]
        return jnp.sum(out.astype(jnp.float32))

    print(f"{name} batch={B} iters={args.iters} lse={args.lse}", flush=True)
    float(run(q, k, v))  # compile + warmup outside the capture
    # tpu.trace_start carries level=10 (VERBOSE); the default device trace
    # level drops those events, so raise it via ProfileOptions. Key names
    # vary across libtpu versions — set the plausible ones; unknown keys are
    # ignored by the collector.
    options = None
    try:
        options = jax.profiler.ProfileOptions()
        options.host_tracer_level = 3
        options.advanced_configuration = {
            # libtpu accepts tpu_trace_mode ∈ {TRACE_ONLY_XLA (default),
            # TRACE_COMPUTE, TRACE_COMPUTE_AND_DMA, TRACE_INSTRUCTION, …};
            # the in-kernel tracemarks land on the "TC Overlay" plane line
            # only under a compute-tracing mode
            "tpu_trace_mode": args.trace_mode,
            "device_tracer_level": args.trace_level,
        }
    except Exception as e:
        print(f"ProfileOptions unavailable ({e!r}); default levels", flush=True)
    with jax.profiler.trace(args.out, profiler_options=options):
        float(run(q, k, v))
    return args.out


def analyze(out_dir: str, iters: int):
    """Aggregate per-phase device durations from the capture's xplane.pb
    (the trace.json conversion drops device planes through the tunnel —
    tools/xplane.py reads the proto directly, device-clocked)."""
    import xplane

    hits = sorted(glob.glob(op.join(out_dir, "plugins/profile/*/*.xplane.pb")))
    if not hits:
        raise SystemExit(f"no xplane under {out_dir}")
    agg = collections.defaultdict(lambda: [0, 0.0])
    total_kernel = 0.0
    other = collections.Counter()
    for plane in xplane.device_planes(hits[-1]):
        for line in plane.lines:
            for e in line.events:
                base = e.name.rsplit("/", 1)[-1]
                if base in PHASES:
                    agg[base][0] += 1
                    agg[base][1] += e.duration_ps / 1e6  # ps → µs
                elif line.name == "XLA Ops" and "custom-call" in e.name:
                    total_kernel += e.duration_ps / 1e6
                else:
                    other[f"{line.name} | {e.name[:60]}"] += 1
    if total_kernel:
        print(f"custom-call device time: {total_kernel / 1e3 / iters:.3f} "
              f"ms/call")
    if not agg:
        print("no phase events found; top event names were:")
        for nm, c in other.most_common(25):
            print(f"  {c:6d}  {nm}")
        return
    print(f"\nper-phase anatomy (sum over capture / {iters} chained calls):")
    tot = sum(v[1] for v in agg.values())
    for nm, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {nm:12s} {dur / 1e3 / iters:8.3f} ms/call  "
              f"({100 * dur / max(tot, 1e-9):5.1f}%  n={cnt})")
    print(f"  {'TOTAL':12s} {tot / 1e3 / iters:8.3f} ms/call (scoped phases)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stage", default="1")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--lse", action="store_true",
                    help="trace the train-path forward (LSE stash)")
    ap.add_argument("--out", default="/tmp/vil_kernel_trace")
    ap.add_argument("--trace-level", type=int, default=10,
                    help="device trace level (tpu.trace_start uses 10)")
    ap.add_argument("--trace-mode", default="TRACE_COMPUTE_AND_DMA",
                    help="libtpu tpu_trace_mode (TRACE_COMPUTE, "
                         "TRACE_COMPUTE_AND_DMA, TRACE_INSTRUCTION, ...)")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        os.makedirs(args.out, exist_ok=True)
        capture(args)
    analyze(args.out, args.iters)


if __name__ == "__main__":
    main()
