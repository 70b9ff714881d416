#!/usr/bin/env python
"""Benchmark: ViL-Small 224² inference throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY §6); the BASELINE.json
north star is ≥3× an A100-PyTorch baseline on a single v5e chip. We
normalize vs_baseline against an assumed A100 ViL-Small fp16 inference
throughput of ~333 images/sec (so vs_baseline ≈ 1.0 == the 3× target,
i.e. 1000 img/s).

Timing notes for this environment: the axon remote backend's
block_until_ready can return before remote completion, and dispatch has a
large tunnel RTT — so we time K iterations chained inside one jit (true data
dependency between iterations) and fetch a scalar, using a two-point
difference to cancel the fixed overhead.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

A100_BASELINE_IMG_S = 333.0  # assumed A100-PyTorch ViL-Small fp16 inference
TARGET_MULTIPLE = 3.0

# peak dense bf16 matmul throughput per chip, TFLOP/s (for the MFU line —
# the achieved-FLOPs number does NOT depend on the assumed A100 baseline)
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e (197 bf16 TFLOP/s)
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


def peak_tflops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_TFLOPS.items():
        if k.lower() in kind.lower() or kind.lower() in k.lower():
            return v
    return 197.0  # default: v5e


def analytic_tflops_per_image() -> float:
    """Analytic inference FLOPs (2 × MACs) for the benched config."""
    from vil_tpu.models import ARCH_ZOO
    from vil_tpu.ops.flops import model_macs

    macs = model_macs(
        ARCH_ZOO["vil_small"], img_size=224, attn_type="longformerhand"
    )
    return 2.0 * macs["macs"] / 1e12


def build_model_and_vars(batch: int):
    from vil_tpu.models import ARCH_ZOO, MsViT

    on_tpu = jax.default_backend() == "tpu"
    model = MsViT(
        arch=ARCH_ZOO["vil_small"],
        img_size=224,
        num_classes=1000,
        attn_type="longformerhand",
        sharew=True,
        norm_embed=True,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    return model, variables, x


def make_chained_forward(model, iters: int):
    """Run `iters` forwards with a data dependency; returns a scalar."""

    @jax.jit
    def run(variables, x):
        def body(i, carry):
            x_i = x * (1 + 1e-24 * carry).astype(x.dtype)
            logits = model.apply({"params": variables["params"]}, x_i,
                                 deterministic=True)
            return carry + jnp.sum(logits).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def timed_fetch(fn, variables, x) -> float:
    t0 = time.time()
    float(fn(variables, x))  # host fetch forces completion
    return time.time() - t0


def _median_spread(samples: list[float]) -> tuple[float, float, int]:
    """(median, relative spread (max−min)/median, n valid samples) — the r4
    verdict's ask: best-of-N with no spread made regression, noise, and
    improvement indistinguishable in the artifact. The sample COUNT is
    carried too: a tunnel-hiccup run surviving on one valid sample would
    otherwise report spread 0.0 and look maximally stable exactly when the
    measurement was noisiest."""
    import statistics

    med = statistics.median(samples)
    spread = (max(samples) - min(samples)) / med if med > 0 else 0.0
    return med, spread, len(samples)


def measure(batch: int, repeats: int = 5) -> tuple[float, float, int]:
    """Returns (median img/s, relative spread, n valid samples) over
    ``repeats`` serialized two-point measurements. The wider 8/40 iteration
    pair (vs r4's 4/20) halves the per-sample noise the two-point
    difference inherits from the tunnel RTT jitter — the r5 target is a
    spread the kernel-delta claims can clear."""
    iters_a, iters_b = 8, 40
    model, variables, x = build_model_and_vars(batch)

    run_a = make_chained_forward(model, iters_a)
    run_b = make_chained_forward(model, iters_b)
    # warmup/compile both programs
    timed_fetch(run_a, variables, x)
    timed_fetch(run_b, variables, x)

    samples = []
    for _ in range(2 * repeats):  # keep sampling past tunnel hiccups
        ta = timed_fetch(run_a, variables, x)
        tb = timed_fetch(run_b, variables, x)
        per_iter = (tb - ta) / (iters_b - iters_a)
        if per_iter > 0:  # tunnel hiccups can invert the two-point pair
            samples.append(batch / per_iter)
        if len(samples) >= repeats:
            break
    if not samples:
        raise RuntimeError("no valid two-point samples")
    return _median_spread(samples)


def measure_train(batch: int, repeats: int = 3) -> tuple[float, float]:
    """Chained train-step throughput (fwd + bwd + adamw + mixup), the
    reference's primary workload (engine.py:60-195) — same harness as
    benchmarks/train_bench.py, same two-point timing as measure().
    Returns (median img/s, relative spread)."""
    import optax

    from vil_tpu.data.mixup import make_mixup_fn
    from vil_tpu.models import ARCH_ZOO, MsViT
    from vil_tpu.train.engine import create_train_state, make_train_step
    from vil_tpu.train.loss import soft_target_cross_entropy

    on_tpu = jax.default_backend() == "tpu"
    model = MsViT(
        arch=ARCH_ZOO["vil_small"], img_size=224, num_classes=1000,
        attn_type="longformerhand", sharew=True, norm_embed=True,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, use_pallas=on_tpu,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.float32
    )
    tx = optax.adamw(1e-4, weight_decay=0.05)
    targets = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 1000)
    state = jax.jit(lambda: create_train_state(
        model, tx, jax.random.PRNGKey(0), x))()
    train_step = make_train_step(
        model, soft_target_cross_entropy, tx,
        mixup_fn=make_mixup_fn(num_classes=1000),
    )
    rng = jax.random.PRNGKey(3)

    @jax.jit
    def run(state, iters):
        def body(i, carry):
            st, _ = carry
            st, metrics = train_step(st, x, targets, rng)
            return st, metrics["loss"].astype(jnp.float32)

        _, loss = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0.0)))
        return loss

    def timed(iters) -> float:
        t0 = time.time()
        float(run(state, jnp.int32(iters)))
        return time.time() - t0

    iters_a, iters_b = 5, 20
    timed(iters_a)  # compile + warmup
    samples = []
    for _ in range(2 * repeats):
        ta, tb = timed(iters_a), timed(iters_b)
        per = (tb - ta) / (iters_b - iters_a)
        if per > 0:
            samples.append(batch / per)
        if len(samples) >= repeats:
            break
    if not samples:
        raise RuntimeError("no valid two-point samples")
    return _median_spread(samples)


def main():
    import os
    import sys

    if os.environ.get("VIL_TPU_ABLATE"):
        raise SystemExit(
            "VIL_TPU_ABLATE is set — the fused kernels compute wrong numerics "
            "under this timing-only knob; refusing to produce a headline number."
        )

    if "--sweep" in sys.argv:
        for batch in (64, 128, 256):
            v, spread, n = measure(batch)
            print(f"batch {batch}: {v:.1f} img/s (spread {spread:.1%}, "
                  f"n={n})", flush=True)
        return

    # compiled-kernel numerics evidence: fused Pallas fwd+VJP vs the XLA
    # reference, on the real backend (tools/tpu_kernel_smoke.py)
    kernels_ok = None
    try:
        import os
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from tpu_kernel_smoke import run_smoke

        for attempt in range(3):  # the tunnel drops remote compiles sometimes
            try:
                kernels_ok = bool(run_smoke()["ok"])
                break
            except Exception as e:
                print(f"kernel smoke attempt {attempt + 1} failed: {e!r}",
                      file=__import__("sys").stderr)
                time.sleep(30)
        else:
            kernels_ok = False
    except Exception as e:  # never block the throughput line
        print(f"kernel smoke failed to run: {e!r}", file=__import__("sys").stderr)
        kernels_ok = False

    # batch sweep (r2, quiet machine): 64 → 5599, 128 → 5051, 256 → 4853
    # img/s; 64 wins for inference too (matches the training sweet spot)
    batch = 64
    images_per_sec, spread, n_samples = measure(batch)
    # achieved model FLOP/s (analytic 2·MACs, ops/flops.py) and MFU against
    # the chip's peak bf16 matmul rate — assumption-free, unlike vs_baseline
    tf_img = analytic_tflops_per_image()
    tflops = images_per_sec * tf_img
    peak = peak_tflops()

    # training throughput in the same artifact (fwd+bwd+adamw+mixup): train
    # FLOPs ≈ 3× inference (backward ≈ 2× forward), so train MFU uses 3·tf_img
    try:
        train_img_s, train_spread, train_n = measure_train(batch)
        train_tflops = train_img_s * 3.0 * tf_img
    except Exception as e:  # never block the inference line
        print(f"train bench failed to run: {e!r}", file=__import__("sys").stderr)
        train_img_s = train_tflops = train_spread = train_n = None
    print(
        json.dumps(
            {
                "metric": "vil_small_224_inference_throughput",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    images_per_sec / (A100_BASELINE_IMG_S * TARGET_MULTIPLE), 3
                ),
                "baseline_def": (
                    f"assumed A100-PyTorch fp16 {A100_BASELINE_IMG_S:.0f} img/s"
                    f" x {TARGET_MULTIPLE:.0f} (reference publishes no"
                    " throughput)"
                ),
                "batch": batch,
                "spread": round(spread, 4),
                "n_samples": n_samples,
                "tflops": round(tflops, 2),
                "mfu": round(tflops / peak, 4),
                "train_img_s": (
                    round(train_img_s, 2) if train_img_s else None
                ),
                "train_spread": (
                    round(train_spread, 4)
                    if train_spread is not None else None
                ),
                "train_n_samples": train_n,
                "train_mfu": (
                    round(train_tflops / peak, 4) if train_tflops else None
                ),
                "peak_tflops": peak,
                "kernels_ok": kernels_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
