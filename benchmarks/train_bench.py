#!/usr/bin/env python
"""Training-step throughput benchmark (fwd + bwd + adamw + mixup).

Mirrors the reference's hot training loop (engine.py:60-195 of
microsoft/vision-longformer) as ONE jitted step, then times N chained steps
inside a single jit (TrainState is the natural data dependency between
iterations) with the two-point N_small/N_large difference to cancel the
axon-tunnel RTT (see bench.py docstring).

Usage:
  python benchmarks/train_bench.py [--batch 64] [--img 224]
      [--arch vil_small] [--no-pallas] [--no-mixup] [--random-shift]

Run ONE TPU process at a time (see docs/BENCHMARKS.md measurement rule).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--arch", default="vil_small")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-mixup", action="store_true")
    ap.add_argument("--random-shift", action="store_true",
                    help="sample a neighbor-block VIL mode per step (MODE>0)")
    ap.add_argument("--fused-ln", action="store_true",
                    help="fused Pallas LayerNorm in the block pre-norms")
    ap.add_argument("--iters", type=int, nargs=2, default=(3, 12),
                    metavar=("A", "B"), help="two-point iteration counts")
    ap.add_argument("--pair", choices=["auto", "on", "off"], default="auto",
                    help="force head-pair GEMM merging in the backward kernels")
    ap.add_argument("--flat-opt", action="store_true",
                    help="flat-grouped adamw update (measured dead end)")
    ap.add_argument("--stacked-opt", action="store_true",
                    help="stack same-shape small leaves for the adamw "
                         "update (bitcast-free sibling of --flat-opt)")
    ap.add_argument("--stacked-thr", type=int, default=65536,
                    help="element-count threshold for --stacked-opt")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a device trace of ia chained steps and "
                         "print the per-op anatomy (tools/xplane.py)")
    ap.add_argument("--rpe", action="store_true",
                    help="relative position encoding (a0 on every stage — "
                         "rpe = not ape, arch.py:40)")
    ap.add_argument("--data-backend", choices=["none", "thread", "grain"],
                    default="none",
                    help="feed the train step from a REAL input pipeline "
                         "(data_bench's synthetic-JPEG ZIP dataset) instead "
                         "of a fixed on-device batch — end-to-end "
                         "loader→host→device→step throughput")
    ap.add_argument("--data-workers", type=int, default=8,
                    help="loader workers for --data-backend")
    ap.add_argument("--data-steps", type=int, default=40,
                    help="measured steps for --data-backend (plus warmup)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sitecustomize axon "
                         "plugin ignores JAX_PLATFORMS — this is the only "
                         "way to keep a local smoke off the TPU tunnel)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.pair != "auto":
        from vil_tpu.ops.pallas import vil_backward

        vil_backward.PAIR_HEADS = args.pair == "on"

    from vil_tpu.data.mixup import make_mixup_fn
    from vil_tpu.models import ARCH_ZOO, MsViT
    from vil_tpu.train.engine import create_train_state, make_train_step
    from vil_tpu.train.loss import soft_target_cross_entropy, cross_entropy

    on_tpu = jax.default_backend() == "tpu"
    arch = ARCH_ZOO[args.arch]
    if args.rpe:
        import re

        arch = "_".join(
            re.sub(r"a\d+", "a0", s) if ",a" in s else s + ",a0"
            for s in arch.split("_")
        )
    model = MsViT(
        arch=arch,
        img_size=args.img,
        num_classes=1000,
        attn_type="longformerhand",
        sharew=True,
        norm_embed=True,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu and not args.no_pallas,
        fused_ln=args.fused_ln,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.img, args.img, 3), jnp.float32
    )
    tx = optax.adamw(1e-4, weight_decay=0.05)
    if args.flat_opt:
        # measured dead end at 224² b64 (see TPU.FLAT_OPT in config):
        # collapses the 4.4 ms of per-leaf update fusions to 0.6 but pays
        # ~3.9 ms at the ravel boundary — kept for re-measurement
        from vil_tpu.train.optim import flat_wrap

        params_shape = jax.eval_shape(
            model.init, {"params": jax.random.PRNGKey(0)}, x
        )["params"]
        tx = flat_wrap(tx, params_shape)
    elif args.stacked_opt:
        from vil_tpu.train.optim import stacked_wrap

        params_shape = jax.eval_shape(
            model.init, {"params": jax.random.PRNGKey(0)}, x
        )["params"]
        tx = stacked_wrap(tx, params_shape, threshold=args.stacked_thr)
    targets = jax.random.randint(jax.random.PRNGKey(2), (args.batch,), 0, 1000)
    state = jax.jit(lambda: create_train_state(
        model, tx, jax.random.PRNGKey(0), x))()

    mixup_fn = None if args.no_mixup else make_mixup_fn(num_classes=1000)
    criterion = cross_entropy if args.no_mixup else soft_target_cross_entropy
    train_step = make_train_step(
        model, criterion, tx,
        random_shift=args.random_shift, mixup_fn=mixup_fn,
    )
    rng = jax.random.PRNGKey(3)

    if args.data_backend != "none":
        _run_data_fed(args, model, state, train_step, rng)
        return

    @jax.jit
    def run(state, iters):
        def body(i, carry):
            st, _ = carry
            st, metrics = train_step(st, x, targets, rng)
            return st, metrics["loss"].astype(jnp.float32)

        _, loss = jax.lax.fori_loop(
            0, iters, body, (state, jnp.float32(0.0)))
        return loss

    def timed(iters) -> float:
        t0 = time.time()
        float(run(state, jnp.int32(iters)))
        return time.time() - t0

    ia, ib = args.iters
    timed(ia)  # compile + warmup

    if args.profile:
        # device-clocked per-op anatomy (tools/xplane.py reads the capture's
        # xplane.pb — the trace.json drops device planes through the tunnel)
        import os
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools"))
        import xplane

        with jax.profiler.trace(args.profile):
            timed(ia)
        import glob

        pb = sorted(glob.glob(
            os.path.join(args.profile, "plugins/profile/*/*.xplane.pb")))[-1]
        print(f"\nper-op device anatomy ({ia} chained steps):")
        tot = 0.0
        for kind, cnt, ms in xplane.summarize(pb, topk=40):
            print(f"  {ms / ia:9.3f} ms/step  {cnt / ia:6.1f}×  {kind}")
            tot += ms
        print(f"  {tot / ia:9.3f} ms/step TOTAL device")

    best = float("inf")
    for _ in range(3):
        ta, tb = timed(ia), timed(ib)
        per = (tb - ta) / (ib - ia)
        if 0 < per < best:
            best = per
    print(
        f"{args.arch} {args.img}px batch={args.batch} "
        f"pallas={not args.no_pallas} mixup={not args.no_mixup} "
        f"random_shift={args.random_shift} fused_ln={args.fused_ln}: "
        f"{best * 1e3:.2f} ms/step = {args.batch / best:.1f} img/s"
    )


def _run_data_fed(args, model, state, train_step, rng):
    """END-TO-END train loop through a REAL input pipeline: loader (thread
    or Grain process backend) → uint8 host batches (DEVICE_NORMALIZE — 4×
    smaller host→device transfers; the model folds (x/255−mean)/std into
    PatchEmbed) → async-dispatched jitted train steps. This is the
    demonstration the r4 verdict asked for: the Grain escape hatch feeding
    a real train step, at whatever rate this host's cores allow, with the
    scaling model printed alongside."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_bench import generate_zip

    from vil_tpu.config import get_default_cfg
    from vil_tpu.data.datasets import ZipData
    from vil_tpu.data.loader import DataLoader
    from vil_tpu.data.samplers import make_data_sampler
    from vil_tpu.data.transforms import build_transforms

    root = "/tmp/vil_data_bench"
    os.makedirs(root, exist_ok=True)
    zpath, mpath = generate_zip(root, 1024, 256)
    cfg = get_default_cfg()
    cfg.INPUT.IMAGE_SIZE = args.img
    cfg.INPUT.DEVICE_NORMALIZE = True  # uint8 to the device
    dataset = ZipData(zpath, mpath, build_transforms(cfg, is_train=True))
    sampler = make_data_sampler(
        len(dataset), shuffle=True, distributed=False, is_train=True,
        repeated_aug=False, num_replicas=1, rank=0, seed=0,
    )
    if args.data_backend == "grain":
        from vil_tpu.data.grain_loader import GrainDataLoader

        loader = GrainDataLoader(dataset, sampler, args.batch,
                                 drop_last=True,
                                 num_workers=args.data_workers)
    else:
        loader = DataLoader(dataset, sampler, args.batch, drop_last=True,
                            num_workers=args.data_workers)

    step_j = jax.jit(train_step)

    def batches():
        while True:  # loop epochs until the step budget is consumed
            for imgs, targets in loader:
                yield jnp.asarray(imgs), jnp.asarray(targets)

    it = batches()
    warmup = 3
    for _ in range(warmup):  # compile + pipeline spin-up
        imgs, targets = next(it)
        state, metrics = step_j(state, imgs, targets, rng)
    float(metrics["loss"])  # block: steady state begins

    n = 0
    t0 = time.time()
    for _ in range(args.data_steps):
        imgs, targets = next(it)  # host pipeline (overlaps device work)
        state, metrics = step_j(state, imgs, targets, rng)
        n += imgs.shape[0]
    final_loss = float(metrics["loss"])  # block on the last step
    dt = time.time() - t0
    cores = os.cpu_count() or 1
    rate = n / dt
    print(
        f"END-TO-END {args.data_backend} pipeline → train step: "
        f"{args.arch} {args.img}px batch={args.batch} "
        f"workers={args.data_workers} ({cores} host cores): "
        f"{rate:.1f} img/s over {args.data_steps} steps "
        f"(loss {final_loss:.3f}); "
        f"per-core {rate / cores:.1f} img/s/core — a production host needs "
        f"~ceil(chip_rate / per_core_rate) cores to saturate the chip"
    )


if __name__ == "__main__":
    main()
