#!/usr/bin/env python
"""Capture a jax.profiler trace of a model forward (and optionally a train
step) for TensorBoard's profile plugin (SURVEY §5.1 tracing equivalent).

    python tools/profile_model.py --model vil_small [--img-size 224]
        [--batch 128] [--train] [--out /tmp/vil_profile]
"""
from __future__ import annotations

import argparse
import os.path as op
import sys

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vil_small")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--train", action="store_true")
    p.add_argument("--random-shift", action="store_true",
                   help="profile the MODE>0 random-shift train step")
    p.add_argument("--out", default="/tmp/vil_profile")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vil_tpu.models import ARCH_ZOO, MsViT
    from vil_tpu.utils.profiling import device_memory_stats, trace

    on_tpu = jax.default_backend() == "tpu"
    model = MsViT(
        arch=ARCH_ZOO.get(args.model, args.model), img_size=args.img_size,
        num_classes=1000, attn_type="longformerhand", sharew=True,
        norm_embed=True, dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.img_size, args.img_size, 3)
    )
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)

    if args.train:
        import optax

        from vil_tpu.train import engine
        from vil_tpu.train.loss import cross_entropy

        tx = optax.adamw(1e-3)
        state = engine.create_train_state(model, tx, jax.random.PRNGKey(0), x)
        step = jax.jit(engine.make_train_step(
            model, cross_entropy, tx, random_shift=args.random_shift))
        y = jax.random.randint(jax.random.PRNGKey(2), (args.batch,), 0, 1000)
        step(state, x, y, jax.random.PRNGKey(3))  # compile outside trace
        with trace(args.out):
            _, m = step(state, x, y, jax.random.PRNGKey(3))
            float(m["loss"])
    else:
        fwd = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))
        fwd(variables, x)  # compile outside trace
        with trace(args.out):
            float(jnp.sum(fwd(variables, x)))

    print(f"trace written to {args.out}")
    stats = device_memory_stats()
    if stats:
        print(f"peak HBM: {stats.get('peak_bytes_in_use', 0) / 2**20:.0f} MB")


if __name__ == "__main__":
    main()
