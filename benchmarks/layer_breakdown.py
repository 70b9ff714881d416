#!/usr/bin/env python
"""Per-component TPU timing breakdown for MsViT.

Times each model component in isolation with the chained-iteration harness
(see bench.py docstring: iterations chained through a true data dependency
inside one jit; two-point N_small/N_large difference cancels the axon-tunnel
RTT). Components:

  * each stage's AttnBlock (one block; multiplied by block count in report)
  * each stage's MlpBlock
  * each stage's PatchEmbed
  * the full model, for cross-checking the sum

Usage: python benchmarks/layer_breakdown.py [--batch 128] [--img 224]
       [--arch vil_small] [--no-pallas]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()


def chained(fn):
    """Build a jitted runner executing `fn` a TRACED number of times with a
    data chain (one compilation serves all iteration counts).

    fn: (x) -> array of ANY shape. The chain multiplies the input by
    (1 + eps*carry) so no iteration can be CSE'd or reordered.
    """

    @jax.jit
    def run(x, iters):
        def body(i, carry):
            x_i = x * (1 + 1e-24 * carry).astype(x.dtype)
            out = fn(x_i)
            return carry + jnp.sum(out).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def timed_fetch(run, x, iters) -> float:
    t0 = time.time()
    float(run(x, jnp.int32(iters)))
    return time.time() - t0


def two_point_ms(fn, x, iters_a=4, iters_b=20, reps=3) -> float:
    """Best-of-reps per-iteration time in milliseconds."""
    run = chained(fn)
    timed_fetch(run, x, iters_a)  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        ta = timed_fetch(run, x, iters_a)
        tb = timed_fetch(run, x, iters_b)
        per = (tb - ta) / (iters_b - iters_a)
        if 0 < per < best:
            best = per
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--arch", default="vil_small")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="time fwd+bwd (grad of sum) instead of inference")
    args = ap.parse_args()

    from vil_tpu.models import ARCH_ZOO, MsViT
    from vil_tpu.models.msvit import AttnBlock, MlpBlock
    from vil_tpu.models.layers import PatchEmbed

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    use_pallas = on_tpu and not args.no_pallas
    arch = ARCH_ZOO.get(args.arch, args.arch)

    model = MsViT(
        arch=arch, img_size=args.img, num_classes=1000,
        attn_type="longformerhand", sharew=True, norm_embed=True,
        dtype=dtype, use_pallas=use_pallas,
    )
    cfgs = model.layer_cfgs
    grids = model.grid_sizes()
    B = args.batch
    key = jax.random.PRNGKey(0)

    rows = []
    total_est = 0.0
    sticky_full = False
    in_ch = 3
    img = args.img
    for sid, (c, (nx, ny)) in enumerate(zip(cfgs, grids)):
        sticky_full = sticky_full or not c.is_sparse_attn
        attn_type = "full" if sticky_full else "longformerhand"
        N = nx * ny + c.nglo

        # ---- patch embed ----
        pe = PatchEmbed(
            patch_size=c.patch_size, nx=nx, ny=ny, embed_dim=c.dim,
            nglo=c.nglo, norm_embed=True, ape=bool(c.ape),
            ln_eps=1e-6, dtype=dtype,
        )
        x_img = jax.random.normal(
            key, (B, nx * c.patch_size, ny * c.patch_size, in_ch),
            jnp.float32 if sid == 0 else dtype,
        )
        vs = jax.jit(lambda k, x, pe=pe: pe.init(k, x, True))({"params": key}, x_img)
        f = lambda x, pe=pe, vs=vs: pe.apply(vs, x, True)
        ms = two_point_ms(f, x_img)
        rows.append((f"stage{sid+1} patch_embed", ms, 1))
        total_est += ms

        # ---- one attention block ----
        blk = AttnBlock(
            dim=c.dim, num_heads=c.num_heads, attn_type=attn_type,
            seq_len=N, nglo=c.nglo, w=c.num_feats, num_feats=c.num_feats,
            sharew=True, rpe=c.rpe, wx=nx, wy=ny, dtype=dtype,
            use_pallas=use_pallas,
        )
        x_tok = jax.random.normal(key, (B, N, c.dim), dtype)
        vs = jax.jit(
            lambda k, x, blk=blk, nx=nx, ny=ny: blk.init(k, x, nx, ny, True, 0)
        )({"params": key}, x_tok)
        if args.train:
            fwd = lambda x, blk=blk, vs=vs: blk.apply(vs, x, nx, ny, True, 0)
            f = lambda x, fwd=fwd: jax.grad(
                lambda y: jnp.sum(fwd(y)).astype(jnp.float32))(x)
        else:
            f = lambda x, blk=blk, vs=vs: blk.apply(vs, x, nx, ny, True, 0)
        ms = two_point_ms(f, x_tok)
        rows.append((f"stage{sid+1} attn_block ({attn_type}) ×{c.num_blocks}",
                     ms, c.num_blocks))
        total_est += ms * c.num_blocks

        # ---- one MLP block ----
        mlp = MlpBlock(dim=c.dim, dtype=dtype)
        vs = jax.jit(lambda k, x, mlp=mlp: mlp.init(k, x, True))({"params": key}, x_tok)
        if args.train:
            fwd = lambda x, mlp=mlp, vs=vs: mlp.apply(vs, x, True)
            f = lambda x, fwd=fwd: jax.grad(
                lambda y: jnp.sum(fwd(y)).astype(jnp.float32))(x)
        else:
            f = lambda x, mlp=mlp, vs=vs: mlp.apply(vs, x, True)
        ms = two_point_ms(f, x_tok)
        rows.append((f"stage{sid+1} mlp_block ×{c.num_blocks}", ms,
                     c.num_blocks))
        total_est += ms * c.num_blocks
        in_ch = c.dim
        img //= c.patch_size

    # ---- full model ----
    x = jax.random.normal(key, (B, args.img, args.img, 3), jnp.float32)
    vs = jax.jit(model.init)({"params": key}, x)
    if args.train:
        fwd = lambda x: model.apply(vs, x, deterministic=True)
        f = lambda x: jax.grad(lambda y: jnp.sum(fwd(y)).astype(jnp.float32))(x)
    else:
        f = lambda x: model.apply(vs, x, deterministic=True)
    full_ms = two_point_ms(f, x)

    print(f"\n{'component':44s} {'ms/iter':>9s} {'×n total':>9s}")
    for name, ms, n in rows:
        print(f"{name:44s} {ms:9.2f} {ms * n:9.2f}")
    print(f"{'SUM of components':44s} {'':9s} {total_est:9.2f}")
    print(f"{'FULL MODEL':44s} {'':9s} {full_ms:9.2f}")
    print(f"(unaccounted: {full_ms - total_est:+.2f} ms — final norm/head/"
          f"inter-stage reshapes/fusion differences)")
    print(f"full-model throughput: {B / (full_ms / 1e3):.0f} img/s")


if __name__ == "__main__":
    main()
