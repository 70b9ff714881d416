#!/usr/bin/env python
"""Compiled-on-TPU kernel numerics smoke test.

Round-trip evidence that the Pallas kernels lower correctly through Mosaic on
the REAL device (interpret-mode CPU tests can't catch lowering regressions):
runs the fused multi-head sliding-chunk attention forward AND its custom VJP
compiled on the default backend and compares against the pure-XLA reference
(`_xla_reference_mh`, the same oracle the CPU suite uses).

Run standalone (`python tools/tpu_kernel_smoke.py`) or via `bench.py`, which
executes it each round and reports `kernels_ok` in its JSON line.

Shapes mirror ViL-Small stage 2 (H=3, M=64, W=7, nglo=1) at a reduced grid.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _max_err(a, b) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def run_smoke(verbose: bool = True) -> dict:
    from vil_tpu.ops import masks as masks_lib
    from vil_tpu.ops.pallas import vil_backward, vil_kernel

    if jax.default_backend() != "tpu":
        # off-TPU the script still validates its own logic via interpret mode
        vil_kernel.INTERPRET = vil_backward.INTERPRET = True

    B, mx, my, w, H, M, nglo = 2, 4, 4, 7, 3, 64, 1
    w2 = w * w
    C = H * M
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 1, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)

    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    scale = 0.25
    q = jax.random.normal(ks[0], (B, mx, my, w2, C), jnp.float32) * scale
    k = jax.random.normal(ks[1], (B, mx, my, w2, C), jnp.float32) * scale
    v = jax.random.normal(ks[2], (B, mx, my, w2, C), jnp.float32) * scale
    kg = jax.random.normal(ks[3], (B, nglo, C), jnp.float32) * scale
    vg = jax.random.normal(ks[4], (B, nglo, C), jnp.float32) * scale
    bias = jax.random.normal(ks[5], (H, w2, nglo + 9 * w2), jnp.float32) * 0.5

    results = {"backend": jax.default_backend()}
    ok = True
    for name, dtype, tol_fwd, tol_grad in (
        ("f32", jnp.float32, 5e-4, 5e-3),
        ("bf16", jnp.bfloat16, 5e-2, 5e-1),
    ):
        args = tuple(a.astype(dtype) for a in (q, k, v, kg, vg))
        b_arg = bias  # RPE bias stays f32 in the model path
        fused = vil_kernel.make_fused_vil_attention_mh(mask_add, H)

        @jax.jit
        def fwd_pair(q, k, v, kg, vg, bias):
            return (
                fused(q, k, v, kg, vg, bias),
                vil_kernel._xla_reference_mh(
                    *(a.astype(jnp.float32) for a in (q, k, v, kg, vg)),
                    bias, mask_add, H,
                ),
            )

        out_p, out_x = fwd_pair(*args, b_arg)
        e_fwd = _max_err(out_p, out_x)

        @jax.jit
        def grads_pair(q, k, v, kg, vg, bias):
            gp = jax.grad(
                lambda *a: jnp.sum(fused(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3, 4, 5),
            )(q, k, v, kg, vg, bias)
            gx = jax.grad(
                lambda *a: jnp.sum(
                    vil_kernel._xla_reference_mh(*a, mask_add, H) ** 2
                ),
                argnums=(0, 1, 2, 3, 4, 5),
            )(*(a.astype(jnp.float32) for a in (q, k, v, kg, vg)), bias)
            return gp, gx

        gp, gx = grads_pair(*args, b_arg)
        e_grad = max(_max_err(a, b) for a, b in zip(gp, gx))
        passed = e_fwd <= tol_fwd and e_grad <= tol_grad
        ok &= passed
        results[name] = {
            "fwd_max_err": round(e_fwd, 6),
            "grad_max_err": round(e_grad, 6),
            "pass": passed,
        }
        if verbose:
            print(
                f"kernel smoke [{name}] fwd err {e_fwd:.2e} "
                f"grad err {e_grad:.2e} -> {'PASS' if passed else 'FAIL'}",
                file=sys.stderr,
            )
    # fused attention-BLOCK path (ops/pallas/vil_block.py): QKV + attention
    # + out-proj in one Pallas call — fwd + VJP compiled vs the
    # differentiable XLA block reference, bf16 (the hot-path dtype).
    from vil_tpu.ops.pallas import vil_block

    if jax.default_backend() != "tpu":
        vil_block.INTERPRET = True
    rngb = np.random.default_rng(7)
    fb = lambda *s: jnp.asarray(rngb.standard_normal(s) * 0.2, jnp.float32)
    xb = fb(B, mx, my, w2, C).astype(jnp.bfloat16)
    w_args = tuple(
        fb(C, C).astype(jnp.bfloat16) if n.startswith("w") else fb(1, C)
        for n in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")
    )
    kg_b = fb(B, nglo, C).astype(jnp.bfloat16)
    vg_b = fb(B, nglo, C).astype(jnp.bfloat16)
    bias_b = fb(H, w2, nglo + 9 * w2)
    fused_b = vil_block.make_fused_vil_block(mask_add, H)

    def _loss_b(fn):
        def L(*a):
            y, kk, vv = fn(*a)
            return (
                jnp.sum(jnp.tanh(y.astype(jnp.float32)))
                + jnp.sum(kk.astype(jnp.float32) * 0.1)
                + jnp.sum(vv.astype(jnp.float32) * 0.05)
            )
        return L

    argn = tuple(range(12))

    @jax.jit
    def block_pair(x, *rest):
        ofb, gfb = jax.value_and_grad(_loss_b(fused_b), argnums=argn)(
            x, *rest
        )
        oxb, gxb = jax.value_and_grad(
            _loss_b(
                lambda *a: vil_block._xla_block_reference(*a, mask_add, H)
            ),
            argnums=argn,
        )(x, *rest)
        return ofb, oxb, gfb, gxb

    ofb, oxb, gfb, gxb = block_pair(xb, *w_args, kg_b, vg_b, bias_b)
    e_fwd_b = float(jnp.abs(ofb - oxb)) / (abs(float(oxb)) + 1e-6)
    e_grad_b = 0.0
    for a, b in zip(gfb, gxb):
        sc_ = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
        e_grad_b = max(e_grad_b, _max_err(a, b) / sc_)
    passed_b = e_fwd_b <= 5e-2 and e_grad_b <= 5e-2
    ok &= passed_b
    results["block"] = {
        "fwd_loss_rel_err": round(e_fwd_b, 6),
        "grad_max_rel_err": round(e_grad_b, 6),
        "pass": passed_b,
    }
    if verbose:
        print(
            f"kernel smoke [block] loss err {e_fwd_b:.2e} "
            f"grad err {e_grad_b:.2e} -> {'PASS' if passed_b else 'FAIL'}",
            file=sys.stderr,
        )
    # sampled-mode (MODE>0, random-shift training) path: the fused mode
    # kernels behind VilAttention vs the pure-XLA tier, compiled, fwd + VJP,
    # traced mode index (the shape the training step uses). H=3 covers the
    # head-pair merged GEMMs plus a singleton group.
    from vil_tpu.models.attention import VilAttention
    from vil_tpu.ops.pallas import vil_mode_kernel

    if jax.default_backend() != "tpu":
        vil_mode_kernel.INTERPRET = True
    H2, C2, wm, nx, ny, nglo2 = 3, 48, 3, 5, 5, 1
    mk = lambda up: VilAttention(
        dim=C2, num_heads=H2, w=wm, nglo=nglo2, rpe=True, exact=0,
        use_pallas=up,
    )
    xm = jax.random.normal(
        jax.random.PRNGKey(21), (2, nglo2 + nx * ny, C2), jnp.float32
    )
    params = mk(False).init(jax.random.PRNGKey(22), xm, nx, ny, True, 0)
    mode = jnp.asarray(4)

    @jax.jit
    def mode_pair(p, xx):
        loss = lambda up: (
            lambda q: jnp.sum(mk(up).apply(p, q, nx, ny, True, mode) ** 2)
        )
        of, gf = jax.value_and_grad(loss(True))(xx)
        ox, gx = jax.value_and_grad(loss(False))(xx)
        return of, ox, gf, gx

    of, ox, gf, gx = mode_pair(params, xm)
    e_fwd_m = float(jnp.abs(of - ox))
    e_grad_m = _max_err(gf, gx)
    passed_m = e_fwd_m <= 5e-2 and e_grad_m <= 5e-3
    ok &= passed_m
    results["mode"] = {
        "fwd_loss_err": round(e_fwd_m, 6),
        "grad_max_err": round(e_grad_m, 6),
        "pass": passed_m,
    }
    if verbose:
        print(
            f"kernel smoke [mode] loss err {e_fwd_m:.2e} "
            f"grad err {e_grad_m:.2e} -> {'PASS' if passed_m else 'FAIL'}",
            file=sys.stderr,
        )
    # halo-input kernels (spatial/sequence parallelism, parallel/spatial.py):
    # fwd + VJP of make_fused_vil_attention_halo compiled on the real
    # backend. With CYCLIC halo rows the halo path must equal the unsharded
    # cyclic oracle — one chip exercises the exact kernels an mx-sharded
    # shard_map runs per shard (traced SMEM row-class, no-wrap row loop,
    # halo-row dK/dV outputs).
    wh, mxh, myh, Hh, Mh = 3, 4, 4, 2, 32
    w2h = wh * wh
    Ch = Hh * Mh
    mask_h = vil_kernel.mask_to_additive(
        masks_lib.invalid_mask(mxh, myh, 0, 0, wh, 0, 0), mxh, myh, w2h, nglo
    )
    classes_host, class_of = vil_kernel.tail_mask_classes(mask_h, nglo)
    row_class = jnp.asarray(class_of, jnp.int32)
    kh = jax.random.split(jax.random.PRNGKey(31), 6)
    fh = lambda i, shp: jax.random.normal(kh[i], shp, jnp.float32) * scale
    qh, kkh, vh = (fh(i, (B, mxh, myh, w2h, Ch)) for i in range(3))
    kgh, vgh = fh(3, (B, nglo, Ch)), fh(4, (B, nglo, Ch))
    bias_h = fh(5, (Hh, w2h, nglo + 9 * w2h))
    fused_halo = vil_kernel.make_fused_vil_attention_halo(
        classes_host, nglo, Hh
    )

    def _ext(t):
        return jnp.concatenate([t[:, -1:], t, t[:, :1]], axis=1)

    @jax.jit
    def halo_pair(q, k, v, kg, vg, bias):
        loss_h = lambda q, k, v, kg, vg, bias: jnp.sum(
            fused_halo(q, _ext(k), _ext(v), kg, vg, bias, row_class) ** 2
        )
        loss_x = lambda q, k, v, kg, vg, bias: jnp.sum(
            vil_kernel._xla_reference_mh(q, k, v, kg, vg, bias, mask_h, Hh)
            ** 2
        )
        oh, gh = jax.value_and_grad(loss_h, argnums=(0, 1, 2, 3, 4, 5))(
            q, k, v, kg, vg, bias
        )
        ox, gx = jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3, 4, 5))(
            q, k, v, kg, vg, bias
        )
        return oh, ox, gh, gx

    oh, ox, gh, gx = halo_pair(qh, kkh, vh, kgh, vgh, bias_h)
    e_fwd_h = float(jnp.abs(oh - ox))
    e_grad_h = max(_max_err(a, b) for a, b in zip(gh, gx))
    passed_h = e_fwd_h <= 5e-2 and e_grad_h <= 5e-3
    ok &= passed_h
    results["halo"] = {
        "fwd_loss_err": round(e_fwd_h, 6),
        "grad_max_err": round(e_grad_h, 6),
        "pass": passed_h,
    }
    if verbose:
        print(
            f"kernel smoke [halo] loss err {e_fwd_h:.2e} "
            f"grad err {e_grad_h:.2e} -> {'PASS' if passed_h else 'FAIL'}",
            file=sys.stderr,
        )
    # dense full-attention kernels (ops/pallas/full_attention.py): fwd (LSE
    # stash) + fused Pallas BACKWARD (r3) compiled vs jax.vjp of the XLA
    # reference, bf16, with bias (exercises the in-kernel dbias accumulation
    # across the batch grid).
    from vil_tpu.ops.pallas import full_attention as fa_mod

    if jax.default_backend() != "tpu":
        fa_mod.INTERPRET = True
    Nf, Hf, Mf = 197, 6, 64
    Cf = Hf * Mf
    kf = jax.random.split(jax.random.PRNGKey(41), 5)
    qf, kkf, vf = (
        (jax.random.normal(kf[i], (B, Nf, Cf), jnp.float32) * scale).astype(
            jnp.bfloat16
        )
        for i in range(3)
    )
    bias_f = jax.random.normal(kf[3], (Hf, Nf, Nf), jnp.float32) * 0.3
    fused_fa = fa_mod.make_fused_full_attention(Hf)

    @jax.jit
    def fa_pair(q, k, v, bias):
        loss_f = lambda q, k, v, b: jnp.sum(
            fused_fa(q, k, v, b).astype(jnp.float32) ** 2
        )
        loss_x = lambda q, k, v, b: jnp.sum(
            fa_mod._xla_reference(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), b, Hf,
            ) ** 2
        )
        of, gf = jax.value_and_grad(loss_f, argnums=(0, 1, 2, 3))(q, k, v, bias)
        ox, gx = jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
        return of, ox, gf, gx

    of, ox, gf, gx = fa_pair(qf, kkf, vf, bias_f)
    e_fwd_f = float(jnp.abs(of - ox) / jnp.abs(ox))
    e_grad_f = max(_max_err(a, b) for a, b in zip(gf, gx))
    passed_f = e_fwd_f <= 5e-2 and e_grad_f <= 5e-1  # bf16 tolerances
    ok &= passed_f
    results["full_attn"] = {
        "fwd_loss_rel_err": round(e_fwd_f, 6),
        "grad_max_err": round(e_grad_f, 6),
        "pass": passed_f,
    }
    if verbose:
        print(
            f"kernel smoke [full_attn] loss rel err {e_fwd_f:.2e} "
            f"grad err {e_grad_f:.2e} -> {'PASS' if passed_f else 'FAIL'}",
            file=sys.stderr,
        )
    # q-TILED dense tier (the huge-N s=0 tier, r4; biased + fused backward
    # r5): compiled fwd AND backward parity vs the XLA reference at a
    # ragged N that exercises query padding + the resident-K/V row-constant
    # blocks + the streamed bias tiles + the per-batch dbias partials.
    # Inputs at the same tamed 0.25 scale as the other cases (unit-scale
    # bf16 inputs made score rounding dominate — the r4 smoke needed a
    # 5e-2 tolerance for what was purely input-magnitude noise).
    Bt, Nt, Ht, Mt = 2, 135, 4, 32
    Ct = Ht * Mt
    kst = jax.random.split(jax.random.PRNGKey(11), 5)
    qt, kt, vt, gt = (
        (jax.random.normal(kst[i], (Bt, Nt, Ct), jnp.float32) * scale).astype(
            jnp.bfloat16
        )
        for i in range(4)
    )
    bias_t = jax.random.normal(kst[4], (Ht, Nt, Nt), jnp.float32) * 0.3

    @jax.jit
    def fa_tiled_pair(q, k, v, g, bias):
        # fwd tile must be a multiple of 128 (the lse OUT tile rides the
        # lane axis); the bwd's transposed-lse layout allows sub-128 tiles
        ot, lse = fa_mod._pallas_forward_tiled(
            q, k, v, Ht, bias=bias, tile_q=128, with_lse=True
        )
        grads_t = fa_mod._pallas_backward_tiled(
            q, k, v, g, lse, Ht, bias=bias, tile_q=64
        )
        oxr, vjp = jax.vjp(
            lambda q, k, v, b: fa_mod._xla_reference(q, k, v, b, Ht),
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), bias,
        )
        return ot, oxr, grads_t, vjp(g.astype(jnp.float32))

    ot, oxr, grads_t, grads_x = fa_tiled_pair(qt, kt, vt, gt, bias_t)
    e_tiled = _max_err(ot, oxr)
    e_tiled_g = max(_max_err(a, b) for a, b in zip(grads_t, grads_x))
    passed_t = e_tiled <= 6e-3 and e_tiled_g <= 5e-2  # bf16-vs-f32 band
    ok &= passed_t
    results["full_attn_tiled"] = {
        "fwd_max_err": round(e_tiled, 6),
        "grad_max_err": round(e_tiled_g, 6),
        "pass": passed_t,
    }
    if verbose:
        print(
            f"kernel smoke [full_attn_tiled] fwd err {e_tiled:.2e} "
            f"grad err {e_tiled_g:.2e} -> {'PASS' if passed_t else 'FAIL'}",
            file=sys.stderr,
        )
    results["ok"] = ok
    return results


if __name__ == "__main__":
    from vil_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    res = run_smoke()
    print(json.dumps(res))
    sys.exit(0 if res["ok"] else 1)
