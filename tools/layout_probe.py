#!/usr/bin/env python
"""Probe: does XLA elide a logical transpose into a layout relabel at the
Pallas custom-call boundary?

Scheme A (current): producer GEMM -> pallas_call on (B, mx, my, w2, C)
  with default layout pinned  => layout assignment inserts a relayout copy
  when the GEMM prefers batch-in-sublanes ({4,0,3,2,1}).
Scheme B (permuted): producer GEMM -> jnp.transpose to (mx, my, w2, B, C)
  -> pallas_call pinning default layout on the TRANSPOSED logical shape,
  which is byte-identical to the preferred layout of the producer
  => the transpose should become a bitcast, no copy.

Prints the compiled HLO op census (transpose/copy/fusion counts) and chained
two-point timings for both schemes.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vil_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

B, mx, my, w2, C = 64, 8, 8, 49, 96


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def consume_base(y):  # y: (B, mx, my, w2, C)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((None, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mx, my, w2, C), jnp.bfloat16),
    )(y)


def consume_perm(y):  # y: (mx, my, w2, B, C)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((mx, my, w2, None, C), lambda b: (0, 0, 0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((mx, my, w2, None, C), lambda b: (0, 0, 0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mx, my, w2, B, C), jnp.bfloat16),
    )(y)


def chain(fn, iters):
    """iters chained producer GEMM -> pallas -> consumer GEMM passes."""

    def run(x, w, w2_):
        def body(i, x):
            y = jnp.einsum("bxywc,cd->bxywd", x, w,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            z = fn(y)
            # consumer GEMM on the pallas output (the out-proj analogue)
            return jnp.einsum("bxywc,cd->bxywd", z, w2_,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

    return run


def scheme_a(y):
    return consume_base(y)


def scheme_b(y):
    yt = jnp.transpose(y, (1, 2, 3, 0, 4))
    z = consume_perm(yt)
    return jnp.transpose(z, (3, 0, 1, 2, 4))


def census(fn, iters, label):
    x = jnp.zeros((B, mx, my, w2, C), jnp.bfloat16)
    w = jnp.zeros((C, C), jnp.bfloat16)
    lowered = jax.jit(chain(fn, iters)).lower(x, w, w)
    compiled = lowered.compile()
    txt = compiled.as_text()
    n_transpose = txt.count(" transpose(")
    n_copy = txt.count(" copy(")
    # fusions that contain transpose/copy computations
    print(f"[{label}] HLO ops: transpose={n_transpose} copy={n_copy} "
          f"len={len(txt)}")
    for line in txt.splitlines():
        if ("transpose(" in line or " copy(" in line) and "fused" not in line:
            print("   ", line.strip()[:160])
    return compiled


def timed(compiled, iters):
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, mx, my, w2, C)), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (C, C)) * 0.02, jnp.bfloat16)
    t0 = time.time()
    float(compiled(x, w, w))
    return time.time() - t0


def main():
    print("backend:", jax.default_backend(), jax.devices())
    ia, ib = 4, 24
    for label, fn in (("A-base", scheme_a), ("B-perm", scheme_b)):
        ca = census(fn, ia, f"{label} i{ia}")
        cb = census(fn, ib, f"{label} i{ib}")
        timed(ca, ia); timed(cb, ib)  # warm
        best = float("inf")
        for _ in range(3):
            ta, tb = timed(ca, ia), timed(cb, ib)
            per = (tb - ta) / (ib - ia)
            best = min(best, per) if per > 0 else best
        print(f"[{label}] per-iteration: {best * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
