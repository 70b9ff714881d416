"""Pallas two-pass backward vs jax.vjp of the XLA reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu.ops import masks as masks_lib
from vil_tpu.ops.pallas import vil_backward, vil_kernel


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(vil_backward, "INTERPRET", True)
    monkeypatch.setattr(vil_kernel, "INTERPRET", True)


@pytest.mark.parametrize("variant", ["whole_image", "two_pass", "tiled",
                                     "loop"])
@pytest.mark.parametrize(
    "nglo,with_bias,H,mx,my",
    [(1, True, 2, 3, 3), (0, False, 1, 3, 4), (2, True, 2, 4, 3),
     (1, True, 3, 3, 3)],  # H=3: head pair + trailing singleton group
)
def test_backward_matches_xla_vjp(monkeypatch, variant, nglo, with_bias, H, mx, my):
    # force the fused whole-image variant or the two-pass fallback
    monkeypatch.setattr(
        vil_backward,
        "WHOLE_IMAGE_VMEM_BYTES",
        2**62 if variant == "whole_image" else 0,
    )
    if variant == "tiled":
        # super-row tiles: multi-row tiles when mx is even, T=1 otherwise
        monkeypatch.setattr(
            vil_backward, "FORCE_TILE_T", 2 if mx % 2 == 0 else 1
        )
    if variant == "loop":
        # loop-rolled whole-image variant (big-grid tier)
        monkeypatch.setattr(vil_backward, "FORCE_BWD_LOOP", True)
    B, w, M = 2, 3, 8
    C = H * M
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 2, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    q = jax.random.normal(ks[0], (B, mx, my, w2, C))
    k = jax.random.normal(ks[1], (B, mx, my, w2, C))
    v = jax.random.normal(ks[2], (B, mx, my, w2, C))
    kg = jax.random.normal(ks[3], (B, nglo, C)) if nglo else None
    vg = jax.random.normal(ks[4], (B, nglo, C)) if nglo else None
    bias = (
        jax.random.normal(ks[5], (H, w2, nglo + 9 * w2)) * 0.3 if with_bias else None
    )
    g = jax.random.normal(ks[6], (B, mx, my, w2, C))

    dq, dk, dv, dkg, dvg, dbias = vil_backward.vil_attention_backward(
        q, k, v, kg, vg, bias, g, mask_add, H, interpret=True
    )

    diff_args = tuple(a for a in (q, k, v, kg, vg, bias) if a is not None)

    def wrapped(*args):
        it = iter(args)
        full = [next(it) if a is not None else None
                for a in (q, k, v, kg, vg, bias)]
        return vil_kernel._xla_reference_mh(*full, mask_add, H)

    _, vjp = jax.vjp(wrapped, *diff_args)
    ref_grads = iter(vjp(g))
    ref = {
        name: (next(ref_grads) if a is not None else None)
        for name, a in zip(
            ("dq", "dk", "dv", "dkg", "dvg", "dbias"), (q, k, v, kg, vg, bias)
        )
    }
    for name, ours in (("dq", dq), ("dk", dk), ("dv", dv), ("dkg", dkg),
                       ("dvg", dvg), ("dbias", dbias)):
        theirs = ref[name]
        if theirs is None:
            assert ours is None or name in ("dkg", "dvg", "dbias")
            continue
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), atol=2e-4, rtol=2e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("variant", ["loop", "tiled"])
def test_custom_vjp_lse_path(monkeypatch, variant):
    """Full custom-vjp route with the forward-stashed LSE feeding the
    loop-rolled / tiled backward (the big-grid tiers the 384² training
    path uses)."""
    if variant == "loop":
        monkeypatch.setattr(vil_backward, "FORCE_BWD_LOOP", True)
    else:
        monkeypatch.setattr(vil_backward, "FORCE_TILE_T", 2)
    B, mx, my, w, H, M, nglo = 2, 4, 3, 3, 3, 8, 1
    w2, C = w * w, 3 * 8
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 1, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    q, k, v = (jax.random.normal(ks[i], (B, mx, my, w2, C)) for i in range(3))
    kg, vg = (jax.random.normal(ks[3 + i], (B, nglo, C)) for i in range(2))
    bias = jax.random.normal(ks[5], (H, w2, nglo + 9 * w2)) * 0.3
    fused = vil_kernel.make_fused_vil_attention_mh(mask_add, H)
    loss_f = lambda *a: jnp.sum(fused(*a) ** 2)
    loss_x = lambda *a: jnp.sum(
        vil_kernel._xla_reference_mh(*a, mask_add, H) ** 2
    )
    argn = (0, 1, 2, 3, 4, 5)
    gf = jax.grad(loss_f, argnums=argn)(q, k, v, kg, vg, bias)
    gx = jax.grad(loss_x, argnums=argn)(q, k, v, kg, vg, bias)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )
