"""Fused attention-BLOCK kernel (ops/pallas/vil_block.py): QKV + attention
+ out-proj in one Pallas call — interpret-mode numerics vs the XLA oracle,
and model-level equivalence with the classic kernel path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu.ops import masks as masks_lib
from vil_tpu.ops.pallas import vil_backward, vil_block, vil_kernel


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(vil_block, "INTERPRET", True)
    monkeypatch.setattr(vil_kernel, "INTERPRET", True)
    monkeypatch.setattr(vil_backward, "INTERPRET", True)


def _setup(nglo=1, rpe=True, qkv_bias=True, H=3, C=48, mx=4, my=4, w=3, B=2):
    w2 = w * w
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    x = f(B, mx, my, w2, C)
    args = dict(
        wq=f(C, C), wk=f(C, C), wv=f(C, C), wo=f(C, C),
        bq=f(1, C) if qkv_bias else None,
        bk=f(1, C) if qkv_bias else None,
        bv=f(1, C) if qkv_bias else None,
        bo=f(1, C),
        kg=f(B, nglo, C) if nglo else None,
        vg=f(B, nglo, C) if nglo else None,
        bias=f(H, w2, nglo + 9 * w2) if rpe else None,
    )
    mask_bool = masks_lib.invalid_mask(mx, my, 0, 0, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    order = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "kg", "vg",
             "bias")
    return x, tuple(args[k] for k in order), mask_add, H


@pytest.mark.parametrize("nglo,rpe,qkv_bias", [
    (1, True, True), (1, False, True), (0, True, False),
])
def test_block_forward_matches_oracle(nglo, rpe, qkv_bias):
    x, rest, mask_add, H = _setup(nglo=nglo, rpe=rpe, qkv_bias=qkv_bias)
    fused = vil_block.make_fused_vil_block(mask_add, H)
    y_p, k_p, v_p = fused(x, *rest)
    y_r, k_r, v_r = vil_block._xla_block_reference(x, *rest, mask_add, H)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), atol=2e-5)


@pytest.mark.parametrize("nglo,rpe,qkv_bias", [
    (1, True, True), (0, False, True),
])
def test_block_grads_match_oracle(nglo, rpe, qkv_bias):
    x, rest, mask_add, H = _setup(nglo=nglo, rpe=rpe, qkv_bias=qkv_bias)
    fused = vil_block.make_fused_vil_block(mask_add, H)
    argnums = tuple(
        i for i, a in enumerate((x,) + rest) if a is not None
    )

    def loss(fn):
        def L(*a):
            y, k, v = fn(*a)
            # all three outputs participate (the shared-weight global branch
            # consumes k/v)
            return jnp.sum(jnp.tanh(y)) + jnp.sum(k * 0.1) + jnp.sum(v * 0.05)
        return L

    g_p = jax.grad(loss(fused), argnums=argnums)(x, *rest)
    g_r = jax.grad(
        loss(lambda *a: vil_block._xla_block_reference(*a, mask_add, H)),
        argnums=argnums,
    )(x, *rest)
    for i, (a, b) in enumerate(zip(g_p, g_r)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5,
            err_msg=f"argnum {argnums[i]}",
        )


def test_model_level_block_on_off(monkeypatch):
    """Full MsViT train step: fused-block path ≡ classic-kernel path."""
    import optax

    from vil_tpu.models import MsViT
    from vil_tpu.models import attention as attn_mod
    from vil_tpu.ops.pallas import full_attention
    from vil_tpu.train import engine
    from vil_tpu.train.loss import cross_entropy

    monkeypatch.setattr(full_attention, "INTERPRET", True)
    arch = (
        "l1,h2,d32,n1,s1,g1,p4,f4_l2,h2,d64,n1,s1,g1,p2,f4"
        "_l3,h2,d64,n1,s0,g0,p2,f4"
    )
    model = MsViT(arch=arch, img_size=64, num_classes=10,
                  attn_type="longformerhand", sharew=True, use_pallas=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    monkeypatch.setattr(attn_mod, "FUSED_BLOCK", False)
    out_off = model.apply(v, x)
    monkeypatch.setattr(attn_mod, "FUSED_BLOCK", True)
    out_on = model.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=1e-5
    )

    tx = optax.adamw(1e-3)
    state = engine.create_train_state(model, tx, jax.random.PRNGKey(0), x)
    y = jnp.asarray([1, 2])
    step = engine.make_train_step(model, cross_entropy, tx)
    monkeypatch.setattr(attn_mod, "FUSED_BLOCK", False)
    s_off, m_off = jax.jit(step)(state, x, y, jax.random.PRNGKey(7))
    monkeypatch.setattr(attn_mod, "FUSED_BLOCK", True)
    s_on, m_on = jax.jit(step)(state, x, y, jax.random.PRNGKey(7))
    assert abs(float(m_on["loss"]) - float(m_off["loss"])) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(s_on.params),
                    jax.tree_util.tree_leaves(s_off.params)):
        if a.size:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )
