"""Fused Pallas LayerNorm vs flax nn.LayerNorm (interpret mode): forward,
input/param grads, XLA fallback for non-tiling row counts, and model-level
equivalence with fused_ln enabled."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vil_tpu.ops.pallas import layer_norm as ln_mod


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ln_mod, "INTERPRET", True)


@pytest.mark.parametrize("shape", [(128, 96), (2, 8, 8, 49, 64), (7, 33)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layer_norm_matches_flax(shape, dtype):
    C = shape[-1]
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], shape, dtype)
    gamma = jax.random.normal(ks[1], (C,), jnp.float32) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    dy = jax.random.normal(ks[3], shape, dtype)

    ref_ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32)
    ref_vars = {"params": {"scale": gamma, "bias": beta}}

    def ref_fn(x_, g_, b_):
        return ref_ln.apply({"params": {"scale": g_, "bias": b_}}, x_)

    out = ln_mod.layer_norm(x, gamma, beta, 1e-6)
    out_ref = ref_fn(x, gamma, beta)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_ref, np.float32), atol=tol
    )

    def loss(fn):
        def f(x_, g_, b_):
            return jnp.sum(fn(x_, g_, b_).astype(jnp.float32) * dy.astype(jnp.float32))
        return f

    g_ours = jax.grad(loss(lambda *a: ln_mod.layer_norm(*a, 1e-6)),
                      argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(x, gamma, beta)
    names = ("dx", "dgamma", "dbeta")
    gtol = 1e-5 if dtype == jnp.float32 else 5e-2
    for name, a, b in zip(names, g_ours, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=gtol, rtol=1e-3, err_msg=name,
        )


def test_fused_ln_model_matches_baseline():
    from vil_tpu.models import MsViT

    arch = (
        "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2_"
        "l3,h2,d32,n1,s0,g0,p2,f2"
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    base = MsViT(arch=arch, img_size=32, num_classes=10,
                 attn_type="longformerhand")
    fused = MsViT(arch=arch, img_size=32, num_classes=10,
                  attn_type="longformerhand", fused_ln=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x)
    # identical param trees (FusedLayerNorm mirrors scale/bias)
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape,
            variables,
            fused.init({"params": jax.random.PRNGKey(0)}, x),
        )
    )
    out_b = base.apply(variables, x)
    out_f = fused.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_b), atol=2e-5, rtol=1e-5
    )
    gb = jax.grad(lambda v: jnp.sum(base.apply(v, x) ** 2))(variables)
    gf = jax.grad(lambda v: jnp.sum(fused.apply(v, x) ** 2))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        )
