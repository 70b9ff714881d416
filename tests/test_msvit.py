"""MsViT model tests: shapes, all attention types, RPE, param-count parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu.models import ARCH_ZOO, MsViT, build_model
from vil_tpu.config import get_default_cfg

TINY_ARCH = (
    "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2_l3,h2,d32,n1,s0,g0,p2,f2"
)


def _n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))


@pytest.mark.parametrize(
    "attn_type", ["longformerhand", "full", "linformer", "srformer", "performer"]
)
def test_forward_all_attention_types(attn_type):
    model = MsViT(
        arch=TINY_ARCH, img_size=32, num_classes=10, attn_type=attn_type,
        sharew=True, drop_path_rate=0.1,
    )
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
    # train mode: dropout/droppath rngs
    out_t = model.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out_t.shape == (2, 10)


def test_longformer_cuda_aliases_pallas_path():
    """The reference's ATTN_TYPE 'longformer_cuda' (its TVM kernel selector,
    src/config/defaults.py:144-145) must run, and must be numerically
    identical to 'longformerhand' — it is the same Pallas-backed path."""
    x = jnp.ones((2, 32, 32, 3))
    outs = []
    for attn_type in ("longformerhand", "longformer_cuda"):
        model = MsViT(arch=TINY_ARCH, img_size=32, num_classes=10,
                      attn_type=attn_type, sharew=True)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        outs.append(model.apply(variables, x))
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_rpe_variant():
    arch = TINY_ARCH.replace("f2", "f2,a0")  # rpe = not ape
    model = MsViT(arch=arch, img_size=32, num_classes=10, attn_type="longformerhand")
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k.key) for k in path) for path, _ in flat]
    assert any("local_relative_position_bias_table" in n for n in names)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)


def test_vil_mode_variants():
    model = MsViT(arch=TINY_ARCH, img_size=32, num_classes=10,
                  attn_type="longformerhand")
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out0 = model.apply(variables, x, mode=0)
    outm1 = model.apply(variables, x, mode=-1)
    out3 = model.apply(variables, x, mode=3)
    assert out0.shape == outm1.shape == out3.shape == (2, 10)
    # traced mode equals static mode
    out3t = jax.jit(lambda v, x, m: model.apply(v, x, mode=m))(
        variables, x, jnp.int32(3)
    )
    np.testing.assert_allclose(np.asarray(out3t), np.asarray(out3), atol=2e-5)


def test_per_layer_mode_vector():
    """A traced mode VECTOR gives each attention layer its own shift mode
    (reference per-forward sampling, longformer2d.py:116-121): a constant
    vector must equal the scalar mode, and mixed per-layer modes must differ
    from every shared-mode result."""
    model = MsViT(arch=TINY_ARCH, img_size=32, num_classes=10,
                  attn_type="longformerhand")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    fwd = jax.jit(lambda v, x, m: model.apply(v, x, mode=m))
    out3 = model.apply(variables, x, mode=3)
    out3v = fwd(variables, x, jnp.full((model.depth,), 3, jnp.int32))
    np.testing.assert_allclose(np.asarray(out3v), np.asarray(out3), atol=2e-5)
    modes = np.asarray([1 + i % 8 for i in range(model.depth)], np.int32)
    out_mixed = np.asarray(fwd(variables, x, jnp.asarray(modes)))
    assert np.all(np.isfinite(out_mixed))
    for m in sorted(set(modes.tolist())):
        shared = np.asarray(fwd(variables, x, jnp.full((model.depth,), m,
                                                       jnp.int32)))
        assert not np.allclose(out_mixed, shared, atol=1e-6)


def test_only_global():
    model = MsViT(arch=TINY_ARCH.replace("g0", "g2"), img_size=32, num_classes=10,
                  attn_type="longformerhand", only_glo=True, avg_pool=True)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    assert model.apply(variables, x).shape == (2, 10)


def test_grad_flows():
    model = MsViT(arch=TINY_ARCH, img_size=32, num_classes=10,
                  attn_type="longformerhand")
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    def loss_fn(params):
        out = model.apply({"params": params}, x)
        return jnp.sum(out**2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])  # jit: op-by-op
    # CPU execution of this backward graph takes minutes
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # patch-embed conv grad must be nonzero (end-to-end connectivity)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


@pytest.mark.parametrize(
    "name,expected_m",
    [("vil_tiny", 6.7), ("vil_small", 24.6)],
)
def test_param_count_parity(name, expected_m):
    """Match the reference's published parameter counts (README.md:77-78)."""
    model = MsViT(
        arch=ARCH_ZOO[name], img_size=224, num_classes=1000,
        attn_type="longformerhand", sharew=True, norm_embed=True,
    )
    x = jnp.ones((1, 224, 224, 3))
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert abs(n / 1e6 - expected_m) < 0.15, f"{name}: {n/1e6:.2f}M vs {expected_m}M"


def test_build_model_from_cfg():
    cfg = get_default_cfg()
    cfg.merge_from_list(
        ["MODEL.VIT.MSVIT.ARCH", TINY_ARCH, "INPUT.IMAGE_SIZE", "32",
         "DATA.NUM_CLASSES", "10", "TPU.COMPUTE_DTYPE", "float32"]
    )
    model = build_model(cfg)
    assert model.num_classes == 10
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    assert model.apply(variables, x).shape == (1, 10)


def test_remat_matches_baseline():
    """remat='full' must be numerically identical, forward and grad."""
    x = jnp.ones((2, 32, 32, 3))
    base = MsViT(arch=TINY_ARCH, img_size=32, num_classes=10,
                 attn_type="longformerhand")
    variables = base.init({"params": jax.random.PRNGKey(0)}, x)
    rematted = MsViT(arch=TINY_ARCH, img_size=32, num_classes=10,
                     attn_type="longformerhand", remat="full")
    out_b = base.apply(variables, x)
    out_r = rematted.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_b), atol=1e-6)

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    gb = jax.grad(lambda p: loss(base, p))(variables["params"])
    gr = jax.grad(lambda p: loss(rematted, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sticky_full_attention_after_s0_stage():
    """Reference semantics: the shared attn_args dict makes s=0 sticky —
    every stage after the first s=0 stage is full attention even with s=1
    (msvit.py:460-461)."""
    arch = "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s0,g1,p2,f2_l3,h2,d32,n1,s1,g0,p2,f2"
    model = MsViT(arch=arch, img_size=32, num_classes=10,
                  attn_type="longformerhand", sharew=True)
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    p = variables["params"]
    # stage1 sparse -> separate query/kv; stages 2 AND 3 full -> fused qkv
    assert "query" in p["stage1_block0_attn"]["attn"]
    assert "qkv" in p["stage2_block0_attn"]["attn"]
    assert "qkv" in p["stage3_block0_attn"]["attn"], (
        "stage 3 must be full attention (sticky s=0)"
    )
    from vil_tpu.ops.flops import model_macs

    r = model_macs(arch, 32, "longformerhand", num_classes=10)
    assert r["params"] > 0  # flops module agrees structurally (no crash)


def test_gelu_flavor_follows_compute_dtype():
    """bf16 compute auto-selects tanh-approx GELU (fuses on TPU; error below
    bf16 rounding); f32 keeps exact erf for torch parity."""
    from vil_tpu.models.layers import Mlp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    for dtype, expect_approx in ((jnp.float32, False), (jnp.bfloat16, True)):
        auto = Mlp(hidden_features=32, dtype=dtype)
        v = auto.init({"params": jax.random.PRNGKey(1)}, x.astype(dtype), True)
        out_auto = auto.apply(v, x.astype(dtype), True)
        for approx in (False, True):
            forced = Mlp(hidden_features=32, dtype=dtype, gelu_approx=approx)
            out_forced = forced.apply(v, x.astype(dtype), True)
            same = bool(jnp.all(out_auto == out_forced))
            assert same == (approx == expect_approx), (dtype, approx)


def test_toeplitz_rpe_assembly_matches_gather():
    """The conv/Toeplitz RPE assembly (r5: identity-kernel extract-patches,
    whose VJP is a conv wgrad instead of the scatter-add that was 34% of
    the RPE-384 train step) must match the reference gather BITWISE on
    values and to f32 tolerance on table grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vil_tpu.models.attention import (
        _skew_local_bias,
        _toeplitz_local_bias,
    )
    from vil_tpu.ops import rpe as rpe_lib

    for wx, wy, H in [(4, 4, 3), (7, 5, 2), (14, 14, 6)]:
        nrel = (2 * wx - 1) * (2 * wy - 1)
        table = jax.random.normal(jax.random.PRNGKey(0), (nrel, H))
        idx = jnp.asarray(rpe_lib.full_rpe_index(wx, wy))

        def gather(t):
            return t[idx.reshape(-1)].reshape(
                wx * wy, wx * wy, H
            ).transpose(2, 0, 1)

        ref = gather(table)
        for fn in (_skew_local_bias, _toeplitz_local_bias):
            got = fn(wx, wy, H, table)
            assert float(jnp.max(jnp.abs(got - ref))) == 0.0, fn

            g = jax.random.normal(jax.random.PRNGKey(2), ref.shape)
            gc = jax.grad(lambda t: jnp.sum(fn(wx, wy, H, t) * g))(table)
            gg = jax.grad(lambda t: jnp.sum(gather(t) * g))(table)
            np.testing.assert_allclose(
                np.asarray(gc), np.asarray(gg), rtol=1e-6, atol=1e-5
            )


def test_rpe_cache_inference():
    """precompute_rpe_cache (r5 serving feature): bitwise-equal logits, no
    cache created at init (a cache created there would silently serve the
    init-time bias to eval-mid-training), table grads intact without the
    cache, and rebuildable after parameter updates."""
    import jax
    import jax.numpy as jnp

    from vil_tpu.models import MsViT, precompute_rpe_cache

    arch = ("l1,h1,d32,n1,s1,g1,p4,f4,a0_l2,h2,d64,n1,s1,g1,p2,f4,a0"
            "_l3,h2,d64,n1,s0,g0,p2,f4,a0")
    m = MsViT(arch=arch, img_size=64, num_classes=10, norm_embed=True,
              sharew=True, dtype=jnp.float32, attn_type="longformerhand")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert "rpe_cache" not in vs  # init must NOT create the cache

    def table_grad(variables):
        def loss(p):
            v = dict(variables)
            v["params"] = p
            return jnp.sum(m.apply(v, x, deterministic=True) ** 2)

        g = jax.grad(loss)(variables["params"])
        t = g["stage3_block0_attn"]["attn"][
            "local_relative_position_bias_table"
        ]
        return float(jnp.abs(t).sum())

    assert table_grad(vs) > 0  # grads flow without a cache

    vs2 = precompute_rpe_cache(m, vs, x)
    assert "rpe_cache" in vs2
    base = m.apply(vs, x, deterministic=True)
    cached = m.apply(vs2, x, deterministic=True)
    assert float(jnp.max(jnp.abs(base - cached))) == 0.0

    # rebuilding after a parameter change must change the cache
    p2 = jax.tree_util.tree_map(lambda a: a + 0.01, vs["params"])
    vs3 = precompute_rpe_cache(m, {"params": p2}, x)
    old = jax.tree_util.tree_leaves(vs2["rpe_cache"])[0]
    new = jax.tree_util.tree_leaves(vs3["rpe_cache"])[0]
    assert float(jnp.max(jnp.abs(new - old))) > 0
