"""Fused sampled-mode (MODE>0) Pallas path vs the pure-XLA tier.

The XLA tier is itself validated against a dense oracle / the reference
torch model elsewhere (test_sliding_chunk.py, test_torch_parity.py), so
agreement here certifies the fused kernels for the random-shift training
path, including the per-mode mask/RPE gathers and the XLA-side rolls."""
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu.models.attention import VilAttention
from vil_tpu.ops.pallas import vil_mode_kernel


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(vil_mode_kernel, "INTERPRET", True)


def _pair(nglo, rpe, H=2, C=16, w=3, nx=5, ny=5):
    mk = lambda use_pallas: VilAttention(
        dim=C, num_heads=H, w=w, nglo=nglo, rpe=rpe, exact=0,
        use_pallas=use_pallas,
    )
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, nglo + nx * ny, C))
    params = mk(False).init(
        jax.random.PRNGKey(1), x, nx, ny, True, 0
    )
    return mk(True), mk(False), params, x, nx, ny


@pytest.mark.parametrize("mode", [1, 4, 8, "traced"])
@pytest.mark.parametrize("nglo,rpe", [(1, True), (0, False), (2, True)])
def test_mode_fused_matches_xla_tier(mode, nglo, rpe):
    fused_m, xla_m, params, x, nx, ny = _pair(nglo, rpe)
    m = jnp.asarray(3) if mode == "traced" else mode
    out_f = fused_m.apply(params, x, nx, ny, True, m)
    out_x = xla_m.apply(params, x, nx, ny, True, m)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("mode", [2, "traced"])
def test_mode_fused_grads_match_xla_tier(mode):
    fused_m, xla_m, params, x, nx, ny = _pair(1, True)
    m = jnp.asarray(6) if mode == "traced" else mode

    def loss(mod):
        return lambda p, xx: jnp.sum(mod.apply(p, xx, nx, ny, True, m) ** 2)

    gf = jax.grad(loss(fused_m), argnums=(0, 1))(params, x)
    gx = jax.grad(loss(xla_m), argnums=(0, 1))(params, x)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_x), atol=3e-4, rtol=3e-4
    )


def test_mode_fused_grads_odd_heads():
    # H=3: a head pair + a trailing singleton group exercises the merged
    # block-diagonal GEMMs alongside a per-head one (vil_backward._head_groups)
    fused_m, xla_m, params, x, nx, ny = _pair(1, True, H=3, C=24)
    m = jnp.asarray(4)

    def loss(mod):
        return lambda p, xx: jnp.sum(mod.apply(p, xx, nx, ny, True, m) ** 2)

    gf = jax.grad(loss(fused_m), argnums=(0, 1))(params, x)
    gx = jax.grad(loss(xla_m), argnums=(0, 1))(params, x)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_x), atol=3e-4, rtol=3e-4
    )


def test_mode_fused_row_grid_variant(monkeypatch):
    # force the row-grid (per-chunk-row) fallback kernels: separate bias +
    # full mask operands instead of the whole-image comb tables
    monkeypatch.setattr(vil_mode_kernel, "WHOLE_IMAGE_VMEM_BYTES", 0)
    fused_m, xla_m, params, x, nx, ny = _pair(1, True)
    m = jnp.asarray(7)
    out_f = fused_m.apply(params, x, nx, ny, True, m)
    out_x = xla_m.apply(params, x, nx, ny, True, m)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=2e-4, rtol=2e-4
    )

    def loss(mod):
        return lambda p, xx: jnp.sum(mod.apply(p, xx, nx, ny, True, m) ** 2)

    gf = jax.grad(loss(fused_m), argnums=(0, 1))(params, x)
    gx = jax.grad(loss(xla_m), argnums=(0, 1))(params, x)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_x), atol=3e-4, rtol=3e-4
    )


def test_mode_bf16_scores_flag(monkeypatch):
    """BF16_SCORES on the sampled-mode kernels: grads with the flag ON stay
    consistent with the flag-OFF bf16 path (fwd rounding matches the bwd
    recompute), and the bf16 forward tracks the f32 XLA tier loosely."""
    from vil_tpu.ops.pallas import vil_kernel as vk

    fused_m, xla_m, params, x, nx, ny = _pair(1, True, H=3, C=24)
    xb = x.astype(jnp.bfloat16)
    m = jnp.asarray(4)

    out_x = xla_m.apply(params, x, nx, ny, True, m)
    monkeypatch.setattr(vk, "BF16_SCORES", True)
    out_f = fused_m.apply(params, xb, nx, ny, True, m)
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_x), atol=5e-2
    )

    def grads():
        return jax.grad(
            lambda p, xx: jnp.sum(
                fused_m.apply(p, xx, nx, ny, True, m).astype(jnp.float32)
                ** 2
            ),
            argnums=(0, 1),
        )(params, xb)

    g_on = grads()
    monkeypatch.setattr(vk, "BF16_SCORES", False)
    g_off = grads()
    flat_on, _ = jax.flatten_util.ravel_pytree(g_on)
    flat_off, _ = jax.flatten_util.ravel_pytree(g_off)
    np.testing.assert_allclose(
        np.asarray(flat_on, np.float32), np.asarray(flat_off, np.float32),
        atol=0.2,
    )


def test_mode_fused_chunked_layout():
    """The persistent chunked stage layout takes the same fused path."""
    from vil_tpu.ops import sliding_chunk as sc

    H, C, w, nx, ny, nglo = 2, 16, 3, 5, 5, 1
    fused_m, xla_m, params, x, _, _ = _pair(nglo, True, H=H, C=C, w=w, nx=nx, ny=ny)
    x_glo, x_loc = x[:, :nglo], x[:, nglo:]
    x_img = sc.chunkify(x_loc, nx, ny, w)
    m = jnp.asarray(5)
    glo_f, img_f = fused_m.apply(params, (x_glo, x_img), nx, ny, True, m)
    glo_x, img_x = xla_m.apply(params, (x_glo, x_img), nx, ny, True, m)
    np.testing.assert_allclose(
        np.asarray(img_f), np.asarray(img_x), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(glo_f), np.asarray(glo_x), atol=2e-4, rtol=2e-4
    )
