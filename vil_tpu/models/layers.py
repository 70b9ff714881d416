"""Common model layers: Mlp, stochastic depth, patch embedding.

Functional parity targets (cited into /root/reference/src/models/msvit.py):
Mlp (:17-34), PatchEmbed with factorized x/y absolute position embedding and
global cls tokens (:159-224), DropPath residuals (:313-316, :337-340).
TPU-first choices: NHWC image layout (conv → XLA convolution on MXU),
bfloat16 compute / float32 params, RNG-threaded stochastic depth.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# timm-style truncated-normal init (std=.02), used throughout the reference
# (msvit.py:477-484). Note: timm truncates at absolute ±2 (≈±100σ for σ=.02 —
# effectively untruncated); JAX truncates at ±2σ. The distributions are
# practically identical at this σ and irrelevant for checkpoint loading.
trunc_normal_init = jax.nn.initializers.truncated_normal(stddev=0.02)


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm replacement backed by the fused Pallas
    forward/backward kernels (ops/pallas/layer_norm.py) — no f32
    activation-sized casts in the backward. Parameter names/shapes match
    nn.LayerNorm ('scale'/'bias', (C,)) for checkpoint compatibility."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.layer_norm import layer_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.param_dtype)
        return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


def make_layer_norm(fused: bool, *, epsilon, dtype, param_dtype, name):
    cls = FusedLayerNorm if fused else nn.LayerNorm
    return cls(epsilon=epsilon, dtype=dtype, param_dtype=param_dtype, name=name)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference uses timm DropPath).

    Accepts an array or a pytree of arrays sharing a leading batch dim (the
    chunked-layout blocks carry (x_glo, x_img) pairs); ONE (B,) mask is drawn
    and applied to every leaf, so the whole residual branch of a sample is
    kept or dropped together — same semantics as the token-layout path."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        batch = jax.tree_util.tree_leaves(x)[0].shape[0]
        mask = jax.random.bernoulli(rng, keep, (batch,))

        def apply(leaf):
            m = mask.reshape((batch,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, leaf / keep, jnp.zeros_like(leaf))

        return jax.tree_util.tree_map(apply, x)


class Mlp(nn.Module):
    """Transformer MLP: fc1 → GELU → drop → fc2 → drop (msvit.py:17-34).

    ``gelu_approx``: None (default) picks the GELU flavor from the compute
    dtype — tanh-approximate in bf16, exact (erf) otherwise. Measured on
    v5e, XLA's erf does NOT fuse into the GEMM epilogue and costs ~6× the
    GEMMs themselves (2.45 ms vs 0.43 ms on ViL-Small stage-1 MLP shapes),
    while the tanh form is effectively free; the tanh/erf difference
    (≤3e-3 absolute) is below bf16 rounding at these magnitudes. Float32
    paths keep exact erf for bit-level parity with torch nn.GELU."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    gelu_approx: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        out_features = self.out_features or x.shape[-1]
        dense = lambda feat, name: nn.Dense(
            feat,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name=name,
        )
        x = dense(self.hidden_features, "fc1")(x)
        approx = self.gelu_approx
        if approx is None:
            approx = jnp.dtype(self.dtype) == jnp.dtype(jnp.bfloat16)
        x = nn.gelu(x, approximate=approx)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(out_features, "fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding + cls/global tokens + factorized APE.

    Reference: msvit.py:159-224. The absolute position embedding is
    factorized into x- and y- halves of the channel dim, broadcast over the
    grid and concatenated (msvit.py:186-191, 213-219).

    Input is NHWC (TPU layout); output is (B, nglo + nx·ny, C) tokens.
    """

    patch_size: int
    nx: int
    ny: int
    embed_dim: int
    nglo: int = 1
    norm_embed: bool = True
    ape: bool = True
    drop_rate: float = 0.0
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # channel normalization folded on device for uint8 inputs
    # (INPUT.DEVICE_NORMALIZE): one fused cast·scale+offset pass
    input_mean: tuple = (0.485, 0.456, 0.406)
    input_std: tuple = (0.229, 0.224, 0.225)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        B, H, W, _ = x.shape
        p = self.patch_size
        if x.dtype == jnp.uint8:
            import numpy as np

            mean = np.asarray(self.input_mean, np.float32)
            std = np.asarray(self.input_std, np.float32)
            scale = jnp.asarray(1.0 / (255.0 * std), self.dtype)
            offset = jnp.asarray(-mean / std, self.dtype)
            x = x.astype(self.dtype) * scale + offset
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        nx, ny = x.shape[1], x.shape[2]
        assert (nx, ny) == (self.nx, self.ny), "Fix input size!"
        x = x.reshape(B, nx * ny, self.embed_dim)

        if self.norm_embed:
            x = nn.LayerNorm(
                epsilon=self.ln_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm_embed",
            )(x)

        if self.nglo >= 1:
            cls_token = self.param(
                "cls_token",
                trunc_normal_init,
                (1, self.nglo, self.embed_dim),
                self.param_dtype,
            )
            cls = jnp.broadcast_to(
                cls_token.astype(x.dtype), (B, self.nglo, self.embed_dim)
            )
            x = jnp.concatenate([cls, x], axis=1)

        if self.ape:
            cls_pos = self.param(
                "cls_pos_embed",
                trunc_normal_init,
                (1, self.nglo, self.embed_dim),
                self.param_dtype,
            )
            half = self.embed_dim // 2
            x_pos = self.param(
                "x_pos_embed", trunc_normal_init, (1, self.nx, half), self.param_dtype
            )
            y_pos = self.param(
                "y_pos_embed", trunc_normal_init, (1, self.ny, half), self.param_dtype
            )
            # (1, nx, ny, half) ⊕ (1, nx, ny, half) → (1, nx·ny, C)
            pos2d = jnp.concatenate(
                [
                    jnp.broadcast_to(x_pos[:, :, None, :], (1, self.nx, self.ny, half)),
                    jnp.broadcast_to(y_pos[:, None, :, :], (1, self.nx, self.ny, half)),
                ],
                axis=-1,
            ).reshape(1, self.nx * self.ny, self.embed_dim)
            pos = jnp.concatenate([cls_pos, pos2d], axis=1).astype(x.dtype)
            x = x + pos

        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x
