"""Linear-complexity attention baselines: Performer, Linformer, SRformer.

Reference implementations:
* performer — /root/reference/src/models/layers/performer.py (itself a torch
  transcription of the google-research JAX FAVOR+; this is a fresh JAX
  implementation of the same algorithm).
* linformer — /root/reference/src/models/layers/linformer.py
* srformer  — /root/reference/src/models/layers/srformer.py (PVT-style
  spatial reduction: strided conv + InstanceNorm on keys/values).

TPU notes: the performer's orthogonal random features are drawn with jnp QR
on device (replacing scipy ``ortho_group``), stored in the ``buffers``
variable collection, and redrawn functionally by the train loop on the
reference's ``1 + 5·epoch`` schedule (run_experiment.py:217-221).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import _merge_heads, _softmax_max_sub, _split_heads
from .layers import trunc_normal_init


def gaussian_orthogonal_random_matrix(
    key: jax.Array, nb_rows: int, nb_columns: int, scaling: int = 0
) -> jax.Array:
    """Random features matrix with orthogonal blocks (performer.py:77-103).

    Blocks are rows of Q from the QR decomposition of a gaussian matrix
    (distributionally equivalent to scipy ``ortho_group`` rows); scaling=0
    re-scales rows by chi-distributed norms, scaling=1 by sqrt(d).
    """
    nb_full_blocks = nb_rows // nb_columns
    keys = jax.random.split(key, nb_full_blocks + 2)
    blocks = []
    for i in range(nb_full_blocks):
        g = jax.random.normal(keys[i], (nb_columns, nb_columns))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = nb_rows - nb_full_blocks * nb_columns
    if rem > 0:
        g = jax.random.normal(keys[-2], (nb_columns, nb_columns))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    mat = jnp.concatenate(blocks, axis=0)
    if scaling == 0:
        multiplier = jnp.linalg.norm(
            jax.random.normal(keys[-1], (nb_rows, nb_columns)), axis=1
        )
    elif scaling == 1:
        multiplier = math.sqrt(nb_columns) * jnp.ones((nb_rows,))
    else:
        raise ValueError(f"Invalid scaling {scaling}")
    return multiplier[:, None] * mat


def softmax_kernel(
    data: jax.Array, projection: jax.Array, is_query: bool, eps: float = 1e-4
) -> jax.Array:
    """FAVOR+ positive softmax features (performer.py:27-55).

    data: (B, H, N, M); projection: (nb_features, M).
    """
    data_normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum(
        "bhnm,jm->bhnj", data_normalizer * data, projection.astype(data.dtype),
        preferred_element_type=jnp.float32,
    )
    diag_data = (
        jnp.sum(jnp.square(data), axis=-1) / 2.0 * data_normalizer**2
    )[..., None].astype(jnp.float32)
    if is_query:
        stab = jnp.max(data_dash, axis=-1, keepdims=True)
    else:
        stab = jnp.max(data_dash)
    out = ratio * (jnp.exp(data_dash - diag_data - jax.lax.stop_gradient(stab)) + eps)
    return out.astype(data.dtype)


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Non-causal linear attention (performer.py:109-114)."""
    k_cumsum = k.sum(axis=-2)
    d_inv = 1.0 / jnp.einsum("...nd,...d->...n", q, k_cumsum)
    context = jnp.einsum(
        "...nd,...ne->...de", k, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return jnp.einsum("...de,...nd,...n->...ne", context, q, d_inv)


class PerformerAttention(nn.Module):
    """FAVOR+ self-attention (performer.py:208-239).

    The projection matrix lives in the ``buffers`` collection; use
    ``vil_tpu.train.redraw.redraw_projections`` to resample it.
    """

    dim: int
    num_heads: int
    nb_features: int = 256
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, nx=None, ny=None, deterministic: bool = True, mode=0
    ) -> jax.Array:
        B, N, C = x.shape
        H = self.num_heads
        M = C // H
        nb_features = self.nb_features or int(M * math.log(M))

        projection = self.variable(
            "buffers",
            "projection_matrix",
            lambda: gaussian_orthogonal_random_matrix(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                nb_features,
                M,
            ),
        ).value

        qkv = nn.Dense(
            3 * self.dim,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name="qkv",
        )(x)
        q, k, v = (_split_heads(t, H) for t in jnp.split(qkv, 3, axis=-1))

        q = softmax_kernel(q, projection, is_query=True)
        k = softmax_kernel(k, projection, is_query=False)
        out = linear_attention(q, k, v)

        out = _merge_heads(out.astype(self.dtype))
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name="proj",
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


def _uniform_linformer_init(key, shape, dtype=jnp.float32):
    """init_() from linformer.py:8-12: U(-1/sqrt(dim), 1/sqrt(dim))."""
    std = 1.0 / math.sqrt(shape[-1])
    return jax.random.uniform(key, shape, dtype, minval=-std, maxval=std)


class LinformerAttention(nn.Module):
    """Linformer: sequence-length projection of K/V (linformer.py:15-71)."""

    dim: int
    seq_len: int
    num_feats: int = 256
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    share_kv: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, nx=None, ny=None, deterministic: bool = True, mode=0
    ) -> jax.Array:
        b, n, d = x.shape
        h = self.num_heads
        d_h = d // h
        scale = d_h ** -0.5
        assert n == self.seq_len, (
            f"the sequence length of the key / values must be {self.seq_len} "
            f"- {n} given"
        )

        queries = _split_heads(
            nn.Dense(
                self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                param_dtype=self.param_dtype, kernel_init=trunc_normal_init,
                name="query",
            )(x),
            h,
        ) * scale
        kv = nn.Dense(
            2 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal_init, name="kv",
        )(x)
        keys, values = jnp.split(kv, 2, axis=-1)  # (b, n, d)

        proj_k = self.param(
            "proj_k", _uniform_linformer_init, (self.seq_len, self.num_feats),
            self.param_dtype,
        )
        proj_v = (
            proj_k
            if self.share_kv
            else self.param(
                "proj_v", _uniform_linformer_init,
                (self.seq_len, self.num_feats), self.param_dtype,
            )
        )
        # project along the sequence axis, then split heads
        keys = jnp.einsum("bnd,nk->bkd", keys, proj_k.astype(keys.dtype))
        values = jnp.einsum("bnd,nk->bkd", values, proj_v.astype(values.dtype))
        keys = _split_heads(keys, h)
        values = _split_heads(values, h)

        attn = jnp.einsum(
            "bhnd,bhkd->bhnk", queries, keys, preferred_element_type=jnp.float32
        )
        probs = _softmax_max_sub(attn)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum(
            "bhnk,bhkd->bhnd",
            probs.astype(self.dtype),
            values,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = _merge_heads(out)
        out = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init, name="proj",
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d default (affine=False) over NHWC spatial dims."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class SRAttention(nn.Module):
    """PVT-style spatial-reduction attention (srformer.py:5-58)."""

    dim: int
    rratio: int = 2
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, nx: int, ny: int, deterministic: bool = True, mode=0
    ) -> jax.Array:
        b, n, d = x.shape
        h = self.num_heads
        d_h = d // h
        scale = d_h ** -0.5

        queries = _split_heads(
            nn.Dense(
                self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                param_dtype=self.param_dtype, kernel_init=trunc_normal_init,
                name="query",
            )(x),
            h,
        ) * scale

        # spatial reduction of the local tokens for K/V
        x_local = x[:, -nx * ny:].reshape(b, nx, ny, d)
        x_local = nn.Conv(
            self.dim,
            kernel_size=(self.rratio, self.rratio),
            strides=(self.rratio, self.rratio),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj_sr",
        )(x_local)
        x_local = _instance_norm(x_local.astype(jnp.float32)).astype(self.dtype)
        x_local = x_local.reshape(b, -1, d)
        x_kv = jnp.concatenate([x[:, : n - nx * ny], x_local], axis=1)

        kv = nn.Dense(
            2 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal_init, name="kv",
        )(x_kv)
        keys, values = (_split_heads(t, h) for t in jnp.split(kv, 2, axis=-1))

        attn = jnp.einsum(
            "bhnd,bhkd->bhnk", queries, keys, preferred_element_type=jnp.float32
        )
        probs = _softmax_max_sub(attn)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum(
            "bhnk,bhkd->bhnd",
            probs.astype(self.dtype),
            values,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = _merge_heads(out)
        out = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init, name="proj",
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
