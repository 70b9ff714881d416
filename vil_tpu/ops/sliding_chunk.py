"""2-D sliding-chunk attention primitives — pure-XLA tier.

Functional equivalent of the reference sliding-chunk matmuls
(/root/reference/src/models/layers/slidingchunk_2d.py:27-130), redesigned for
TPU:

* Layout is (B·H, mx, my, W², M) with the head dim last (lane dimension),
  not the reference's channels-second torch layout.
* The 9 neighbor contributions are not 9 separate einsums: the rolled key /
  value chunks are concatenated into one (…, 9W², M) neighborhood operand and
  contracted in a single batched matmul, which XLA tiles onto the MXU as one
  large GEMM instead of 9 skinny ones.
* No hand-written backward: XLA differentiates roll/concat/matmul with cheap
  transposes (split + inverse roll ≡ the reference's ``slidingchunk_agrad``),
  and rematerialisation policy is handled at the train-step level.

Neighbor-sampling ``mode`` (reference slidingchunk_2d.py:15-24):
  0   : all 8 neighbor blocks + self  → kv span 9W²
  -1  : self block only              → kv span W²
  1..8: self + one sampled block     → kv span 2W²; may be a traced scalar
        (random-shift training samples the block on device — single
        compilation, no per-mode recompiles).
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .masks import NEIGHBOR_OFFSETS

Mode = Union[int, jax.Array]

# Roll shift that aligns neighbor chunk (dx, dy) onto the self position:
# jnp.roll by (-dx, -dy) over the (mx, my) axes.
_ROLL_SHIFTS = [(-dx, -dy) for dx, dy in NEIGHBOR_OFFSETS]

# mode (1..8) -> roll shift, matching reference mode_dict
# (slidingchunk_2d.py:15-24): entry 0 is unused.
MODE_ROLL_SHIFTS = np.array(
    [(0, 0), (1, 1), (1, 0), (1, -1), (0, 1), (0, -1), (-1, 1), (-1, 0), (-1, -1)],
    dtype=np.int32,
)


def _acc_dtype(dtype) -> jnp.dtype:
    """MXU accumulation dtype: at least f32, wider if the inputs are wider."""
    return jnp.promote_types(dtype, jnp.float32)


def _roll2d(t: jax.Array, sx, sy) -> jax.Array:
    """Cyclic roll over the chunk-grid axes (1, 2) of (B, mx, my, W², M)."""
    return jnp.roll(t, shift=(sx, sy), axis=(1, 2))


def sampled_roll(t: jax.Array, mode: Mode) -> jax.Array:
    """Roll that aligns the sampled neighbor block (mode 1..8) onto the self
    chunk. For a traced ``mode`` this is a ``lax.switch`` over 8 branches of
    STATIC rolls — each lowers to one fused slice+concat copy, where a
    dynamic-shift ``jnp.roll`` lowers to doubled-array dynamic slices per
    axis (~4× the copy traffic; one program still serves all 8 modes)."""
    if isinstance(mode, (int, np.integer)):
        sx, sy = (int(s) for s in MODE_ROLL_SHIFTS[int(mode)])
        return _roll2d(t, sx, sy)
    branches = [
        (lambda sx, sy: lambda x: _roll2d(x, sx, sy))(int(sx), int(sy))
        for sx, sy in MODE_ROLL_SHIFTS[1:]
    ]
    return jax.lax.switch(mode - 1, branches, t)


def neighborhood(t: jax.Array, mode: Mode) -> jax.Array:
    """Gather the kv neighborhood along the chunk axis.

    t: (B, mx, my, W², M) → (B, mx, my, K·W², M) where K ∈ {9, 1, 2} by mode.
    For traced ``mode`` the sampled-block roll is a lax.switch over 8 static
    branches (see :func:`sampled_roll`) — one compilation serves all modes.
    """
    if isinstance(mode, (int, np.integer)):
        if mode == 0:
            rolled = [_roll2d(t, sx, sy) for sx, sy in _ROLL_SHIFTS]
            return jnp.concatenate(rolled, axis=3)
        if mode == -1:
            return t
    return jnp.concatenate([t, sampled_roll(t, mode)], axis=3)


def sliding_chunk_qk(q: jax.Array, k: jax.Array, mode: Mode = 0) -> jax.Array:
    """Windowed QKᵀ: (B, mx, my, W², M) ² → (B, mx, my, W², K·W²).

    Equivalent to the reference ``slidingchunk_qk`` (slidingchunk_2d.py:27-79)
    modulo layout; one batched MXU GEMM over the concatenated neighborhood.
    """
    k_nbh = neighborhood(k, mode)
    return jnp.einsum(
        "bmnlc,bmntc->bmnlt", q, k_nbh,
        preferred_element_type=_acc_dtype(q.dtype),
    )


def sliding_chunk_av(attn: jax.Array, v: jax.Array, mode: Mode = 0) -> jax.Array:
    """Attention · V: (B, mx, my, W², K·W²) × (B, mx, my, W², M) → (B, mx, my, W², M).

    Equivalent to the reference ``slidingchunk_av`` (slidingchunk_2d.py:83-130).
    """
    v_nbh = neighborhood(v, mode)
    return jnp.einsum(
        "bmnlt,bmntc->bmnlc", attn, v_nbh,
        preferred_element_type=_acc_dtype(attn.dtype),
    )


# ---------------------------------------------------------------------------
# chunk layout helpers
# ---------------------------------------------------------------------------
def chunk_grid(nx: int, ny: int, w: int) -> tuple[int, int, int, int]:
    """(padx, pady, mx, my) so that the padded grid is mx·w × my·w
    (reference longformer2d.py:138-140)."""
    padx = (w - nx % w) % w
    pady = (w - ny % w) % w
    return padx, pady, (nx + padx) // w, (ny + pady) // w


def chunkify(t: jax.Array, nx: int, ny: int, w: int) -> jax.Array:
    """(B, nx·ny, M) token grid → (B, mx, my, W², M) zero-padded chunks."""
    b, n, m = t.shape
    assert n == nx * ny, f"token count {n} != {nx}x{ny}"
    padx, pady, mx, my = chunk_grid(nx, ny, w)
    t = t.reshape(b, nx, ny, m)
    if padx or pady:
        t = jnp.pad(t, ((0, 0), (0, padx), (0, pady), (0, 0)))
    t = t.reshape(b, mx, w, my, w, m)
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(b, mx, my, w * w, m)


def unchunkify(t: jax.Array, nx: int, ny: int, w: int) -> jax.Array:
    """(B, mx, my, W², M) chunks → (B, nx·ny, M), cropping the pad."""
    b, mx, my, w2, m = t.shape
    t = t.reshape(b, mx, my, w, w, m).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(b, mx * w, my * w, m)[:, :nx, :ny]
    return t.reshape(b, nx * ny, m)
