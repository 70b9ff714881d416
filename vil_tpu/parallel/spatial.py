"""Spatial (sequence) parallelism for 2-D sliding-chunk attention.

Beyond-reference capability (the reference's only parallelism is DDP over
the batch, /root/reference/src/run_experiment.py:146-152): shard the
CHUNK-ROW grid — the ``mx`` axis of the stage-resident (B, mx, my, W², C)
layout — over a mesh axis, so one image's attention runs across several
chips. This is the TPU-native answer to huge-image inference/training where
one chip cannot hold a stage's activations.

Why it is exact: the unsharded XLA tier gathers each chunk's 3×3 neighbor
blocks by CYCLIC rolls over (mx, my) and kills wrapped-around neighbors with
the static validity masks (ops/sliding_chunk.py::neighborhood + ops/masks).
Under mx-sharding the same gather is one-chunk-row CYCLIC halo exchanges —
two ``ppermute``s over the spatial axis (ICI neighbors) — followed by the
identical local math with the mask table sharded along mx. Global-token
queries attend to every image token, so their softmax runs distributed:
per-shard partial max (``pmax``), partial denominators and partial PV sums
(``psum``) — the same two-part running-max/denominator pattern the
chunked-native global branch already uses on one chip
(models/attention.py, chunked-native branch).

All functions here run INSIDE ``jax.shard_map`` with a mesh axis named
``axis_name`` sharding ``mx``; batch may be sharded over a different axis
simultaneously (tested on a ('data', 'spatial') mesh).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masks import NEIGHBOR_OFFSETS
from ..ops.sliding_chunk import MODE_ROLL_SHIFTS

Mode = Union[int, jax.Array]


def halo_rows(t: jax.Array, axis_name: str):
    """Cyclic one-chunk-row halos over the spatial axis.

    t: (B, mxs, my, W², C) local shard. Returns (top, bot), each
    (B, 1, my, W², C): ``top`` is the PREVIOUS shard's last row, ``bot`` the
    NEXT shard's first row (cyclic — matching the unsharded tier's cyclic
    rolls; edge wrap-around is killed by the same masks either way).
    """
    d = jax.lax.axis_size(axis_name)
    if d == 1:
        return t[:, -1:], t[:, :1]
    fwd = [(i, (i + 1) % d) for i in range(d)]
    bwd = [(i, (i - 1) % d) for i in range(d)]
    top = jax.lax.ppermute(t[:, -1:], axis_name, fwd)
    bot = jax.lax.ppermute(t[:, :1], axis_name, bwd)
    return top, bot


def neighborhood_spatial(t: jax.Array, axis_name: str, mode: Mode = 0):
    """``ops.sliding_chunk.neighborhood`` under mx-sharding.

    t: (B, mxs, my, W², M) shard → (B, mxs, my, K·W², M), K ∈ {9, 1, 2}.
    Row offsets dx ∈ {−1, 0, 1} read from the halo-extended rows; column
    offsets stay local rolls (my is unsharded). Traced ``mode`` (random-shift
    training) keeps the dynamic-slice/roll form — one compilation serves all
    8 sampled blocks, exactly like the unsharded tier.
    """
    mxs = t.shape[1]
    if isinstance(mode, (int, np.integer)) and mode == -1:
        return t
    top, bot = halo_rows(t, axis_name)
    ext = jnp.concatenate([top, t, bot], axis=1)  # (B, mxs+2, my, W², M)

    if isinstance(mode, (int, np.integer)):
        if mode == 0:
            parts = [
                jnp.roll(
                    jax.lax.slice_in_dim(ext, 1 + dx, 1 + dx + mxs, axis=1),
                    -dy, axis=2,
                )
                for dx, dy in NEIGHBOR_OFFSETS
            ]
            return jnp.concatenate(parts, axis=3)
        sx, sy = (int(s) for s in MODE_ROLL_SHIFTS[int(mode)])
        nb = jnp.roll(
            jax.lax.slice_in_dim(ext, 1 - sx, 1 - sx + mxs, axis=1),
            sy, axis=2,
        )
        return jnp.concatenate([t, nb], axis=3)

    shift = jnp.asarray(MODE_ROLL_SHIFTS)[mode]
    nb = jnp.roll(
        jax.lax.dynamic_slice_in_dim(ext, 1 - shift[0], mxs, axis=1),
        shift[1], axis=2,
    )
    return jnp.concatenate([t, nb], axis=3)


def spatial_local_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    k_glo: Optional[jax.Array], v_glo: Optional[jax.Array],
    bias: Optional[jax.Array], mask_add: jax.Array, num_heads: int,
    axis_name: str, mode: Mode = 0,
) -> jax.Array:
    """The local-branch fused attention under mx-sharding — exact
    equivalent of ``vil_kernel._xla_reference_mh`` (joint softmax over
    [global ‖ local] key columns, RPE bias, additive mask).

    q/k/v: (B, mxs, my, W², C) shards; k_glo/v_glo: (B, Nglo, C) replicated
    along the spatial axis; bias: (H, W², Nglo+K·W²) replicated; mask_add:
    THIS shard's rows (mxs, my, Wq, Nglo+K·W²) of the additive mask table
    (shard the table along dim 0 together with the data). After the halo
    exchange every query's full key set is on-shard, so softmax and PV need
    no further collectives.
    """
    B, mxs, my, w2, C = q.shape
    M = C // num_heads
    nglo = 0 if k_glo is None else k_glo.shape[1]

    def to_bh(t):
        b, a1, a2, a3, _ = t.shape
        return (
            t.reshape(b, a1, a2, a3, num_heads, M)
            .transpose(0, 4, 1, 2, 3, 5)
            .reshape(b * num_heads, a1, a2, a3, M)
        )

    def glo_to_bh(t):
        b, g, _ = t.shape
        return (
            t.reshape(b, g, num_heads, M)
            .transpose(0, 2, 1, 3)
            .reshape(b * num_heads, g, M)
        )

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    k_nbh = neighborhood_spatial(kh, axis_name, mode)
    scores_loc = jnp.einsum(
        "bmnlc,bmntc->bmnlt", qh, k_nbh, preferred_element_type=jnp.float32
    )  # (BH, mxs, my, W², K·W²)
    if nglo > 0:
        scores_glo = jnp.einsum(
            "bmnlc,btc->bmnlt", qh, glo_to_bh(k_glo),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.concatenate([scores_glo, scores_loc], axis=-1)
    else:
        scores = scores_loc
    if bias is not None:
        bias_b = jnp.tile(bias, (B, 1, 1))[:, None, None]
        scores = scores + bias_b
    scores = scores + mask_add.astype(jnp.float32)[None]
    m = jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores - m, axis=-1).astype(q.dtype)
    v_nbh = neighborhood_spatial(vh, axis_name, mode)
    out = jnp.einsum(
        "bmnlt,bmntc->bmnlc", probs[..., nglo:], v_nbh,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if nglo > 0:
        out = out + jnp.einsum(
            "bmnlt,btc->bmnlc", probs[..., :nglo], glo_to_bh(v_glo),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    return (
        out.reshape(B, num_heads, mxs, my, w2, M)
        .transpose(0, 2, 3, 4, 1, 5)
        .reshape(B, mxs, my, w2, C)
    )


def halo_tables(mask_add: np.ndarray, nglo: int):
    """Host-side tables for the Pallas halo kernel under spatial sharding.

    mask_add: the GLOBAL additive mask (mx, my, Wq, Nglo+9W²)
    (vil_kernel.mask_to_additive). Returns ``(classes_host, row_class)``:
    the tail-order dedup'd class table (shared by every shard — SPMD shards
    run one program) and the per-GLOBAL-row int32 class vector, to be
    sharded along mx together with the data."""
    from ..ops.pallas.vil_kernel import tail_mask_classes

    classes_host, class_of = tail_mask_classes(np.asarray(mask_add), nglo)
    return classes_host, np.asarray(class_of, dtype=np.int32)


def spatial_local_attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array,
    k_glo: Optional[jax.Array], v_glo: Optional[jax.Array],
    bias: Optional[jax.Array], row_class: jax.Array, fused,
    axis_name: str,
) -> jax.Array:
    """Pallas-kernel path of spatial parallelism: exchange the ±1 chunk-row
    halos, then run the halo-input fused kernel on this shard. ``fused`` is
    built OUTSIDE shard_map by ``vil_kernel.make_fused_vil_attention_halo``
    (it carries the global mask-class table); ``row_class`` is this shard's
    (mxs,) slice of the per-row class vector (halo_tables). Gradients flow
    back through the halo concat + ppermute automatically (dk_ext's halo
    rows are returned to their owner shards by the ppermute transpose).
    NOTE: pass ``check_vma=False`` to the enclosing ``jax.shard_map`` —
    pallas_call out_shapes carry no varying-mesh-axes info."""
    top_k, bot_k = halo_rows(k, axis_name)
    top_v, bot_v = halo_rows(v, axis_name)
    k_ext = jnp.concatenate([top_k, k, bot_k], axis=1)
    v_ext = jnp.concatenate([top_v, v, bot_v], axis=1)
    return fused(q, k_ext, v_ext, k_glo, v_glo, bias, row_class)


def spatial_global_branch(
    qg: jax.Array, k_img: jax.Array, v_img: jax.Array,
    k_glo: jax.Array, v_glo: jax.Array,
    g2g: Optional[jax.Array], g2l0: Optional[jax.Array],
    valid: Optional[jax.Array], axis_name: str,
) -> jax.Array:
    """Global-token queries attending to ALL tokens under mx-sharding, with
    a DISTRIBUTED two-part softmax (the chunked-native global branch of
    models/attention.py, with the local reductions turned into pmax/psum
    over the spatial axis).

    qg: (B, H, Nglo, M) replicated; k_img/v_img: (B, mxs, my, W², C) shards;
    k_glo/v_glo: (B, Nglo, C) replicated; g2g: (H, Nglo, Nglo) /
    g2l0: (H, Nglo) RPE biases; valid: (mxs, my, W²) bool shard of the
    real-token mask (None when the grid has no pad). Returns (B, H, Nglo, M)
    replicated across the spatial axis.
    """
    B, mxs, my, w2, C = k_img.shape
    H, M = qg.shape[1], qg.shape[3]
    nglo = qg.shape[2]
    k6 = k_img.reshape(B, mxs, my, w2, H, M)
    v6 = v_img.reshape(B, mxs, my, w2, H, M)
    kg4 = k_glo.reshape(B, nglo, H, M)
    vg4 = v_glo.reshape(B, nglo, H, M)
    s_loc = jnp.sum(
        (k6[:, :, :, :, :, None, :] * qg[:, None, None, None]).astype(
            jnp.float32
        ),
        axis=-1,
    )  # (B, mxs, my, W², H, Nglo) — this shard's key columns
    s_glo = jnp.sum(
        (kg4[:, :, :, None, :] * qg[:, None]).astype(jnp.float32), axis=-1
    )  # (B, Nglo_k, H, Nglo) — replicated
    if g2g is not None:
        s_glo = s_glo + g2g.transpose(2, 0, 1)[None]
        s_loc = s_loc + g2l0[None, None, None, None]
    if valid is not None:
        s_loc = jnp.where(
            valid[None, :, :, :, None, None], s_loc, -jnp.inf
        )
    # distributed running max / denominator: local partials → pmax/psum
    m_loc = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(s_loc, axis=(1, 2, 3))), axis_name
    )
    m0 = jnp.maximum(m_loc, jax.lax.stop_gradient(jnp.max(s_glo, axis=1)))
    e_loc = jnp.exp(s_loc - m0[:, None, None, None])
    e_glo = jnp.exp(s_glo - m0[:, None])  # replicated — added ONCE below
    den = jax.lax.psum(e_loc.sum(axis=(1, 2, 3)), axis_name) + e_glo.sum(
        axis=1
    )
    p_loc = e_loc / den[:, None, None, None]
    p_glo = e_glo / den[:, None]
    x0 = jax.lax.psum(
        jnp.sum(
            (p_loc[..., None].astype(k_img.dtype)
             * v6[:, :, :, :, :, None, :]).astype(jnp.float32),
            axis=(1, 2, 3),
        ),
        axis_name,
    ) + jnp.sum(
        (p_glo[..., None].astype(k_img.dtype)
         * vg4[:, :, :, None, :]).astype(jnp.float32),
        axis=1,
    )
    return x0  # (B, H, Nglo, M) f32, replicated over the spatial axis
