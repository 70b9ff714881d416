"""Attention modules for MsViT.

* ``FullAttention``   — dense MHSA with optional joint global+local relative
  position bias (reference /root/reference/src/models/msvit.py:37-120).
* ``VilAttention``    — 2-D sliding-chunk local attention with global tokens,
  Swin-style RPE, three masking variants, only-global mode, and
  random-shift neighbor sampling (reference
  /root/reference/src/models/layers/longformer2d.py:12-229).

Numerics parity: q scaled by head_dim**-0.5, max-subtracted softmax, masks as
-inf fills. TPU-first: softmax and score accumulation in float32 regardless
of the bf16 compute dtype; static mask/RPE tables baked in at trace time;
the random-shift mode is a traced scalar so one compilation serves all 8
sampled blocks (no per-mode recompiles).
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import os as _os

from ..ops import masks as masks_lib
from ..ops import rpe as rpe_lib
from ..ops import sliding_chunk as sc
from ..ops.pallas import full_attention, vil_block, vil_kernel, vil_mode_kernel
from .layers import trunc_normal_init

# Fused attention-BLOCK kernel (QKV + attention + out-proj in one Pallas
# call, ops/pallas/vil_block.py) for the whole-image mode-0 path — removes
# the conv↔kernel relayout copies ("relayout tax"). MEASURED DEAD END,
# default OFF: the in-kernel my-batched projection dots can't match XLA's
# big conv GEMMs — ViL-Small 224 b64 train 1517 vs 1668 img/s, inference
# 6712 vs 6745 (docs/BENCHMARKS.md). Kept behind the flag with full test
# + compiled-smoke coverage as the third documented angle on the tax.
FUSED_BLOCK = _os.environ.get("VIL_TPU_FUSED_BLOCK", "0") == "1"

Mode = Union[int, jax.Array]


def _tp_shard_call(mesh, axis, fn, arg_specs, out_spec, args):
    """Run ``fn`` under ``jax.shard_map`` with the packed-head channel axis
    of the fused-attention operands split over the tensor-parallel mesh
    ``axis`` (None args and their specs are dropped).

    GSPMD cannot partition a Pallas custom call, so without this wrapper a
    ``PARAM_SHARDING tp`` run gathers the kernel operands and replicates the
    attention compute on every model-parallel chip. Heads are independent
    through the whole kernel (softmax is per-head), so splitting channels =
    splitting heads is exact; each shard runs the kernel with H/n heads and
    its own slice of the per-head RPE bias. Gradients flow through the
    shard_map transpose automatically (channel-sharded dQ/dK/dV, per-head
    dbias — no extra collectives)."""
    from jax.sharding import PartitionSpec  # noqa: F401 (doc reference)

    keep = [i for i, a in enumerate(args) if a is not None]

    def call(*xs):
        full: list = [None] * len(args)
        for j, i in enumerate(keep):
            full[i] = xs[j]
        return fn(*full)

    sharded = jax.shard_map(
        call,
        mesh=mesh,
        in_specs=tuple(arg_specs[i] for i in keep),
        out_specs=out_spec,
        # pallas_call out_shapes carry no varying-mesh-axes info (same
        # caveat as the spatial halo path, parallel/spatial.py)
        check_vma=False,
    )
    return sharded(*[args[i] for i in keep])


def _tp_batch_axis(mesh, batch: int):
    """'data' when the mesh has a data axis that divides the batch (keeps
    the batch split instead of gathering it into every shard), else None."""
    axes = dict(mesh.shape)
    if "data" in axes and batch % int(axes["data"]) == 0:
        return "data"
    return None


def _split_heads(t: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, C) → (B, H, N, M)."""
    b, n, c = t.shape
    return t.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(t: jax.Array) -> jax.Array:
    """(B, H, N, M) → (B, N, C)."""
    b, h, n, m = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * m)


def _softmax_max_sub(scores: jax.Array, axis: int = -1) -> jax.Array:
    """Max-subtracted softmax in float32 (reference longformer2d.py:185,223)."""
    scores = scores.astype(jnp.float32)
    scores = scores - jax.lax.stop_gradient(scores.max(axis=axis, keepdims=True))
    return jax.nn.softmax(scores, axis=axis)


def _toeplitz_local_bias(wx: int, wy: int, H: int,
                         table: jax.Array) -> jax.Array:
    """(H, wx·wy, wx·wy) local RPE bias from the ((2wx−1)(2wy−1), H) table
    WITHOUT a gather: bias[h, i, j] = T2d[h, xi−xj+wx−1, yi−yj+wy−1] is a
    2-D Toeplitz expansion — exactly extract-patches over the table image
    (patch (xi, yi) read at every offset = the reversed (wx, wy) window at
    (xi, yi)). lax.conv_general_dilated_patches lowers to an
    identity-kernel convolution: MXU work instead of TPU's slow row
    gather, and — decisively — its VJP is a conv wgrad instead of the
    SCATTER-ADD that dominated RPE training (16 × 2.23 ms per step at
    Medium-Deep 384², 34% of the step; gathers another ~10 ms)."""
    t2d = table.reshape(2 * wx - 1, 2 * wy - 1, H)
    t2d = t2d.transpose(2, 0, 1)[:, None]  # (H, 1, 2wx−1, 2wy−1)
    patches = jax.lax.conv_general_dilated_patches(
        t2d, filter_shape=(wx, wy), window_strides=(1, 1),
        padding="VALID", precision=jax.lax.Precision.HIGHEST,
    )  # (H, wx·wy, wx, wy): [h, u·wy+v, a, b] = t2d[h, a+u, b+v]
    # want T2d[xi−xj+wx−1, yi−yj+wy−1]: a=xi, u=wx−1−xj (and y alike) —
    # reverse the filter axes, then put query axes first
    rev = patches.reshape(H, wx, wy, wx, wy)[:, ::-1, ::-1]
    return rev.transpose(0, 3, 4, 1, 2).reshape(H, wx * wy, wx * wy)


def _skew(t: jax.Array, n: int) -> jax.Array:
    """(..., 2n−1) → (..., n, n) with out[..., i, j] = t[..., i−j+n−1] —
    the Transformer-XL/Music-Transformer SKEW trick: reverse, tile, pad
    one column, reflow rows with a stride of 2n−1, slice. Pure
    broadcast/pad/reshape/slice, so the VJP is slice/pad/reduce — no
    gather and, crucially, no scatter in the transpose."""
    lead = t.shape[:-1]
    rev = t[..., ::-1]
    tiled = jnp.broadcast_to(rev[..., None, :], (*lead, n, 2 * n - 1))
    padded = jnp.pad(
        tiled, [(0, 0)] * len(lead) + [(0, 0), (0, 1)]
    )  # (..., n, 2n)
    flat = padded.reshape(*lead, n * 2 * n)[..., : n * (2 * n - 1)]
    skewed = flat.reshape(*lead, n, 2 * n - 1)
    return skewed[..., n - 1 :]


def _skew_local_bias(wx: int, wy: int, H: int,
                     table: jax.Array) -> jax.Array:
    """(H, wx·wy, wx·wy) local RPE bias via two nested 1-D SKEWs instead
    of the row gather: bias[h,(xi,yi),(xj,yj)] = T2d[h, xi−xj+wx−1,
    yi−yj+wy−1] separates into an x-skew then a y-skew. All data movement
    is bandwidth-bound pad/reshape (the conv formulation measured 15×
    slower than even the gather; the gather's scatter-add VJP was 34% of
    the RPE-384 train step)."""
    t2d = table.reshape(2 * wx - 1, 2 * wy - 1, H)
    # x first: (H, Y, X) → (H, Y, wx, wx) with [h, y, xi, xj]
    tx = t2d.transpose(2, 1, 0)  # (H, Y, X)
    ax = _skew(tx, wx)  # (H, Y, wx, wx)
    # y: (H, wx, wx, Y) → (H, wx, wx, wy, wy) with [h, xi, xj, yi, yj]
    ay = _skew(ax.transpose(0, 2, 3, 1), wy)
    # → (h, xi, yi, xj, yj) → (H, n_loc, n_loc)
    return ay.transpose(0, 1, 3, 2, 4).reshape(
        H, wx * wy, wx * wy
    )


def _assemble_full_rpe_bias(wx: int, wy: int, nglo: int, H: int,
                            table: jax.Array, g2l: jax.Array = None,
                            g2g: jax.Array = None) -> jax.Array:
    """Pure (H, N, N) joint global+local RPE bias assembly
    (msvit.py:72-114) from the parameter leaves — factored out of
    FullAttention so the fused dense attention's custom VJP can
    rematerialize it instead of saving the assembled tensor (403 MB per
    block at 1024² stage 3). VIL_TPU_RPE_ASSEMBLY selects the local-part
    construction:
      'skew' (default) — nested 1-D skew reshapes (_skew_local_bias): no
        gather, and the VJP is slice/reduce instead of the SCATTER-ADD
        that was 34% of the RPE-384 train step;
      'gather' — the reference-shaped row gather (scatter-add VJP);
      'conv' — identity-kernel extract-patches (MEASURED 15× slower than
        the gather on this backend: RPE-384 train 151.6 → 32.8 img/s —
        kept for re-measurement on future toolchains)."""
    import os as _os

    mode = _os.environ.get("VIL_TPU_RPE_ASSEMBLY", "skew")
    if mode == "conv":
        local_bias = _toeplitz_local_bias(wx, wy, H, table)
    elif mode == "gather":
        # gather with H MAJOR: a (N², H) result gets its minor dim padded
        # 6 → 128 lanes on TPU (measured 21.3× expansion — an 8 GB temp at
        # 1024², the allocation that OOMed RPE training there)
        idx = jnp.asarray(rpe_lib.full_rpe_index(wx, wy))
        local_bias = jnp.take(table.T, idx.reshape(-1), axis=1).reshape(
            H, wx * wy, wx * wy
        )
    else:
        local_bias = _skew_local_bias(wx, wy, H, table)
    if nglo > 0:
        nloc = wx * wy
        # rows for global queries: [g2g ‖ g2l[0]·1_Nloc]
        glo_rows = jnp.concatenate(
            [g2g, jnp.broadcast_to(g2l[0][:, :, None], (H, nglo, nloc))],
            axis=-1,
        )
        # rows for local queries: [g2l[1]·1_Nloc ‖ local]
        loc_rows = jnp.concatenate(
            [
                jnp.broadcast_to(g2l[1][:, None, :], (H, nloc, nglo)),
                local_bias,
            ],
            axis=-1,
        )
        return jnp.concatenate([glo_rows, loc_rows], axis=1)  # (H, N, N)
    return local_bias


class FullAttention(nn.Module):
    """Dense multi-head self-attention (msvit.py:37-120)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rpe: bool = False
    wx: int = 14
    wy: int = 14
    nglo: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    # tensor parallelism: shard_map the fused kernel over heads on this mesh
    # axis (None = off; see _tp_shard_call)
    tp_mesh: Any = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(
        self, x: jax.Array, nx: int, ny: int, deterministic: bool, mode: Mode = 0
    ) -> jax.Array:
        B, N, C = x.shape
        H = self.num_heads
        M = C // H
        scale = M ** -0.5

        qkv = nn.Dense(
            3 * self.dim,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name="qkv",
        )(x)

        bias_params = None
        bias_cached = None
        if self.rpe:
            assert N == self.nglo + self.wx * self.wy, (
                "For relative position, N != nglo + wx*wy"
            )
            bias_params = self._rpe_params(H)
            # INFERENCE bias cache (r5): XLA does not hoist the
            # loop-invariant (H, N, N) assembly out of serving loops — at
            # 1024² it is ~110 of the 175 ms forward. models.
            # precompute_rpe_cache() populates an optional 'rpe_cache'
            # collection once; deterministic applies then reuse it.
            # Training (deterministic=False) ignores the cache: a cached
            # bias would silently detach the table gradients.
            # never during init: init makes EVERY collection mutable, and a
            # cache created there would silently serve the init-time bias
            # to any later deterministic apply (e.g. eval mid-training)
            if deterministic and not self.is_initializing() and (
                self.has_variable("rpe_cache", "bias")
                or self.is_mutable_collection("rpe_cache")
            ):
                bias_cached = self.variable(
                    "rpe_cache", "bias",
                    lambda: _assemble_full_rpe_bias(
                        self.wx, self.wy, self.nglo, H, *bias_params
                    ),
                ).value

        def _bias():
            """Assembled only on the branches that consume it — the fused
            RPE path assembles inside its custom VJP instead, and an eager
            top-level assembly would materialize the (H, N, N) tensor
            (403 MB/block at 1024²) even where DCE can't run (non-jit
            apply, interpret-mode debugging)."""
            if bias_params is None:
                return None
            if bias_cached is not None:
                return bias_cached
            return _assemble_full_rpe_bias(
                self.wx, self.wy, self.nglo, H, *bias_params
            )

        # Fused Pallas path: single-pass whole-sequence softmax kernel —
        # no (B, H, N, N) f32 score tensor in HBM, no head-split transpose.
        # Falls back to XLA when attention dropout is active or the shapes
        # exceed the kernel's VMEM budget.
        attn_drop_active = self.attn_drop > 0.0 and not deterministic
        tp_n = 1
        if self.tp_mesh is not None:
            tp_n = int(dict(self.tp_mesh.shape).get(self.tp_axis, 1))
        head_shard = tp_n > 1 and H % tp_n == 0
        n_loc = tp_n if head_shard else 1
        if (
            self.use_pallas
            and not attn_drop_active
            and (
                full_attention.supported(
                    B, N, C // n_loc, H // n_loc, self.rpe
                )
                # huge-N escape (1024² s=0 stages): q-tiled kernel, bias
                # streamed when RPE
                or full_attention.supported_tiled(
                    B, N, C // n_loc, H // n_loc, self.rpe
                )
            )
            and (jax.default_backend() == "tpu" or full_attention.INTERPRET)
        ):
            q_tok, k_tok, v_tok = jnp.split(qkv, 3, axis=-1)
            if head_shard:
                from jax.sharding import PartitionSpec as P

                bias = _bias()
                bias_f = None if bias is None else bias.astype(jnp.float32)
                fused = full_attention.make_fused_full_attention(H // n_loc)
                tok = P(_tp_batch_axis(self.tp_mesh, B), None, self.tp_axis)
                out = _tp_shard_call(
                    self.tp_mesh, self.tp_axis, fused,
                    (tok, tok, tok, P(self.tp_axis, None, None)), tok,
                    (q_tok * scale, k_tok, v_tok, bias_f),
                )
            elif self.rpe and bias_cached is not None:
                # precomputed-cache inference path: the assembled bias is a
                # plain input (no VJP trick needed without grads)
                fused = full_attention.make_fused_full_attention(H)
                out = fused(q_tok * scale, k_tok, v_tok,
                            bias_cached.astype(jnp.float32))
            elif self.rpe:
                # RPE: the custom VJP encloses the bias ASSEMBLY — residuals
                # are the table params, and the backward rebuilds the
                # (H, N, N) tensor instead of 403 MB/block residuals at
                # 1024² (full_attention.make_fused_full_attention_rpe)
                import functools as _ft

                assemble = _ft.partial(
                    _assemble_full_rpe_bias, self.wx, self.wy, self.nglo, H
                )
                fused = full_attention.make_fused_full_attention_rpe(
                    H, assemble
                )
                out = fused(q_tok * scale, k_tok, v_tok, *bias_params)
            else:
                fused = full_attention.make_fused_full_attention(H)
                out = fused(q_tok * scale, k_tok, v_tok, None)
            out = nn.Dense(
                self.dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=trunc_normal_init,
                name="proj",
            )(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        q, k, v = (
            _split_heads(t, H) for t in jnp.split(qkv, 3, axis=-1)
        )

        attn = jnp.einsum(
            "bhnm,bhtm->bhnt", q, k, preferred_element_type=jnp.float32
        ) * scale

        bias = _bias()
        if bias is not None:
            attn = attn + bias[None].astype(attn.dtype)

        probs = _softmax_max_sub(attn)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum(
            "bhnt,bhtm->bhnm",
            probs.astype(self.dtype),
            v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = _merge_heads(out)
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name="proj",
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

    def _rpe_params(self, H: int):
        """Create the RPE parameter leaves (same names/shapes as before —
        checkpoint-compatible); assembly lives in
        :func:`_assemble_full_rpe_bias` so the fused custom VJP can enclose
        it (saving table params instead of the (H, N, N) tensor)."""
        table = self.param(
            "local_relative_position_bias_table",
            trunc_normal_init,
            ((2 * self.wx - 1) * (2 * self.wy - 1), H),
            self.param_dtype,
        )
        if self.nglo > 0:
            g2l = self.param(
                "g2l_relative_position_bias",
                trunc_normal_init,
                (2, H, self.nglo),
                self.param_dtype,
            )
            g2g = self.param(
                "g2g_relative_position_bias",
                trunc_normal_init,
                (H, self.nglo, self.nglo),
                self.param_dtype,
            )
            return (table, g2l, g2g)
        return (table,)



class VilAttention(nn.Module):
    """2-D sliding-chunk self-attention with global tokens (longformer2d.py).

    ``mode`` semantics (longformer2d.py:113-124, slidingchunk_2d.py:15-24):
    0 = all 8 neighbor blocks, -1 = self block only, 1..8 = self + one block
    (traced array allowed: the random-shift training path samples the block
    on device each step). ``use_pallas`` switches the local attention core to
    the fused Pallas kernel when supported (mode 0/-1, no attention dropout).
    """

    dim: int
    num_heads: int
    w: int = 7
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    nglo: int = 1
    sharew: bool = True
    only_glo: bool = False
    exact: int = 0
    rpe: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    # tensor parallelism: shard_map the fused kernels over heads on this
    # mesh axis (None = off; see _tp_shard_call)
    tp_mesh: Any = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(
        self, x, nx: int, ny: int, deterministic: bool, mode: Mode = 0
    ):
        """``x`` is either token layout (B, Nglo+nx·ny, C) → returns the same,
        or the persistent chunked pair ``(x_glo (B, Nglo, C) | None,
        x_img (B, mx, my, W², C))`` → returns the same pair. The chunked form
        is the stage-resident hot path: chunkify/unchunkify happen ONCE per
        stage (msvit.forward_features), not per block."""
        chunked_in = isinstance(x, (tuple, list))
        H, W = self.num_heads, self.w
        W2 = W * W
        Nglo = self.nglo
        Nloc = nx * ny
        if chunked_in:
            x_glo, x_img = x
            B, C = x_img.shape[0], x_img.shape[-1]
            assert (0 if x_glo is None else x_glo.shape[1]) == Nglo
            assert not self.only_glo, "only-global mode uses token layout"
        else:
            B, N, C = x.shape
            assert Nglo + Nloc == N, "Global dimension does not match!"
        M = C // H
        if self.only_glo:
            assert Nglo >= 1, "Nglo == 0 in the only global mode!"
        scale = M ** -0.5
        traced_mode = not isinstance(mode, (int, np.integer))

        # RPE parameter tables, declared once (used by both the local and the
        # global attention branches)
        if self.rpe:
            rpe_table = self.param(
                "local_relative_position_bias_table",
                trunc_normal_init,
                ((4 * W - 1) * (4 * W - 1), H),
                self.param_dtype,
            )
            if Nglo >= 1:
                g2l = self.param(
                    "g2l_relative_position_bias",
                    trunc_normal_init,
                    (2, H, Nglo),
                    self.param_dtype,
                )
                g2g = self.param(
                    "g2g_relative_position_bias",
                    trunc_normal_init,
                    (H, Nglo, Nglo),
                    self.param_dtype,
                )

        dense = lambda feat, name: nn.Dense(
            feat,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name=name,
        )
        query = dense(self.dim, "query")
        kv = dense(2 * self.dim, "kv")
        proj = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init,
            name="proj",
        )

        # local attention: queries are local tokens, keys/values all tokens.
        # Per-head views are taken lazily via reshape inside einsums ('bnhm'
        # forms) so no head-split transpose is ever materialized on the hot
        # path. In chunked mode the projections run directly on the
        # (B, mx, my, W², C) stage-resident tensor (Dense is per-token).
        heads4 = lambda t: t.reshape(t.shape[0], t.shape[1], H, M)

        # fused attention-BLOCK path: the QKV and output projections run
        # INSIDE the whole-image Pallas kernel (vil_block.py), so no conv
        # output ever feeds the custom call and the relayout copies vanish.
        # Static mode 0, no attention dropout, shared or unshared weights;
        # init runs the classic path (creating the identical Dense param
        # tree the fused path then reads raw).
        tp_n0 = 1
        if self.tp_mesh is not None:
            tp_n0 = int(dict(self.tp_mesh.shape).get(self.tp_axis, 1))
        use_fused_block = (
            FUSED_BLOCK
            and chunked_in
            and not self.only_glo
            and self.use_pallas
            and tp_n0 == 1
            and not (self.attn_drop > 0.0 and not deterministic)
            and not traced_mode
            and isinstance(mode, (int, np.integer)) and int(mode) == 0
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or vil_block.INTERPRET)
            and vil_block.block_fits(x_img, H, Nglo, self.rpe)
        )
        if chunked_in:
            if Nglo >= 1:
                kg_tok, vg_tok = jnp.split(kv(x_glo), 2, axis=-1)
            else:
                kg_tok = jnp.zeros((B, 0, C), self.dtype)
                vg_tok = kg_tok
            if not use_fused_block:
                q_img_c = query(x_img) * scale  # (B, mx, my, W², C)
                k_img_c, v_img_c = jnp.split(kv(x_img), 2, axis=-1)
        else:
            q_tok = query(x[:, Nglo:]) * scale  # (B, Nloc, C)
            k_tok, v_tok = jnp.split(kv(x), 2, axis=-1)  # (B, N, C)
            kg_tok, vg_tok = k_tok[:, :Nglo], v_tok[:, :Nglo]

        if self.only_glo:
            # NOTE: the reference adds no RPE bias on the only-global path
            # (longformer2d.py:130-132 bypasses the rpe block at :159).
            attn1 = jnp.einsum(
                "bnhm,bthm->bhnt", heads4(q_tok), heads4(kg_tok),
                preferred_element_type=jnp.float32,
            )
            probs = _softmax_max_sub(attn1)
            probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
            x1 = jnp.einsum(
                "bhnt,bthm->bnhm",
                probs.astype(self.dtype),
                heads4(vg_tok),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype).reshape(B, Nloc, C)
        else:
            padx, pady, mx, my = sc.chunk_grid(nx, ny, W)

            # Fused Pallas path: full-neighborhood mode, no attention dropout
            # (all reference configs train with attn_drop=0). Falls back to
            # the XLA tier otherwise.
            attn_drop_active = self.attn_drop > 0.0 and not deterministic
            on_tpu = jax.default_backend() == "tpu"
            use_fused = (
                self.use_pallas
                and not use_fused_block
                and not traced_mode
                and int(mode) == 0
                and not attn_drop_active
                and (on_tpu or vil_kernel.INTERPRET)
            )
            # sampled-neighbor modes (random-shift training, MODE > 0): the
            # sampled block is aligned onto the self chunk by an XLA-side
            # roll, then a per-chunk-local fused kernel attends to
            # [self ‖ sampled ‖ glo] (vil_mode_kernel). exact==1 has no
            # mode>0 mask tables (masks.invalid_mask raises in either tier).
            use_fused_mode = (
                self.use_pallas
                and (traced_mode or int(mode) > 0)
                and self.exact != 1
                and not attn_drop_active
                and (on_tpu or vil_mode_kernel.INTERPRET)
            )
            # tensor parallelism: split the fused kernels over heads via
            # shard_map (GSPMD cannot partition a custom call)
            tp_n = 1
            if self.tp_mesh is not None:
                tp_n = int(dict(self.tp_mesh.shape).get(self.tp_axis, 1))
            head_shard = tp_n > 1 and H % tp_n == 0
            n_loc = tp_n if head_shard else 1
            def _front_bias():
                """RPE bias in FRONT column order (H, W², Nglo+9W²) | None."""
                if not self.rpe:
                    return None
                idx = jnp.asarray(rpe_lib.sliding_chunk_rpe_index(W))
                local_bias = rpe_table[idx.reshape(-1)].reshape(W2, 9 * W2, H)
                local_bias = local_bias.transpose(2, 0, 1)  # (H, W², 9W²)
                if Nglo >= 1:
                    g2l_cols = jnp.broadcast_to(
                        g2l[1][:, None, :], (H, W2, Nglo)
                    )
                    return jnp.concatenate(
                        [g2l_cols, local_bias], axis=-1
                    ).astype(jnp.float32)
                return local_bias.astype(jnp.float32)

            if use_fused_block:
                mask_bool = masks_lib.invalid_mask(
                    mx, my, padx, pady, W, self.exact, 0
                )
                mask_add = vil_kernel.mask_to_additive(
                    mask_bool, mx, my, W2, Nglo
                )
                # raw projection params (same leaves the Dense modules own;
                # reading them keeps autodiff exact and the tree identical)
                pp = self.variables["params"]
                cd = self.dtype
                wq_p = pp["query"]["kernel"]
                bq_p = pp["query"].get("bias") if self.qkv_bias else None
                wkv_p = pp["kv"]["kernel"]
                bkv_p = pp["kv"].get("bias") if self.qkv_bias else None
                wo_p = pp["proj"]["kernel"]
                bo_p = pp["proj"]["bias"]
                f32 = jnp.float32
                fusedb = vil_block.make_fused_vil_block(mask_add, H)
                x1, k_img_c, v_img_c = fusedb(
                    x_img,
                    (wq_p * scale).astype(cd),
                    None if bq_p is None else (bq_p * scale).astype(f32)[None],
                    wkv_p[:, :C].astype(cd),
                    None if bkv_p is None else bkv_p[:C].astype(f32)[None],
                    wkv_p[:, C:].astype(cd),
                    None if bkv_p is None else bkv_p[C:].astype(f32)[None],
                    wo_p.astype(cd),
                    bo_p.astype(f32)[None],
                    kg_tok if Nglo >= 1 else None,
                    vg_tok if Nglo >= 1 else None,
                    _front_bias(),
                )  # x1 is the PROJECTED output; k/v feed the global branch
            elif use_fused:
                mask_bool = masks_lib.invalid_mask(mx, my, padx, pady, W, self.exact, 0)
                mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, W2, Nglo)
                bias_full = _front_bias()
                fused = vil_kernel.make_fused_vil_attention_mh(
                    mask_add, H // n_loc
                )
                if chunked_in:
                    f_args = (
                        q_img_c, k_img_c, v_img_c,
                        kg_tok if Nglo >= 1 else None,
                        vg_tok if Nglo >= 1 else None,
                        bias_full,
                    )
                else:
                    f_args = (
                        sc.chunkify(q_tok, nx, ny, W),
                        sc.chunkify(k_tok[:, Nglo:], nx, ny, W),
                        sc.chunkify(v_tok[:, Nglo:], nx, ny, W),
                        kg_tok if Nglo >= 1 else None,
                        vg_tok if Nglo >= 1 else None,
                        bias_full,
                    )
                if head_shard:
                    from jax.sharding import PartitionSpec as P

                    dn = _tp_batch_axis(self.tp_mesh, B)
                    chans = P(dn, None, None, None, self.tp_axis)
                    glo = P(dn, None, self.tp_axis)
                    x1 = _tp_shard_call(
                        self.tp_mesh, self.tp_axis, fused,
                        (chans, chans, chans, glo, glo,
                         P(self.tp_axis, None, None)),
                        chans, f_args,
                    )
                else:
                    x1 = fused(*f_args)
                if not chunked_in:
                    x1 = sc.unchunkify(x1, nx, ny, W)  # (B, Nloc, C)
            elif use_fused_mode:
                if chunked_in:
                    q_img, k_img_m, v_img_m = q_img_c, k_img_c, v_img_c
                else:
                    q_img = sc.chunkify(q_tok, nx, ny, W)
                    k_img_m = sc.chunkify(k_tok[:, Nglo:], nx, ny, W)
                    v_img_m = sc.chunkify(v_tok[:, Nglo:], nx, ny, W)
                # sampled-block alignment: static-roll lax.switch branches
                # for traced modes (one slice+concat copy, not a dynamic
                # doubled-array roll — see sc.sampled_roll)
                knb = sc.sampled_roll(k_img_m, mode)
                vnb = sc.sampled_roll(v_img_m, mode)
                # row-class mask table + static class_of: the whole-image
                # mode kernels take ONE combined bias+mask table (a single
                # VPU score add; see mode_tail_mask_classes)
                mask_tail, mode_class_of = vil_mode_kernel.mode_tail_mask_classes(
                    mx, my, padx, pady, W, self.exact, mode, Nglo
                )
                bias_tail = None
                if self.rpe:
                    if traced_mode:
                        idx = jnp.asarray(rpe_lib.all_mode_rpe_indices(W))[mode - 1]
                    else:
                        idx = jnp.asarray(
                            rpe_lib.sliding_chunk_rpe_index_mode(W, int(mode))
                        )
                    local_bias = rpe_table[idx.reshape(-1)].reshape(W2, 2 * W2, H)
                    local_bias = local_bias.transpose(2, 0, 1)  # (H, W², 2W²)
                    if Nglo >= 1:
                        g2l_cols = jnp.broadcast_to(
                            g2l[1][:, None, :], (H, W2, Nglo)
                        )
                        bias_tail = jnp.concatenate([local_bias, g2l_cols], axis=-1)
                    else:
                        bias_tail = local_bias
                    bias_tail = bias_tail.astype(jnp.float32)
                fused = vil_mode_kernel.make_fused_mode_attention(
                    H // n_loc, class_of=mode_class_of
                )
                f_args = (
                    q_img, k_img_m, knb, v_img_m, vnb,
                    kg_tok if Nglo >= 1 else None,
                    vg_tok if Nglo >= 1 else None,
                    bias_tail, mask_tail,
                )
                if head_shard:
                    from jax.sharding import PartitionSpec as P

                    dn = _tp_batch_axis(self.tp_mesh, B)
                    chans = P(dn, None, None, None, self.tp_axis)
                    glo = P(dn, None, self.tp_axis)
                    x1 = _tp_shard_call(
                        self.tp_mesh, self.tp_axis, fused,
                        (chans, chans, chans, chans, chans, glo, glo,
                         P(self.tp_axis, None, None), P()),
                        chans, f_args,
                    )
                else:
                    x1 = fused(*f_args)  # (B, mx, my, W², C)
                if not chunked_in:
                    x1 = sc.unchunkify(x1, nx, ny, W)  # (B, Nloc, C)
            else:
                # pure-XLA tier (also handles mode -1 and attn dropout)
                if chunked_in:
                    chunk5 = lambda t5: t5.reshape(
                        B, mx, my, W2, H, M
                    ).transpose(0, 4, 1, 2, 3, 5)
                    q_img = chunk5(q_img_c)
                    k_img = chunk5(k_img_c)
                    v_img = chunk5(v_img_c)
                else:
                    chunk = lambda t4: sc.chunkify(
                        t4.transpose(0, 2, 1, 3).reshape(B * H, -1, M), nx, ny, W
                    ).reshape(B, H, mx, my, W2, M)
                    q_img = chunk(heads4(q_tok))
                    k_img = chunk(heads4(k_tok[:, Nglo:]))
                    v_img = chunk(heads4(v_tok[:, Nglo:]))
                k_glo = heads4(kg_tok).transpose(0, 2, 1, 3)  # (B, H, Nglo, M)
                v_glo = heads4(vg_tok).transpose(0, 2, 1, 3)
                # local→global scores: (B, H, mx, my, W², Nglo)
                attn10 = jnp.einsum(
                    "bhmnlc,bhtc->bhmnlt", q_img, k_glo,
                    preferred_element_type=jnp.float32,
                )
                # local→local scores via sliding chunks
                flat = lambda t: t.reshape(B * H, mx, my, W2, -1)
                attn11 = sc.sliding_chunk_qk(flat(q_img), flat(k_img), mode)
                kv_span = attn11.shape[-1]
                attn11 = attn11.reshape(B, H, mx, my, W2, kv_span)

                if self.rpe:
                    if Nglo >= 1:
                        attn10 = attn10 + g2l[1][None, :, None, None, None, :]
                    if traced_mode:
                        idx = jnp.asarray(rpe_lib.all_mode_rpe_indices(W))[mode - 1]
                    else:
                        idx = jnp.asarray(
                            rpe_lib.sliding_chunk_rpe_index_mode(W, int(mode))
                        )
                    local_bias = rpe_table[idx.reshape(-1)].reshape(W2, kv_span, H)
                    local_bias = local_bias.transpose(2, 0, 1)  # (H, W², kv)
                    attn11 = attn11 + local_bias[None, :, None, None, :, :]

                # validity mask (static tables; per-mode stack for traced mode)
                if traced_mode:
                    mask = jnp.asarray(
                        masks_lib.all_mode_masks(mx, my, padx, pady, W, self.exact)
                    )[mode - 1].reshape(1, 1, mx, my, 1, kv_span)
                else:
                    mask_np = masks_lib.invalid_mask(
                        mx, my, padx, pady, W, self.exact, int(mode)
                    )
                    if mask_np.ndim == 2:
                        mask = jnp.asarray(mask_np).reshape(1, 1, mx, my, 1, kv_span)
                    else:  # exact variant: per-query-pixel mask
                        mask = jnp.asarray(mask_np).reshape(1, 1, mx, my, W2, kv_span)
                attn11 = jnp.where(mask, -jnp.inf, attn11)

                # joint softmax over [global keys ‖ local keys]
                attn1 = jnp.concatenate([attn10, attn11], axis=-1)
                probs = _softmax_max_sub(attn1)
                probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
                probs = probs.astype(self.dtype)
                probs_glo, probs_loc = probs[..., :Nglo], probs[..., Nglo:]

                x1 = sc.sliding_chunk_av(
                    probs_loc.reshape(B * H, mx, my, W2, kv_span), flat(v_img), mode
                ).reshape(B, H, mx, my, W2, M)
                if Nglo >= 1:
                    x1 = x1 + jnp.einsum(
                        "bhmnlt,bhtc->bhmnlc", probs_glo, v_glo,
                        preferred_element_type=jnp.float32,
                    ).astype(self.dtype)
                if chunked_in:
                    x1 = x1.astype(self.dtype).transpose(
                        0, 2, 3, 4, 1, 5
                    ).reshape(B, mx, my, W2, C)
                else:
                    x1 = sc.unchunkify(
                        x1.reshape(B * H, mx, my, W2, M), nx, ny, W
                    ).reshape(B, H, Nloc, M)
                    x1 = _merge_heads(x1.astype(self.dtype))  # (B, Nloc, C)

        if not use_fused_block:
            x1 = proj(x1.astype(self.dtype))  # fused block already projected
        drop = lambda t: nn.Dropout(self.proj_drop)(t, deterministic=deterministic)

        if Nglo == 0:
            return (None, drop(x1)) if chunked_in else drop(x1)

        # global branch: vanilla dense attention over all tokens
        # (longformer2d.py:209-227). In chunked mode the local keys/values
        # arrive in chunk order — softmax attention is permutation-invariant
        # over keys, and pad positions (if any) are masked out below.
        if self.sharew:
            query_g, proj_g = query, proj
            # kv_global ≡ kv when weights are shared: reuse the local
            # branch's K/V instead of recomputing the (N, 2C) projection
            # (the reference recomputes it — numerically identical)
            if chunked_in:
                kg_src, vg_src, k_img_src, v_img_src = (
                    kg_tok, vg_tok, k_img_c, v_img_c
                )
            else:
                k_all4, v_all4 = heads4(k_tok), heads4(v_tok)
        else:
            query_g = dense(self.dim, "query_global")
            kv_g = dense(2 * self.dim, "kv_global")
            proj_g = nn.Dense(
                self.dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=trunc_normal_init,
                name="proj_global",
            )
            if chunked_in:
                kg_src, vg_src = jnp.split(kv_g(x_glo), 2, axis=-1)
                k_img_src, v_img_src = jnp.split(kv_g(x_img), 2, axis=-1)
            else:
                k_all4, v_all4 = (
                    heads4(t) for t in jnp.split(kv_g(x), 2, axis=-1)
                )
        qg4 = heads4(
            query_g(x_glo if chunked_in else x[:, :Nglo]) * scale
        )
        # scores/AV as elementwise-multiply + reductions over the token axis:
        # with Nglo ~ 1 the einsum forms are degenerate single-row GEMMs that
        # lower poorly on TPU (measured 3× slower than mul+reduce on v5e,
        # benchmarks/block_anatomy.py) — one pass over K, one over V.
        qg_t = qg4.transpose(0, 2, 1, 3)  # (B, H, Nglo, M)
        drop0 = nn.Dropout(self.attn_drop)
        if chunked_in:
            # chunked-native two-part softmax: the local keys stay in the
            # stage-resident (B, mx, my, W², C) layout — flattening to token
            # layout costs a (B, N, H, M) relayout copy each way, fwd AND
            # bwd (measured ~1.3 ms/step in the train profile). Softmax over
            # the partitioned key set [glo ‖ local] is exact via the shared
            # running max / denominator.
            _, mxc, myc, _, _ = x_img.shape
            k6 = k_img_src.reshape(B, mxc, myc, W2, H, M)  # free reshapes
            v6 = v_img_src.reshape(B, mxc, myc, W2, H, M)
            kg4 = heads4(kg_src)  # (B, Nglo, H, M)
            vg4 = heads4(vg_src)
            s_loc = jnp.sum(
                (k6[:, :, :, :, :, None, :]
                 * qg_t[:, None, None, None]).astype(jnp.float32),
                axis=-1,
            )  # (B, mx, my, W², H, Nglo)
            s_glo = jnp.sum(
                (kg4[:, :, :, None, :] * qg_t[:, None]).astype(jnp.float32),
                axis=-1,
            )  # (B, Nglo_k, H, Nglo)
            if self.rpe:
                s_glo = s_glo + g2g.transpose(2, 0, 1)[None]
                s_loc = s_loc + g2l[0][None, None, None, None]  # (H, Nglo)
            if mxc * myc * W2 != Nloc:
                # padded chunk grid: mask pad-key positions (global queries
                # must only see real tokens)
                valid = masks_lib.chunk_valid(nx, ny, W)
                s_loc = jnp.where(
                    jnp.asarray(valid)[None, :, :, :, None, None],
                    s_loc, -jnp.inf,
                )
            m0 = jnp.maximum(
                jax.lax.stop_gradient(jnp.max(s_loc, axis=(1, 2, 3))),
                jax.lax.stop_gradient(jnp.max(s_glo, axis=1)),
            )  # (B, H, Nglo)
            e_loc = jnp.exp(s_loc - m0[:, None, None, None])
            e_glo = jnp.exp(s_glo - m0[:, None])
            den = e_loc.sum(axis=(1, 2, 3)) + e_glo.sum(axis=1)
            p_loc = drop0(e_loc / den[:, None, None, None],
                          deterministic=deterministic)
            p_glo = drop0(e_glo / den[:, None], deterministic=deterministic)
            x0 = jnp.sum(
                (p_loc[..., None].astype(self.dtype)
                 * v6[:, :, :, :, :, None, :]).astype(jnp.float32),
                axis=(1, 2, 3),
            ) + jnp.sum(
                (p_glo[..., None].astype(self.dtype)
                 * vg4[:, :, :, None, :]).astype(jnp.float32),
                axis=1,
            )  # (B, H, Nglo, M)
        else:
            n_cols = k_all4.shape[1]
            attn0 = jnp.sum(
                (k_all4[:, :, :, None, :] * qg_t[:, None]).astype(jnp.float32),
                axis=-1,
            )  # (B, T, H, Nglo)
            if self.rpe:
                bias = jnp.concatenate(
                    [
                        g2g,
                        jnp.broadcast_to(
                            g2l[0][:, :, None], (H, Nglo, n_cols - Nglo)
                        ),
                    ],
                    axis=-1,
                )  # (H, Nglo, T)
                attn0 = attn0 + bias.transpose(2, 0, 1)[None]
            probs0 = _softmax_max_sub(attn0, axis=1)
            probs0 = drop0(probs0, deterministic=deterministic)
            x0 = jnp.sum(
                (
                    probs0.astype(self.dtype)[..., None]
                    * v_all4[:, :, :, None, :]
                ).astype(jnp.float32),
                axis=1,
            )  # (B, H, Nglo, M)
        x0 = (
            x0.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, Nglo, C)
        )
        x0 = proj_g(x0)

        if chunked_in:
            return (drop(x0), drop(x1))

        out = jnp.concatenate([x0, x1], axis=1)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
