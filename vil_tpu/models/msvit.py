"""MsViT: multi-stage vision transformer with pluggable attention.

TPU-native rebuild of the reference model (/root/reference/src/models/msvit.py:343-548):
ResNet-style stage stacking, per-stage conv patch embedding with factorized
absolute position embedding and global tokens, pre-LN attention + MLP blocks
with stochastic-depth residuals, and an ARCH-string DSL selecting heads/dims/
blocks/attention per stage.

Differences by design (TPU-first, not a port):
* NHWC image layout, bf16 compute / f32 params.
* Stochastic depth, dropout, and the random-shift attention mode are
  functional: RNGs and the mode index are threaded through ``__call__``.
* The performer's projection redraw and the VIL mode switch are train-loop
  concerns (functional state), not module mutation.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sliding_chunk as sc
from .arch import StageCfg, parse_arch
from .attention import FullAttention, VilAttention
from .attention_efficient import (
    LinformerAttention,
    PerformerAttention,
    SRAttention,
)
from .layers import DropPath, Mlp, PatchEmbed, make_layer_norm, trunc_normal_init

Mode = Union[int, jax.Array]

# All names the reference accepts for the sliding-chunk ViL attention
# (src/config/defaults.py:144-145). 'longformer_cuda' selected its external
# TVM/CUDA kernel; the Pallas kernels here ARE that path's replacement, so
# all three alias to the same implementation.
LONGFORMER_TYPES = ("longformerhand", "longformerauto", "longformer_cuda")


class AttnBlock(nn.Module):
    """Pre-LN attention block with DropPath residual (msvit.py:245-316)."""

    dim: int
    num_heads: int
    attn_type: str
    seq_len: int
    nglo: int = 1
    w: int = 7
    num_feats: int = 256
    rratio: int = 2
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sharew: bool = True
    only_glo: bool = False
    share_kv: bool = True
    sw_exact: int = 0
    rpe: bool = False
    wx: int = 14
    wy: int = 14
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    fused_ln: bool = False
    # tensor parallelism: shard_map the fused kernels over heads on this
    # mesh axis (None = off; models/attention._tp_shard_call)
    tp_mesh: Any = None
    tp_axis: str = "model"

    def setup(self):
        self.norm = make_layer_norm(
            self.fused_ln, epsilon=self.ln_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name=None,
        )
        common = dict(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.attn_type == "full":
            self.attn = FullAttention(
                rpe=self.rpe, wx=self.wx, wy=self.wy, nglo=self.nglo,
                use_pallas=self.use_pallas, tp_mesh=self.tp_mesh,
                tp_axis=self.tp_axis, **common
            )
        elif self.attn_type in LONGFORMER_TYPES:
            # hand/auto differed only in torch-autograd strategy and _cuda in
            # kernel backend; in JAX the backward is autodiff/custom-vjp
            # either way, so all three names map here.
            self.attn = VilAttention(
                w=self.w,
                nglo=self.nglo,
                sharew=self.sharew,
                only_glo=self.only_glo,
                exact=self.sw_exact,
                rpe=self.rpe,
                use_pallas=self.use_pallas,
                tp_mesh=self.tp_mesh,
                tp_axis=self.tp_axis,
                **common,
            )
        elif self.attn_type == "linformer":
            self.attn = LinformerAttention(
                seq_len=self.seq_len,
                num_feats=self.num_feats,
                share_kv=self.share_kv,
                **common,
            )
        elif self.attn_type == "srformer":
            self.attn = SRAttention(rratio=self.rratio, **common)
        elif self.attn_type == "performer":
            self.attn = PerformerAttention(nb_features=self.num_feats, **common)
        else:
            raise ValueError(f"Not supported attention type {self.attn_type}")
        self.droppath = DropPath(self.drop_path)

    def __call__(
        self, x, nx: int, ny: int, deterministic: bool, mode: Mode = 0
    ):
        if isinstance(x, (tuple, list)):
            # persistent chunked layout: x = (x_glo | None, x_img chunked)
            x_glo, x_img = x
            y = self.attn(
                (None if x_glo is None else self.norm(x_glo), self.norm(x_img)),
                nx, ny, deterministic, mode,
            )
            y_glo, y_img = self.droppath(y, deterministic)
            return (
                None if x_glo is None else x_glo + y_glo,
                x_img + y_img,
            )
        y = self.attn(self.norm(x), nx, ny, deterministic, mode)
        return x + self.droppath(y, deterministic)


class MlpBlock(nn.Module):
    """Pre-LN MLP block with DropPath residual (msvit.py:319-340)."""

    dim: int
    out_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # None = auto by dtype (tanh-approx GELU in bf16; exact erf otherwise)
    gelu_approx: Optional[bool] = None
    fused_ln: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        out_dim = self.out_dim or self.dim
        norm = make_layer_norm(
            self.fused_ln,
            epsilon=self.ln_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )
        mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=out_dim,
            drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            gelu_approx=self.gelu_approx,
            name="mlp",
        )
        droppath = DropPath(self.drop_path, name="droppath")
        if isinstance(x, (tuple, list)):
            # persistent chunked layout (all ops here are per-token)
            assert out_dim == self.dim, "dim change unsupported in chunk layout"
            x_glo, x_img = x
            y_glo = None if x_glo is None else mlp(norm(x_glo), deterministic)
            import os as _os

            if _os.environ.get("VIL_TPU_FLAT_MLP", "0") == "1":
                # A/B knob: run the MLP on a flattened (B, L, C) view — the
                # 5-D chunked shapes carry pallas-pinned layouts and their
                # MLP GEMMs lower as generic fusions (22.1 ms = 45% of the
                # 512² train step; ~6× the FLOP floor at stage-1 shapes).
                # A contiguous merge is layout-free IF XLA agrees; if it
                # inserts relayout copies instead, this loses (the
                # FLAT_OPT lesson) — measured, not assumed.
                B, mx, my, w2, C = x_img.shape
                y_img = mlp(
                    norm(x_img.reshape(B, mx * my * w2, C)), deterministic
                ).reshape(B, mx, my, w2, C)
            else:
                y_img = mlp(norm(x_img), deterministic)
            y_glo, y_img = droppath((y_glo, y_img), deterministic)
            return (
                None if x_glo is None else x_glo + y_glo,
                x_img + y_img,
            )
        y = droppath(mlp(norm(x), deterministic), deterministic)
        if out_dim != self.dim:
            shortcut = nn.Dense(
                out_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=trunc_normal_init,
                name="shortcut",
            )(x)
            shortcut = nn.Dropout(self.drop)(shortcut, deterministic=deterministic)
            return shortcut + y
        return x + y


class MsViT(nn.Module):
    """Multi-stage ViT (msvit.py:343-548). Input NHWC images."""

    arch: str
    img_size: int = 512
    in_chans: int = 3
    num_classes: int = 1000
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_embed: bool = False
    w: int = 7
    sharew: bool = False
    only_glo: bool = False
    share_kv: bool = False
    attn_type: str = "longformerhand"
    sw_exact: int = 0
    mode: int = 0
    ln_eps: float = 1e-6
    avg_pool: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    # fused Pallas LayerNorm in the per-block pre-norms (TPU.FUSED_LN)
    fused_ln: bool = False
    # None = auto by dtype (tanh-approx GELU in bf16; exact erf otherwise)
    gelu_approx: Optional[bool] = None
    # rematerialization of transformer blocks for training memory:
    # '' = off, 'minimal' = save MXU outputs (recompute elementwise),
    # 'full' = recompute everything (smallest memory)
    remat: str = ""
    # device-side channel normalization for uint8 inputs (INPUT.MEAN/STD)
    input_mean: tuple = (0.485, 0.456, 0.406)
    input_std: tuple = (0.229, 0.224, 0.225)
    # tensor parallelism: when set, the fused Pallas attention kernels are
    # shard_map'd over heads on this mesh axis (see parallel/tensor.py)
    tp_mesh: Any = None
    tp_axis: str = "model"

    @property
    def layer_cfgs(self) -> list[StageCfg]:
        return parse_arch(self.arch)

    @property
    def nglos(self) -> list[int]:
        return [c.nglo for c in self.layer_cfgs]

    @property
    def depth(self) -> int:
        return sum(c.num_blocks for c in self.layer_cfgs)

    @property
    def out_planes(self) -> int:
        return self.layer_cfgs[-1].dim

    def grid_sizes(self) -> list[tuple[int, int]]:
        """Static (nx, ny) token grid per stage."""
        sizes = []
        nx = ny = self.img_size
        for c in self.layer_cfgs:
            nx //= c.patch_size
            ny //= c.patch_size
            sizes.append((nx, ny))
        return sizes

    def setup(self):
        cfgs = self.layer_cfgs
        grids = self.grid_sizes()
        attn_cls, mlp_cls = AttnBlock, MlpBlock
        if self.remat:
            policy = (
                jax.checkpoint_policies.dots_saveable
                if self.remat == "minimal" else None
            )
            # all non-array call args (nx, ny, deterministic, mode) are
            # static under remat — so remat requires a STATIC vil mode
            # (random-shift training with MODE>0 passes a traced mode and is
            # not combinable with remat; use remat='' there)
            attn_cls = nn.remat(
                AttnBlock, policy=policy, static_argnums=(2, 3, 4, 5)
            )
            mlp_cls = nn.remat(MlpBlock, policy=policy, static_argnums=(2,))
        # stochastic depth decay rule (msvit.py:419-421)
        dprs = np.linspace(0, self.drop_path_rate, self.depth)
        patch_embeds = []
        stage_blocks = []
        stage_chunked = []
        i_block = 0
        # the reference mutates the SHARED attn_args dict when a stage has
        # s=0 (msvit.py:460-461), so 'full' is sticky: every stage after the
        # first s=0 stage is full attention even if it declares s=1
        sticky_full = False
        for sid, (c, (nx, ny)) in enumerate(zip(cfgs, grids)):
            patch_embeds.append(
                PatchEmbed(
                    patch_size=c.patch_size,
                    nx=nx,
                    ny=ny,
                    embed_dim=c.dim,
                    nglo=c.nglo,
                    norm_embed=self.norm_embed,
                    ape=bool(c.ape),
                    drop_rate=self.drop_rate,
                    ln_eps=self.ln_eps,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    input_mean=tuple(self.input_mean),
                    input_std=tuple(self.input_std),
                    name=f"stage{sid + 1}_patch_embed",
                )
            )
            sticky_full = sticky_full or not c.is_sparse_attn
            attn_type = "full" if sticky_full else self.attn_type
            # persistent chunked layout: VIL stages chunkify ONCE at stage
            # entry and keep (x_glo, x_img-chunks) through all blocks (every
            # non-attention op is per-token) — no per-block chunkify/
            # unchunkify round-trips through HBM
            stage_chunked.append(
                attn_type in LONGFORMER_TYPES
                and not self.only_glo
                and c.num_blocks > 0
            )
            blocks = []
            for bid in range(c.num_blocks):
                dpr = float(dprs[i_block])
                i_block += 1
                blocks.append(
                    (
                        AttnBlock(
                            dim=c.dim,
                            num_heads=c.num_heads,
                            attn_type=attn_type,
                            seq_len=nx * ny + c.nglo,
                            nglo=c.nglo,
                            w=c.num_feats,  # longformer window (msvit.py:459)
                            num_feats=c.num_feats,
                            rratio=c.num_feats,  # srformer reuse (msvit.py:458)
                            qkv_bias=self.qkv_bias,
                            drop=self.drop_rate,
                            attn_drop=self.attn_drop_rate,
                            drop_path=dpr,
                            sharew=self.sharew,
                            only_glo=self.only_glo,
                            share_kv=self.share_kv,
                            sw_exact=self.sw_exact,
                            rpe=c.rpe,
                            wx=nx,
                            wy=ny,
                            ln_eps=self.ln_eps,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            use_pallas=self.use_pallas,
                            fused_ln=self.fused_ln,
                            tp_mesh=self.tp_mesh,
                            tp_axis=self.tp_axis,
                            name=f"stage{sid + 1}_block{bid}_attn",
                        ),
                        MlpBlock(
                            dim=c.dim,
                            drop=self.drop_rate,
                            drop_path=dpr,
                            ln_eps=self.ln_eps,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            gelu_approx=self.gelu_approx,
                            fused_ln=self.fused_ln,
                            name=f"stage{sid + 1}_block{bid}_mlp",
                        ),
                    )
                )
            stage_blocks.append(blocks)
        self.patch_embeds = patch_embeds
        self.stage_blocks = stage_blocks
        self.stage_chunked = stage_chunked
        self.final_norm = nn.LayerNorm(
            epsilon=self.ln_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )
        self.head = (
            nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=trunc_normal_init,
                name="head",
            )
            if self.num_classes > 0
            else None
        )

    def forward_features(
        self, x: jax.Array, deterministic: bool, mode: Mode
    ) -> jax.Array:
        """``mode`` may be an int / traced scalar (one shift mode shared by
        all layers) or a traced vector of length ``depth`` — then every
        attention block draws its own mode, matching the reference's
        per-forward host sampling (longformer2d.py:116-121)."""
        per_layer = isinstance(mode, jax.Array) and mode.ndim == 1
        i_attn = 0
        B = x.shape[0]
        grids = self.grid_sizes()
        nglos = self.nglos
        for sid, (pe, blocks) in enumerate(zip(self.patch_embeds, self.stage_blocks)):
            nx, ny = grids[sid]
            if sid > 0:
                # strip global tokens, tokens → image grid (msvit.py:500-507)
                prev_nx, prev_ny = grids[sid - 1]
                x = x[:, nglos[sid - 1]:].reshape(B, prev_nx, prev_ny, -1)
            x = pe(x, deterministic)
            chunked = self.stage_chunked[sid]
            if chunked:
                g, w_s = nglos[sid], self.layer_cfgs[sid].num_feats
                x = (
                    x[:, :g] if g > 0 else None,
                    sc.chunkify(x[:, g:], nx, ny, w_s),
                )
            for attn_block, mlp_block in blocks:
                block_mode = mode[i_attn] if per_layer else mode
                i_attn += 1
                x = attn_block(x, nx, ny, deterministic, block_mode)
                x = mlp_block(x, deterministic)
            if chunked:
                x_glo, x_img = x
                loc = sc.unchunkify(x_img, nx, ny, w_s)
                x = loc if x_glo is None else jnp.concatenate([x_glo, loc], axis=1)
        x = self.final_norm(x)
        if nglos[-1] > 0 and not self.avg_pool:
            return x[:, 0]
        return jnp.mean(x, axis=1)

    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        mode: Mode = 0,
    ) -> jax.Array:
        """x: (B, H, W, C) NHWC images → (B, num_classes) logits."""
        feats = self.forward_features(x, deterministic, mode)
        if self.head is None:
            return feats
        return self.head(feats)


# parameter-path substrings excluded from weight decay, matched against the
# '/'-joined flax param path (reference no_weight_decay set msvit.py:486-492
# + substring grouping optim/__init__.py:21-40). LayerNorm modules here are
# named *norm*, so 'norm' covers norm/norm_embed/final-norm scale+bias.
NO_WEIGHT_DECAY_SUBSTRINGS = (
    "pos_embed",
    "cls_token",
    "norm",
    "relative_position",
    "head/bias",
)
