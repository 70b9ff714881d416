"""Model registry (reference /root/reference/src/models/__init__.py:9-59).

The reference also exposed the torchvision ResNet zoo; this framework keeps
the registry hook (``MODEL_REGISTRY``) but ships only the MsViT family — the
torchvision zoo was an unused convenience for the reference's experiments.
"""
from __future__ import annotations

import logging

import jax.numpy as jnp

from .arch import ARCH_ZOO, StageCfg, parse_arch
from .msvit import MsViT
from .resnet import RESNET_ZOO, ResNet, build_resnet, import_torch_resnet

MODEL_REGISTRY = {
    "msvit": MsViT,
}


def build_model(cfg, dtype=None, param_dtype=None, use_pallas=None,
                mesh=None) -> MsViT:
    """Construct the model from a config tree (cfg → kwargs mapping mirrors
    reference models/__init__.py:37-52).

    ``mesh``: pass the device mesh when ``TPU.PARAM_SHARDING == 'tp'`` so
    the fused Pallas attention kernels are shard_map'd over heads on the
    'model' axis instead of running replicated (parallel/tensor.py)."""
    name = cfg.MODEL.ARCH
    if name in RESNET_ZOO:
        # torchvision baseline zoo (reference models/__init__.py:25-34),
        # rebuilt natively — see resnet.py. PRETRAINED would require hub
        # downloads; import local torchvision .pth weights instead
        # (utils/checkpoint or models.import_torch_resnet).
        if cfg.MODEL.PRETRAINED:
            raise ValueError(
                "MODEL.PRETRAINED needs torchvision hub access; load local "
                "weights via MODEL.MODEL_PATH / import_torch_resnet instead"
            )
        if dtype is None:
            dtype = (
                jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
                else jnp.float32
            )
        logging.info("=> creating torchvision-zoo model '%s'", name)
        return build_resnet(
            name, num_classes=cfg.DATA.NUM_CLASSES, dtype=dtype,
            input_mean=tuple(cfg.INPUT.MEAN), input_std=tuple(cfg.INPUT.STD),
        )
    if name in ARCH_ZOO:
        # named zoo convenience: MODEL.ARCH 'vil_small' selects the released
        # configuration's ARCH string
        was_frozen = cfg.is_frozen()
        if was_frozen:
            cfg.defrost()
        cfg.MODEL.VIT.MSVIT.ARCH = ARCH_ZOO[name]
        if was_frozen:
            cfg.freeze()
        name = "msvit"
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unimplemented model architecture: {name}")
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    if param_dtype is None:
        param_dtype = (
            jnp.bfloat16 if cfg.TPU.PARAM_DTYPE == "bfloat16" else jnp.float32
        )
    if use_pallas is None:
        use_pallas = bool(cfg.TPU.USE_PALLAS)
    args = dict(
        img_size=cfg.INPUT.IMAGE_SIZE,
        drop_rate=cfg.MODEL.VIT.DROP,
        drop_path_rate=cfg.MODEL.VIT.DROP_PATH,
        norm_embed=cfg.MODEL.VIT.NORM_EMBED,
        avg_pool=cfg.MODEL.VIT.AVG_POOL,
        input_mean=tuple(cfg.INPUT.MEAN),
        input_std=tuple(cfg.INPUT.STD),
    )
    if name.startswith("msvit"):
        args["arch"] = cfg.MODEL.VIT.MSVIT.ARCH
        args["sharew"] = cfg.MODEL.VIT.MSVIT.SHARE_W
        args["attn_type"] = cfg.MODEL.VIT.MSVIT.ATTN_TYPE
        args["share_kv"] = cfg.MODEL.VIT.MSVIT.SHARE_KV
        args["only_glo"] = cfg.MODEL.VIT.MSVIT.ONLY_GLOBAL
        args["sw_exact"] = cfg.MODEL.VIT.MSVIT.SW_EXACT
        args["ln_eps"] = cfg.MODEL.VIT.MSVIT.LN_EPS
        args["mode"] = cfg.MODEL.VIT.MSVIT.MODE
        args["fused_ln"] = bool(cfg.TPU.FUSED_LN) and use_pallas
        if cfg.TPU.REMAT and cfg.MODEL.VIT.MSVIT.MODE <= 0:
            args["remat"] = cfg.TPU.REMAT
        if (
            mesh is not None
            and use_pallas
            and cfg.TPU.PARAM_SHARDING == "tp"
            and "model" in dict(mesh.shape)
        ):
            args["tp_mesh"] = mesh
            args["tp_axis"] = "model"
    logging.info("=> creating model '%s'", name)
    return MODEL_REGISTRY[name](
        num_classes=cfg.DATA.NUM_CLASSES,
        dtype=dtype,
        param_dtype=param_dtype,
        use_pallas=use_pallas,
        **args,
    )


def precompute_rpe_cache(model, variables, sample_input):
    """INFERENCE serving helper: assemble every FullAttention RPE bias ONCE
    and return ``variables`` extended with an ``rpe_cache`` collection that
    deterministic applies reuse. XLA does not hoist the loop-invariant
    (H, N, N) assembly out of serving loops — at 1024² it is ~110 of the
    175 ms RPE forward. Training applies (deterministic=False) ignore the
    cache (a cached bias would detach the table gradients); rebuild the
    cache after any parameter update.

        variables = precompute_rpe_cache(model, variables, x)
        logits = model.apply(variables, x, deterministic=True)
    """
    _, mods = model.apply(
        variables, sample_input, deterministic=True, mutable=["rpe_cache"]
    )
    out = dict(variables)
    out["rpe_cache"] = mods["rpe_cache"]
    return out


__all__ = [
    "ARCH_ZOO",
    "MODEL_REGISTRY",
    "MsViT",
    "RESNET_ZOO",
    "ResNet",
    "StageCfg",
    "build_model",
    "build_resnet",
    "import_torch_resnet",
    "parse_arch",
    "precompute_rpe_cache",
]
