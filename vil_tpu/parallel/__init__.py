"""SPMD parallelism: mesh construction, shardings, distributed init."""
from .mesh import (
    batch_sharding,
    create_mesh,
    jit_eval_step,
    jit_train_step,
    mesh_from_cfg,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "jit_eval_step",
    "jit_train_step",
    "mesh_from_cfg",
    "replicate",
    "replicated",
    "shard_batch",
]
from .mesh import fsdp_sharding, shard_like  # noqa: E402,F401

__all__ += ["fsdp_sharding", "shard_like"]

from .mesh import (  # noqa: E402,F401
    jit_spatial_forward,
    shard_image,
    spatial_image_sharding,
)

__all__ += ["jit_spatial_forward", "shard_image", "spatial_image_sharding"]

from .tensor import tp_sharding  # noqa: E402,F401

__all__ += ["tp_sharding"]
