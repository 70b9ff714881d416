"""Test scaffolding: import the reference torch model as a numerics oracle.

The reference depends on ``timm`` (DropPath/trunc_normal_/to_2tuple) and
``torchvision`` (unused at module import except for the registry print),
which are not installed. This shim registers minimal stand-ins so the
reference source can be imported READ-ONLY as a golden model for parity
tests. Nothing here ships in the framework.
"""
import math
import sys
import types

import torch
from torch import nn


def _install_timm_shim():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers


def _install_torchvision_shim():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


def get_reference_msvit():
    """Return the reference MsViT class, importing from /root/reference."""
    _install_timm_shim()
    _install_torchvision_shim()
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from models.msvit import MsViT as RefMsViT  # noqa: PLC0415

    return RefMsViT
