"""TPU-native ResNet zoo (the reference's torchvision baseline models).

The reference's ``build_model`` accepts any torchvision classification model
name as ``MODEL.ARCH`` (reference models/__init__.py:10-34) — used for the
ResNet baselines in its experiments. This module provides the same model
family natively in flax/linen, NHWC, bf16-capable, matching the torchvision
v1.5 graph exactly (stride on the 3×3 conv of the bottleneck) so that
torchvision ``.pth`` state dicts import losslessly
(``import_torch_resnet``).

TPU notes: BatchNorm statistics are computed over the GLOBAL batch — under
``jit`` with a sharded batch axis, XLA inserts the cross-device reduction
automatically, so the reference's explicit SyncBatchNorm conversion
(run_experiment.py:146-148) has no analogue here; plain ``nn.BatchNorm`` is
already synchronized. Convolutions are NHWC (the TPU-native layout; the
importer transposes torch's OIHW kernels).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _Block(nn.Module):
    """BasicBlock (expansion 1) or Bottleneck (expansion 4) by ``bottleneck``."""

    planes: int
    stride: int
    bottleneck: bool
    downsample: bool
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        conv = lambda feat, k, s, name, groups=1: nn.Conv(
            feat, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, feature_group_count=groups,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        identity = x
        if self.bottleneck:
            width = int(self.planes * (self.base_width / 64.0)) * self.groups
            out = nn.relu(bn("bn1")(conv(width, 1, 1, "conv1")(x)))
            out = nn.relu(bn("bn2")(
                conv(width, 3, self.stride, "conv2", self.groups)(out)
            ))
            out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
        else:
            out = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, "conv1")(x)))
            out = bn("bn2")(conv(self.planes, 3, 1, "conv2")(out))
        if self.downsample:
            identity = bn("downsample_bn")(
                conv(out.shape[-1], 1, self.stride, "downsample_conv")(x)
            )
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-graph ResNet: conv7×7/2 → bn → relu → maxpool3×3/2 →
    4 stages → global avgpool → fc."""

    layers: Sequence[int]
    num_classes: int = 1000
    bottleneck: bool = True
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    input_mean: tuple = (0.485, 0.456, 0.406)
    input_std: tuple = (0.229, 0.224, 0.225)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, mode: int = 0):
        """x: (B, H, W, 3) NHWC (f32 normalized, or uint8 for the fused
        device-side normalize) → (B, num_classes). ``mode`` is accepted for
        train-engine signature compatibility and ignored."""
        del mode
        if x.dtype == jnp.uint8:
            mean = np.asarray(self.input_mean, np.float32)
            std = np.asarray(self.input_std, np.float32)
            scale = jnp.asarray(1.0 / (255.0 * std), self.dtype)
            offset = jnp.asarray(-mean / std, self.dtype)
            x = x.astype(self.dtype) * scale + offset
        else:
            x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        expansion = 4 if self.bottleneck else 1
        in_planes = 64
        for stage, nblocks in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            for j in range(nblocks):
                stride = 2 if (stage > 0 and j == 0) else 1
                x = _Block(
                    planes=planes,
                    stride=stride,
                    bottleneck=self.bottleneck,
                    downsample=(j == 0 and (stride != 1
                                            or in_planes != planes * expansion)),
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{j}",
                )(x, deterministic)
            in_planes = planes * expansion
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc",
        )(x.astype(self.dtype)).astype(jnp.float32)


# name → constructor kwargs, mirroring torchvision's classification zoo
RESNET_ZOO = {
    "resnet18": dict(layers=(2, 2, 2, 2), bottleneck=False),
    "resnet34": dict(layers=(3, 4, 6, 3), bottleneck=False),
    "resnet50": dict(layers=(3, 4, 6, 3)),
    "resnet101": dict(layers=(3, 4, 23, 3)),
    "resnet152": dict(layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(layers=(3, 4, 6, 3), groups=32, base_width=4),
    "resnext101_32x8d": dict(layers=(3, 4, 23, 3), groups=32, base_width=8),
    "wide_resnet50_2": dict(layers=(3, 4, 6, 3), base_width=128),
    "wide_resnet101_2": dict(layers=(3, 4, 23, 3), base_width=128),
}


def build_resnet(name: str, num_classes: int, dtype=jnp.float32,
                 param_dtype=jnp.float32, **overrides) -> ResNet:
    kwargs = dict(RESNET_ZOO[name])
    kwargs.update(overrides)
    return ResNet(num_classes=num_classes, dtype=dtype,
                  param_dtype=param_dtype, **kwargs)


def import_torch_resnet(state_dict) -> dict:
    """torchvision ResNet ``state_dict`` (tensors or ndarrays) → flax
    variables {"params": …, "batch_stats": …}.

    Key mapping: ``layerI.J.…`` → module ``layerI_J``; ``downsample.0/1`` →
    ``downsample_conv``/``downsample_bn``; conv ``weight`` OIHW → HWIO
    ``kernel``; bn ``weight/bias/running_mean/running_var`` →
    ``scale/bias``(params) + ``mean/var``(batch_stats); ``fc.weight`` →
    transposed ``kernel``. Head rows are NOT truncated here — pass the dict
    through the checkpoint aligner for shape-adaptive loads."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = key.split(".")
        # layerI.J.<rest> → layerI_J.<rest>; downsample.0/1 renamed
        if parts[0].startswith("layer") and parts[1].isdigit():
            parts = [f"{parts[0]}_{parts[1]}"] + parts[2:]
        if "downsample" in parts:
            i = parts.index("downsample")
            parts = parts[:i] + [
                "downsample_conv" if parts[i + 1] == "0" else "downsample_bn"
            ] + parts[i + 2:]
        mod, leaf = parts[:-1], parts[-1]
        is_bn = mod and ("bn" in mod[-1] or mod[-1] == "downsample_bn")
        if is_bn:
            if leaf == "weight":
                put(params, mod + ["scale"], v)
            elif leaf == "bias":
                put(params, mod + ["bias"], v)
            elif leaf == "running_mean":
                put(stats, mod + ["mean"], v)
            elif leaf == "running_var":
                put(stats, mod + ["var"], v)
        elif leaf == "weight":
            if v.ndim == 4:  # conv OIHW → HWIO
                put(params, mod + ["kernel"], v.transpose(2, 3, 1, 0))
            else:  # fc (out, in) → (in, out)
                put(params, mod + ["kernel"], v.T)
        elif leaf == "bias":
            put(params, mod + ["bias"], v)
    return {"params": params, "batch_stats": stats}
