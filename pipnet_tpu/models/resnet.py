"""ResNet backbones in flax with the PIP-Net stride surgery.

Counterpart of ``features/resnet_features.py:126-229``: the torchvision ResNet
conv stack with the classifier removed and **stride 1 in layer3 and layer4**
(ref lines 152-154), producing 28x28 latents at 224^2 input.  NHWC layout;
BatchNorm runs in inference mode by default (the reference trains with
pretrained BN statistics updated, so train-mode BN with running stats is
supported via ``use_running_average=False``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = norm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = norm(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = norm(name="down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = norm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = norm(name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = norm(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = norm(name="down_bn")(identity)
        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """ResNet conv stack; ``layer_strides`` defaults to the PIP-Net (1,2,1,1)."""
    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    layer_strides: Sequence[int] = (1, 2, 1, 1)
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return 512 * self.block.expansion

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (blocks, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            stride = self.layer_strides[li]
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_down = bi == 0 and (s != 1 or inplanes != planes * self.block.expansion)
                x = self.block(planes, stride=s, downsample=need_down, dtype=self.dtype,
                               name=f"layer{li + 1}_block{bi}")(x, train=train)
                inplanes = planes * self.block.expansion
        return x


def resnet18_features(dtype=jnp.float32):
    return ResNetFeatures(block=BasicBlock, layers=(2, 2, 2, 2), dtype=dtype)


def resnet34_features(dtype=jnp.float32):
    return ResNetFeatures(block=BasicBlock, layers=(3, 4, 6, 3), dtype=dtype)


def resnet50_features(dtype=jnp.float32):
    return ResNetFeatures(block=Bottleneck, layers=(3, 4, 6, 3), dtype=dtype)


# the iNaturalist-pretrained variant shares the architecture; only the imported
# checkpoint differs (ref features/resnet_features.py:273-301)
resnet50_features_inat = resnet50_features


def resnet101_features(dtype=jnp.float32):
    return ResNetFeatures(block=Bottleneck, layers=(3, 4, 23, 3), dtype=dtype)


def resnet152_features(dtype=jnp.float32):
    return ResNetFeatures(block=Bottleneck, layers=(3, 8, 36, 3), dtype=dtype)


def resnet_param_groups(params: dict, arch: str) -> dict:
    """Reference optimizer partitioning by layer (``util/args.py:464-499``)."""
    groups = {}
    if "resnet50" in arch or "resnet101" in arch or "resnet152" in arch or "resnet34" in arch:
        last = {"resnet34": "layer4_block2", "resnet50": "layer4_block2"}.get(arch.split("_")[0], "layer4_block2")
        for name in params:
            if name == last:
                groups[name] = "train"
            elif name.startswith("layer4") or name.startswith("layer3"):
                groups[name] = "freeze"
            elif name.startswith("layer2"):
                groups[name] = "backbone" if "resnet50" in arch else "backbone"
            else:
                groups[name] = "frozen" if "resnet50" in arch else "backbone"
    elif "resnet18" in arch:
        for name in params:
            if name == "layer4_block1":
                groups[name] = "train"
            elif name.startswith("layer4") or name.startswith("layer3"):
                groups[name] = "freeze"
            else:
                groups[name] = "backbone"
    else:
        raise ValueError(f"unknown resnet arch {arch}")
    return groups
