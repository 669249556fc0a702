"""ResNet-18/50 patch encoders (flax).

Covers the reference's torchvision-style local ResNet definitions
(`models.py:13-111`, `model_urls:182-188`) and the Lunit SSL ResNet50
trunk (`models.py:126-135`). Feature extraction is eval-only, so batch
norm runs with frozen statistics (``use_running_average=True``); the
converter fills ``batch_stats`` from the torch checkpoint.

NHWC layout (TPU-native); the first conv's 7x7 stride-2 lowers cleanly to
the MXU with input padding.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = partial(nn.BatchNorm, use_running_average=True, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(self.features, (3, 3), (self.stride, self.stride),
                 padding=1, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = bn(name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            (self.stride, self.stride), name="down_conv")(x)
            residual = bn(name="down_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = partial(nn.BatchNorm, use_running_average=True, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.features, (3, 3), (self.stride, self.stride),
                 padding=1, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)
        if residual.shape != y.shape:
            residual = conv(self.features * 4, (1, 1),
                            (self.stride, self.stride), name="down_conv")(x)
            residual = bn(name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block: type = BasicBlock
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_dim(self) -> int:
        width = 512
        return width * (4 if self.block is Bottleneck else 1)

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] -> pooled feature [B, embed_dim]."""
        bn = partial(nn.BatchNorm, use_running_average=True, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        x = nn.relu(bn(name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, (n_blocks, feats) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(feats, stride, self.dtype,
                               name=f"layer{i + 1}_{j}")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet((2, 2, 2, 2), BasicBlock, dtype)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), Bottleneck, dtype)
