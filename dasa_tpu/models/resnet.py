"""ResNet (v1, bottleneck) in Flax — the featurization backbone.

Used by the depth/image featurization pipelines
(dasa_tpu/pipelines/depth_features.py), replacing the reference's
torchvision resnet152 on GPU (scripts/depth_feat_extractor.py:33-40).
The module structure mirrors torchvision's naming (conv1/bn1/layerN.M.
convK/bnK/downsample) so torchvision checkpoints import via
utils/torch_import-style translation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    features: int           # bottleneck width; out = 4x
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides,) * 2,
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.downsample:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides,) * 2,
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, H, W, 3) float images.  Returns (B, 2048) pooled."""
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                 name="conv1")(x.astype(self.dtype))
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** i)
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(features, strides=strides,
                               downsample=(j == 0), dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train=train)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global pool


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), dtype)


def resnet152(dtype=jnp.float32) -> ResNet:
    """The reference featurization backbone (ResNet-152)."""
    return ResNet((3, 8, 36, 3), dtype)
