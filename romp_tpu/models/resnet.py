"""ResNet-50 backbone with deconv upsampling head.

Parity target: `romp/lib/models/resnet_50.py:19-120` (ResNet_50): ImageNet
normalization, 7x7 stem, bottleneck stages [3, 4, 6, 3], then three 4x4
stride-2 transposed convs 2048 -> 256 -> 128 -> 64, output 64 channels at
input/4 resolution (128x128 for a 512 input).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import (
    ParamStore, bn_relu, bottleneck, conv2d, conv_transpose2d, max_pool2d,
)

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])
STAGES = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))
DECONV_FILTERS = (256, 128, 64)


def resnet50(store: ParamStore, x: jax.Array,
             prefix: str = "backbone") -> jax.Array:
    """x: (B, H, W, 3) RGB in [0, 255] -> (B, H/4, W/4, 64)."""
    x = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    x = conv2d(store, f"{prefix}.conv1", x, 64, 7, 2, padding=3)
    x = bn_relu(store, f"{prefix}.bn1", x)
    x = max_pool2d(x, 3, 2, 1)

    for si, (planes, blocks, stride) in enumerate(STAGES, start=1):
        for b in range(blocks):
            x = bottleneck(store, f"{prefix}.layer{si}.{b}", x, planes,
                           stride=stride if b == 0 else 1,
                           downsample=(b == 0))

    # deconv_layers Sequential: [convT, bn, relu] x 3 -> indices 0,1 / 3,4 / 6,7
    for di, planes in enumerate(DECONV_FILTERS):
        x = conv_transpose2d(store, f"{prefix}.deconv_layers.{di * 3}", x,
                             planes, 4, 2, torch_padding=1)
        x = bn_relu(store, f"{prefix}.deconv_layers.{di * 3 + 1}", x)
    return x
