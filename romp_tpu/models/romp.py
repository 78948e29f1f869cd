"""ROMP network: HRNet-W32 backbone + CoordConv + three conv heads.

Parity target: `simple_romp/romp/model.py:420-481` (ROMPv1). The three heads
regress, at 64x64 resolution for a 512x512 input:
- params_maps: 142 ch = 1x6D global orient + 21x6D body pose + 10 betas
- center_maps: 1 ch  (person-center heatmap)
- cam_maps:    3 ch  (s, tx, ty weak-perspective camera)
The packed params_maps output is [cam(3), pose6d(132), betas(10)] = 145 ch.

As in the reference export path, the cam-scale decode pow(1.1, s) is applied
by the caller, not inside the network (`simple_romp/romp/model.py:478-479`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from romp_tpu.models.hrnet import hrnet_w32
from romp_tpu.models.layers import (
    ParamStore, basic_block, bn_relu, conv2d,
)

NUM_POSE_6D = 132          # 22 joints x 6D
NUM_BETAS = 10
NUM_PARAMS_MAP = NUM_POSE_6D + NUM_BETAS  # 142 (head); packed output adds cam
NUM_CAM_MAP = 3
HEAD_CHANNELS = 64
OUT_SIZE = 64              # params/center map resolution for 512 input


def coord_maps(size: int, dtype=jnp.float32) -> jax.Array:
    """(1, size, size, 2) CoordConv maps in [-1, 1]; channel 0 = x (columns),
    channel 1 = y (rows), matching `simple_romp/romp/model.py:8-37`."""
    r = (jnp.arange(size, dtype=dtype) / (size - 1)) * 2.0 - 1.0
    xx = jnp.broadcast_to(r[None, :], (size, size))
    yy = jnp.broadcast_to(r[:, None], (size, size))
    return jnp.stack([xx, yy], axis=-1)[None]


def _head(store: ParamStore, prefix: str, x: jax.Array,
          out_ch: int) -> jax.Array:
    """One output head: stride-2 3x3 conv (with bias, then BN — a reference
    quirk kept for checkpoint compat) -> 2 BasicBlocks -> 1x1 conv."""
    x = conv2d(store, f"{prefix}.0.0", x, HEAD_CHANNELS, 3, 2, bias=True)
    x = bn_relu(store, f"{prefix}.0.1", x)
    x = basic_block(store, f"{prefix}.1.0.0", x, HEAD_CHANNELS)
    x = basic_block(store, f"{prefix}.1.1.0", x, HEAD_CHANNELS)
    return conv2d(store, f"{prefix}.2", x, out_ch, 1, 1, padding=0, bias=True)


def romp_forward(store: ParamStore, image: jax.Array,
                 backbone: str = "hrnet32",
                 ) -> Tuple[jax.Array, jax.Array]:
    """ROMP forward. image: (B, 512, 512, 3) float RGB in [0, 255].

    Returns (center_maps (B, 64, 64, 1), params_maps (B, 64, 64, 145)),
    channels-last. params_maps = concat[cam(3), pose6d(132), betas(10)].

    backbone: "hrnet32" (inference package default) or "resnet50" (the
    training repo's alternative, `romp/lib/models/build.py:13`).
    """
    if backbone in ("hrnet32", "hrnet32_tiny"):
        from romp_tpu.models.hrnet import (
            hrnet_w32_segments, hrnet_w32_tiny_segments,
        )

        segs = (hrnet_w32_tiny_segments("backbone")
                if backbone == "hrnet32_tiny"
                else hrnet_w32_segments("backbone"))
        xs = [(image / 255.0) * 2.0 - 1.0]
        for seg in segs:
            xs = seg(store, xs)
        feat = xs[0]
    elif backbone == "resnet50":
        from romp_tpu.models.resnet import resnet50

        feat = resnet50(store, image, prefix="backbone")
    else:
        raise ValueError(f"unknown backbone {backbone!r}")
    cm = coord_maps(feat.shape[1], feat.dtype)
    feat = jnp.concatenate(
        [feat, jnp.broadcast_to(cm, (feat.shape[0], *cm.shape[1:]))], axis=-1)

    params_maps = _head(store, "final_layers.1", feat, NUM_PARAMS_MAP)
    center_maps = _head(store, "final_layers.2", feat, 1)
    cam_maps = _head(store, "final_layers.3", feat, NUM_CAM_MAP)
    params_maps = jnp.concatenate([cam_maps, params_maps], axis=-1)
    return center_maps, params_maps


def _seg_heads(store: ParamStore, xs):
    (feat,) = xs
    cm = coord_maps(feat.shape[1], feat.dtype)
    feat = jnp.concatenate(
        [feat, jnp.broadcast_to(cm, (feat.shape[0], *cm.shape[1:]))], axis=-1)
    params_maps = _head(store, "final_layers.1", feat, NUM_PARAMS_MAP)
    center_maps = _head(store, "final_layers.2", feat, 1)
    cam_maps = _head(store, "final_layers.3", feat, NUM_CAM_MAP)
    return [center_maps, jnp.concatenate([cam_maps, params_maps], axis=-1)]


def romp_forward_segments(backbone: str = "hrnet32"):
    """romp_forward as fn(store, [arrays]) -> [arrays] segments for
    per-stage training rematerialization (see hrnet.hrnet_w32_segments).
    First segment consumes [image (B, S, S, 3) in [0, 255]]; last returns
    [center_maps, params_maps]."""
    from romp_tpu.models.hrnet import (
        hrnet_w32_segments, hrnet_w32_tiny_segments,
    )

    if backbone in ("hrnet32", "hrnet32_tiny"):
        def normalize(store, xs):
            return [(xs[0] / 255.0) * 2.0 - 1.0]

        segs = (hrnet_w32_tiny_segments("backbone")
                if backbone == "hrnet32_tiny"
                else hrnet_w32_segments("backbone"))
        return [normalize] + segs + [_seg_heads]
    from romp_tpu.models.resnet import resnet50

    # resnet50 takes the raw [0, 255] image (it normalizes internally) and
    # has no comparable stage split here: one whole-backbone segment.
    return [lambda store, xs: [resnet50(store, xs[0], prefix="backbone")],
            _seg_heads]


def init_romp_params(rng: jax.Array, input_size: int = 512,
                     backbone: str = "hrnet32"):
    """Initialize a fresh parameter dict by tracing the forward once."""
    store = ParamStore(rng=rng)
    romp_forward(store, jnp.zeros((1, input_size, input_size, 3), jnp.float32),
                 backbone=backbone)
    return store.params
