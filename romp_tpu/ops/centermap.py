"""Center-heatmap parsing — fully on-device, fixed-shape (K, mask) outputs.

Reference behavior: `simple_romp/romp/post_parser.py:8-64` (CenterMap.parse_centermap):
max-pool NMS (5x5, stride 1) -> top-K over the flattened map -> confidence
threshold. The reference then boolean-masks to a dynamic person count; here
the parse keeps a fixed K with a validity mask so the whole pipeline stays
jittable and batched. 3D version (BEV): `simple_romp/bev/post_parser.py:19-66`
uses a 5x5x5 max-pool (MaxPool3d(5, 1, 2)) over a (D, H, W) centermap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import max_pool_same


class CenterDetections(NamedTuple):
    """Fixed-K detections per image. Invalid slots have mask == False."""

    flat_inds: jax.Array   # (B, K) int32 — index into the flattened map
    yx: jax.Array          # (B, K, 2) float — (y, x) map coordinates
    scores: jax.Array      # (B, K) float
    mask: jax.Array        # (B, K) bool


def nms_heatmap(center_map: jax.Array, window: int = 5) -> jax.Array:
    """Suppress non-peak values: keep cells equal to their local max.

    center_map: (B, H, W). Matches `post_parser.py:50-54` (torch MaxPool2d
    with symmetric padding).
    """
    pooled = max_pool_same(center_map[..., None], window)[..., 0]
    return jnp.where(center_map == pooled, center_map, 0.0)


def parse_centermap2d(center_map: jax.Array, max_person: int,
                      conf_thresh: float, nms_window: int = 5,
                      ) -> CenterDetections:
    """2D center parse. center_map: (B, H, W) -> top-`max_person` peaks."""
    B, H, W = center_map.shape
    nmsed = nms_heatmap(center_map, nms_window).reshape(B, H * W)
    scores, inds = jax.lax.top_k(nmsed, max_person)
    ys = (inds // W).astype(jnp.float32)
    xs = (inds % W).astype(jnp.float32)
    return CenterDetections(
        flat_inds=inds.astype(jnp.int32),
        yx=jnp.stack([ys, xs], axis=-1),
        scores=scores,
        mask=scores > conf_thresh,
    )


class CenterDetections3D(NamedTuple):
    flat_inds: jax.Array   # (B, K) int32 — index into flattened (H*W) plane
    zyx: jax.Array         # (B, K, 3) float — (z, y, x)
    scores: jax.Array      # (B, K)
    mask: jax.Array        # (B, K) bool


def nms_heatmap3d(center_map: jax.Array, window: int = 5) -> jax.Array:
    """3D NMS. center_map: (B, D, H, W); window matches the reference's
    MaxPool3d(5, 1, 2) (`bev/post_parser.py:25`)."""
    pad = (window - 1) // 2
    pooled = jax.lax.reduce_window(
        center_map, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, window),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (pad, pad)),
    )
    return jnp.where(center_map == pooled, center_map, 0.0)


def parse_centermap3d(center_map: jax.Array, max_person: int,
                      conf_thresh: float,
                      nms_window: int = 5) -> CenterDetections3D:
    """3D center parse for BEV. center_map: (B, D, H, W).

    Returns (z, y, x) peaks; flat_inds index the (H*W) front-view plane so
    parameter-map sampling works the same as the 2D path
    (`simple_romp/bev/post_parser.py:44-66`).
    """
    B, D, H, W = center_map.shape
    nmsed = nms_heatmap3d(center_map, nms_window).reshape(B, D * H * W)
    scores, inds = jax.lax.top_k(nmsed, max_person)
    zs = inds // (H * W)
    rem = inds % (H * W)
    ys, xs = rem // W, rem % W
    return CenterDetections3D(
        flat_inds=rem.astype(jnp.int32),
        zyx=jnp.stack([zs, ys, xs], axis=-1).astype(jnp.float32),
        scores=scores,
        mask=scores > conf_thresh,
    )


def sample_maps_at(maps: jax.Array, flat_inds: jax.Array) -> jax.Array:
    """Gather per-person channels from a (B, H, W, C) map at flat (H*W) inds.

    Replaces the reference's host-side advanced indexing
    (`post_parser.py:128-133`) with an on-device take_along_axis.
    Returns (B, K, C).
    """
    B, H, W, C = maps.shape
    flat = maps.reshape(B, H * W, C)
    idx = jnp.clip(flat_inds[..., None].astype(jnp.int32), 0, H * W - 1)
    return jnp.take_along_axis(flat, jnp.broadcast_to(
        idx, (*flat_inds.shape, C)), axis=1, mode="clip")
