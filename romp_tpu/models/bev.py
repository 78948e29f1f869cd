"""BEV network: HRNet-W32 + front-view/bird's-eye-view 3D localization +
depth-anchored MLP mesh regressor.

Parity target: `simple_romp/bev/model.py:104-250` (BEVv1):
- det head -> FV 2D centermap (1ch) + cam offset maps (3ch) at 128x128
- bv branch: 1x1/3x3 conv stack -> (16ch) image feats; [center, cam_offset,
  feats] collapsed (C*H) -> 1D convs over x -> 64 depth-level centermap +
  64 depth-wise cam offsets
- 3D centermap = FV(y, x) x BV(z, x) outer product, refined by a 3D-conv
  residual block; 3D cam maps = depth-anchor coord maps + offsets, refined
- parse top-K peaks of the 3D map; sample cam at peaks; regress SMPL params
  by an MLP over FV features + depth-anchor position embedding
- params = [cam(3) | 22x6D pose (132) | 11 betas] = 146.

Fixed-shape design: the parse returns (B, K) masked detections and every
downstream tensor keeps (B, K) — the reference flattens to a dynamic person
list (`bev/model.py:241-249`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from romp_tpu.models.hrnet import hrnet_w32
from romp_tpu.models.layers import (
    ParamStore, basic_block_1d, basic_block_3d, basic_block_conv_ds, bn_relu,
    conv1d, conv2d, embedding_lookup, linear,
)
from romp_tpu.ops.centermap import (
    CenterDetections3D, parse_centermap3d, sample_maps_at,
)

OUTMAP = 128
DEPTH_LEVELS = 64
NUM_PARAMS_BEV = 143     # 22*6 pose + 11 betas
HEAD_CH = 128
BV_CH = OUTMAP // 8      # 16


def cam3dmap_anchor(fov_deg: float = 60.0, size: int = OUTMAP) -> np.ndarray:
    """Depth-anchor scale values per depth level.

    Piecewise-linear interpolation of weak-perspective scale across four
    depth bands (1/10/20/100 m), `simple_romp/bev/model.py:77-87`: each band
    spans a fixed fraction of the 64 depth bins and linearly interpolates
    from the previous band's scale (seeded at 8) to 1/(tan(FOV/2) * depth).
    """
    depth_level = np.array([1.0, 10.0, 20.0, 100.0], np.float32)
    bins = (np.array([2, 25, 3, 2], np.float32) / 64.0 * size).astype(np.int32)
    scales = 1.0 / np.tan(np.radians(fov_deg / 2.0)) / depth_level
    out, prev = [], 8.0
    for scale, n in zip(scales, bins):
        out.append(prev - np.arange(1, n + 1) / n * (prev - scale))
        prev = scale
    return np.concatenate(out).astype(np.float32)


def coord_maps_3d_halfz(size: int, z_base: np.ndarray) -> np.ndarray:
    """(1, D, size, size, 3) coord map: channel 0 = depth-anchor scale,
    channels 1, 2 = y, x in [-1, 1] (`bev/model.py:9-17`)."""
    D = len(z_base)
    r = (np.arange(size, dtype=np.float32) / size) * 2.0 - 1.0
    Z = np.broadcast_to(z_base[:, None, None], (D, size, size))
    Y = np.broadcast_to(r[None, :, None], (D, size, size))
    X = np.broadcast_to(r[None, None, :], (D, size, size))
    return np.stack([Z, Y, X], axis=-1)[None].astype(np.float32)


def _head_block(store: ParamStore, prefix: str, x: jax.Array,
                out_ch: int, with_out: bool = True) -> jax.Array:
    x = basic_block_conv_ds(store, f"{prefix}.0.0", x, HEAD_CH)
    if with_out:
        x = conv2d(store, f"{prefix}.1", x, out_ch, 1, 1, padding=0,
                   bias=True)
    return x


class BevMaps(NamedTuple):
    center_maps_3d: jax.Array   # (B, D, H, W)
    cam_maps_3d: jax.Array      # (B, D, H, W, 3)
    center_maps_fv: jax.Array   # (B, H, W, 1)
    front_feats: jax.Array      # (B, H, W, 128)


def bev_forward_maps(store: ParamStore, image: jax.Array,
                     anchors: jax.Array, coord3d: jax.Array,
                     backbone: str = "hrnet32") -> BevMaps:
    """Backbone + coarse-to-fine 3D localization maps
    (`bev/model.py:199-215` coarse2fine_localization)."""
    x = (image / 255.0) * 2.0 - 1.0
    if backbone == "hrnet32_tiny":
        from romp_tpu.models.hrnet import hrnet_w32_tiny_segments

        xs = [x]
        for seg in hrnet_w32_tiny_segments("backbone"):
            xs = seg(store, xs)
        feat = xs[0]
    else:
        feat = hrnet_w32(store, x, prefix="backbone")  # (B, 128, 128, 32)
    B, H, W, _ = feat.shape

    maps_fv = _head_block(store, "det_head", feat, 4)
    center_fv = maps_fv[..., :1]                    # (B, H, W, 1)
    cam_offset = maps_fv[..., 1:4]                  # (B, H, W, 3)

    # Bird's-eye-view branch (`bev/model.py:188-197`).
    g = conv2d(store, "bv_pre_layers.0", feat, BV_CH, 1, 1, padding=0,
               bias=True)
    g = bn_relu(store, "bv_pre_layers.1", g)
    g = conv2d(store, "bv_pre_layers.3", g, BV_CH, 3, 1, bias=True)
    g = bn_relu(store, "bv_pre_layers.4", g)
    g = conv2d(store, "bv_pre_layers.6", g, BV_CH, 1, 1, padding=0,
               bias=True)
    g = bn_relu(store, "bv_pre_layers.7", g)

    # Collapse (C, H) into 1D-conv channels in torch's c*H+h order.
    summon = jnp.concatenate([center_fv, cam_offset, g], axis=-1)  # (B,H,W,20)
    summon = summon.transpose(0, 3, 1, 2).reshape(B, -1, W)        # (B,C*H,W)
    s = summon.transpose(0, 2, 1)                                  # (B,W,C*H)
    s = basic_block_1d(store, "bv_out_layers.0", s, 512)
    s = basic_block_1d(store, "bv_out_layers.1", s, 512)
    s = basic_block_1d(store, "bv_out_layers.2", s, 2 * DEPTH_LEVELS)
    s = s.transpose(0, 2, 1)                                       # (B,128,W)
    center_bv = s[:, :DEPTH_LEVELS]                                # (B,D,W)
    camoff_bv = s[:, DEPTH_LEVELS:]                                # (B,D,W)

    # 3D centermap: FV(y,x) x BV(z,x) outer product.
    c3d = center_fv[:, None, :, :, 0] * center_bv[:, :, None, :]   # (B,D,H,W)
    c3d = basic_block_3d(store, "center_map_refiner.0", c3d[..., None], 1)
    c3d = c3d[..., 0]

    cam3d = coord3d + cam_offset[:, None]                          # (B,D,H,W,3)
    cam3d = cam3d.at[..., 2].add(camoff_bv[:, :, None, :])
    cam3d = basic_block_3d(store, "cam_map_refiner.0", cam3d, 3)

    front = _head_block(store, "param_head", feat, 0, with_out=False)
    return BevMaps(c3d, cam3d, center_fv, front)


def cam_to_depth_bin(cam_scale: jax.Array, anchors: jax.Array) -> jax.Array:
    """Nearest depth-anchor index for a predicted scale
    (`bev/model.py:89-97` convert_cam_params_to_centermap_coords)."""
    d = jnp.abs(cam_scale[..., None] - anchors)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def bev_regress_params(store: ParamStore, maps: BevMaps,
                       det: CenterDetections3D,
                       anchors: jax.Array) -> jax.Array:
    """Sample cams at 3D peaks; MLP-regress pose/shape at FV features with
    depth position embedding (`bev/model.py:217-230`). Returns (B, K, 146)."""
    B, D, H, W, _ = maps.cam_maps_3d.shape
    K = det.scores.shape[1]
    flat_cam = maps.cam_maps_3d.reshape(B, D * H * W, 3)
    zyx = det.zyx.astype(jnp.int32)
    flat3d = (zyx[..., 0] * H + zyx[..., 1]) * W + zyx[..., 2]
    flat3d = jnp.clip(flat3d, 0, D * H * W - 1)
    cams = jnp.take_along_axis(
        flat_cam, flat3d[..., None].astype(jnp.int32), axis=1,
        mode="clip")  # (B, K, 3)

    # cam -> (cz, cy, cx) on the 128 map, clamped to [1, 127].
    cz = cam_to_depth_bin(cams[..., 0], anchors)
    cz_norm = cz.astype(jnp.float32) / 128.0 * 2.0 - 1.0
    cyx = jnp.concatenate([cz_norm[..., None], cams[..., 1:]], -1)
    czyx = jnp.clip(((cyx + 1.0) / 2.0 * OUTMAP).astype(jnp.int32), 1,
                    OUTMAP - 1)

    feat = sample_maps_at(
        maps.front_feats, czyx[..., 1] * W + czyx[..., 2])       # (B, K, 128)
    pos = embedding_lookup(store, "position_embeddings", czyx[..., 0],
                           OUTMAP, HEAD_CH)
    h = feat + pos
    h = jax.nn.relu(linear(store, "transformer.0", h, 512))
    h = jax.nn.relu(linear(store, "transformer.3", h, 512))
    h = linear(store, "transformer.6", h, NUM_PARAMS_BEV)
    return jnp.concatenate([cams, h], axis=-1)                   # (B, K, 146)


def init_bev_params(rng: jax.Array, input_size: int = 512,
                    backbone: str = "hrnet32"):
    store = ParamStore(rng=rng)
    anchors = jnp.asarray(cam3dmap_anchor())
    size = input_size // 4
    coord3d = jnp.asarray(coord_maps_3d_halfz(size, np.asarray(anchors)))
    maps = bev_forward_maps(
        store, jnp.zeros((1, input_size, input_size, 3), jnp.float32),
        anchors, coord3d, backbone=backbone)
    det = parse_centermap3d(maps.center_maps_3d, 8, 0.1)
    bev_regress_params(store, maps, det, anchors)
    return store.params
