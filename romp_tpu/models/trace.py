"""TRACE temporal head — ConvGRU features, 3D localization + motion maps,
camera-motion heads, trajectory parameter regressors.

Parity target: `simple_romp/trace2/models/model.py:43-519` (TRACE_head) and
`trace2/models/basic_modules.py` (ConvGRU :121, TemporalEncoder :231). Key
structure:
- stacked 2-layer ConvGRU over the clip (carried hidden state across clips),
  plus deformable-conv warping of features along predicted motion offsets
  (`extract_temporal_features`, model.py:170-193)
- BEV-style coarse-to-fine 3D localization with a zero-z coord map and a
  50-degree FOV depth anchor (model.py:73-74, 207-223)
- 3D motion maps (FV motion head x BV depth branch, model.py:225-236)
- camera-motion (3ch) + camera-rotation (6D) heads (model.py:92-94)
- four TemporalEncoder MLP regressors over per-track trajectory features:
  world+cam global rotation (12), body pose (126), betas (21), translation
  (3, fed cams_init) (model.py:80-83, 238-252)

Parameter names equal the reference state_dict keys. All map computation is
jittable fixed-shape; the tracking/trajectory assembly between maps and
regressors is host-side (see romp_tpu/pipeline/trace_tracking.py).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from romp_tpu.models.bev import cam3dmap_anchor as _cam3dmap_anchor
from romp_tpu.models.layers import (
    ParamStore, basic_block, basic_block_1d, basic_block_3d,
    basic_block_conv_ds, bn_relu, conv2d, embedding_lookup, linear,
)
from romp_tpu.models.romp import coord_maps
from romp_tpu.ops.pallas_deform import deform_conv2d_fast

OUTMAP = 128
DEPTH_LEVELS = 64
HC = 128
BACKBONE_CH = 32
SMPL_POSE_DIM = 22 * 6
SMPL_SHAPE_DIM = 21
# params_pred layout after regression: [world grot 6D | cam grot 6D |
# body pose 21x6D | betas 21] = 159; final packed output [cam(3) | cam grot
# 6D | pose 126 | betas 21] = 156 (model.py:491).
TRACE_FOV = 50.0


def trace_cam_anchor() -> np.ndarray:
    return _cam3dmap_anchor(TRACE_FOV, OUTMAP)


def coord_maps_3d_zeroz(size: int = OUTMAP,
                        zsize: int = DEPTH_LEVELS) -> np.ndarray:
    """(1, D, S, S, 3): z channel zero, y/x in [-1, 1]
    (`basic_modules.py:272-280` get_3Dcoord_maps_zeroz)."""
    r = (np.arange(size, dtype=np.float32) / size) * 2.0 - 1.0
    Y = np.broadcast_to(r[None, :, None], (zsize, size, size))
    X = np.broadcast_to(r[None, None, :], (zsize, size, size))
    Z = np.zeros_like(Y)
    return np.stack([Z, Y, X], axis=-1)[None]


# ---------------------------------------------------------------- ConvGRU --

def conv_gru_cell(store: ParamStore, prefix: str, h: jax.Array,
                  x: jax.Array, hidden_dim: int) -> jax.Array:
    """(B, H, W, C) ConvGRU cell (`basic_modules.py:101-116`)."""
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv2d(store, f"{prefix}.convz", hx, hidden_dim, 3, 1,
                              bias=True))
    r = jax.nn.sigmoid(conv2d(store, f"{prefix}.convr", hx, hidden_dim, 3, 1,
                              bias=True))
    q = jnp.tanh(conv2d(store, f"{prefix}.convq",
                        jnp.concatenate([r * h, x], axis=-1), hidden_dim, 3,
                        1, bias=True))
    return (1.0 - z) * h + z * q


def conv_gru(store: ParamStore, prefix: str, x_seq: jax.Array,
             hidden: Optional[List[jax.Array]], num_layers: int = 2,
             hidden_dim: int = BACKBONE_CH,
             ) -> Tuple[jax.Array, List[jax.Array]]:
    """Stacked ConvGRU over (B, T, H, W, C). Carried hidden state list.

    When hidden is None, the reference prepends the first frame (warm start)
    and drops its output (`basic_modules.py:177-208`).
    """
    drop_first = hidden is None
    if drop_first:
        B, T, H, W, C = x_seq.shape
        hidden = [jnp.zeros((B, H, W, hidden_dim), x_seq.dtype)
                  for _ in range(num_layers)]
        x_seq = jnp.concatenate([x_seq[:, :1], x_seq], axis=1)

    cur = x_seq
    new_hidden = []
    for layer in range(num_layers):
        h = hidden[layer]
        outs = []
        # Unrolled over T (<= 9 steps): each step is a few convs; unrolling
        # lets XLA pipeline them without a scan-carried param closure.
        for t in range(cur.shape[1]):
            h = conv_gru_cell(store, f"temp_model.cell_list.{layer}", h,
                              cur[:, t], hidden_dim)
            outs.append(h)
        new_hidden.append(h)
        cur = jnp.stack(outs, axis=1)
    if drop_first:
        cur = cur[:, 1:]
    return cur, new_hidden


def temporal_encoder(store: ParamStore, prefix: str, x: jax.Array,
                     out_sizes: Tuple[int, ...],
                     hidden_size: int = 256) -> jax.Array:
    """MLP trajectory regressor (`basic_modules.py:231-260`): two ReLU
    Linear layers + per-output heads, concatenated."""
    y = jax.nn.relu(linear(store, f"{prefix}.regressor.0", x, hidden_size))
    y = jax.nn.relu(linear(store, f"{prefix}.regressor.2", y, hidden_size))
    outs = [linear(store, f"{prefix}.out_layers.{i}", y, s)
            for i, s in enumerate(out_sizes)]
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------- map heads --

def _head(store: ParamStore, prefix: str, x: jax.Array, out_ch: Optional[int],
          block_num: int, num_channels: int = HC) -> jax.Array:
    for b in range(block_num):
        x = basic_block_conv_ds(store, f"{prefix}.{b}.0", x, num_channels)
    if out_ch is not None:
        x = conv2d(store, f"{prefix}.{block_num}", x, out_ch, 1, 1,
                   padding=0, bias=True)
    return x


def _bv_branch(store: ParamStore, pre_prefix: str, out_prefix: str,
               feat: jax.Array, fv_maps: List[jax.Array],
               out_channels: int) -> jax.Array:
    """Shared BV-branch shape: 1x1/3x3/1x1 conv stack on features, concat
    with FV maps, collapse (C, H) into 1D conv channels over x."""
    B, H, W, _ = feat.shape
    g = conv2d(store, f"{pre_prefix}.0", feat, OUTMAP // 8, 1, 1, padding=0,
               bias=True)
    g = bn_relu(store, f"{pre_prefix}.1", g)
    g = conv2d(store, f"{pre_prefix}.3", g, OUTMAP // 8, 3, 1, bias=True)
    g = bn_relu(store, f"{pre_prefix}.4", g)
    g = conv2d(store, f"{pre_prefix}.6", g, OUTMAP // 8, 1, 1, padding=0,
               bias=True)
    g = bn_relu(store, f"{pre_prefix}.7", g)

    summon = jnp.concatenate(fv_maps + [g], axis=-1)
    summon = summon.transpose(0, 3, 1, 2).reshape(B, -1, W)
    s = summon.transpose(0, 2, 1)
    s = basic_block_1d(store, f"{out_prefix}.0", s, 512)
    s = basic_block_1d(store, f"{out_prefix}.1", s, 512)
    s = basic_block_1d(store, f"{out_prefix}.2", s, out_channels)
    return s.transpose(0, 2, 1)     # (B, out_channels, W)


class TraceMaps(NamedTuple):
    center_maps_3d: jax.Array    # (T, D, H, W)
    center_maps_fv: jax.Array    # (T, H, W, 1)
    cam_maps_3d: jax.Array       # (T, D, H, W, 3)
    motion_maps_3d: jax.Array    # (T, D, H, W, 3)
    motion_maps_fv: jax.Array    # (T, H, W, 3)
    mesh_feature_maps: jax.Array  # (T, H, W, 128)
    cam_motion_maps: jax.Array   # (T, H, W, 3)
    cam_rot_maps: jax.Array      # (T, H, W, 6)


def extract_temporal_features(store: ParamStore, image_feature_maps: jax.Array,
                              hidden: Optional[List[jax.Array]],
                              temp_clip_length: int,
                              ) -> Tuple[jax.Array, List[jax.Array]]:
    """(T+1, H, W, C) image features (frame 0 = previous clip's last frame)
    -> (T, H, W, C) temporally-fused features (`model.py:170-193`)."""
    T1 = image_feature_maps.shape[0]
    clip = min(temp_clip_length, T1 - 1)
    seq = image_feature_maps[1:].reshape(-1, clip,
                                         *image_feature_maps.shape[1:])
    temp_feats, hidden = conv_gru(store, "temp_model", seq, hidden)
    temp_feats = temp_feats.reshape(-1, *image_feature_maps.shape[1:])

    diff = image_feature_maps[1:] - image_feature_maps[:-1]
    mo = basic_block(store, "offset_feature_convert.0", diff, BACKBONE_CH)
    mo = basic_block(store, "offset_feature_convert.1", mo, BACKBONE_CH)
    mo = basic_block(store, "offset_feature_convert.2", mo, BACKBONE_CH)
    offsets = conv2d(store, "feature_offset_predictor", mo, 8 * 2 * 9, 3, 1)
    w = store.get("deform_warper.weight", (3, 3, BACKBONE_CH, BACKBONE_CH),
                  lambda r, s: jax.random.normal(r, s) * 0.02)
    # offsets (coordinates) stay f32; the VALUE matmuls inside follow the
    # activation dtype (bf16 fast path halves the one-hot weight traffic).
    # Pallas kernel on TPU (VMEM-resident taps), XLA one-hot matmuls
    # elsewhere; backward is the XLA VJP (ops/pallas_deform.py).
    warped = deform_conv2d_fast(
        image_feature_maps[1:].astype(store.act_dtype),
        offsets.astype(jnp.float32), w.astype(store.act_dtype),
        deform_groups=8)
    return temp_feats + warped + image_feature_maps[1:], hidden


def trace_forward_maps(store: ParamStore, image_feature_maps: jax.Array,
                       flows: jax.Array,
                       hidden: Optional[List[jax.Array]] = None,
                       temp_clip_length: int = 8,
                       ) -> Tuple[TraceMaps, List[jax.Array]]:
    """Full map computation for one clip.

    image_feature_maps: (T+1, 128, 128, 32) from the frozen image backbone
    (frame 0 = carry-over); flows: (T, 128, 128, 2) optical flow.
    """
    feats, hidden = extract_temporal_features(
        store, image_feature_maps, hidden, temp_clip_length)
    T, H, W, _ = feats.shape
    coord3d = jnp.asarray(coord_maps_3d_zeroz(H, DEPTH_LEVELS))

    # coarse2fine_localization (model.py:207-223)
    maps_fv = _head(store, "det_head", feats, 1 + 3 * 2, block_num=1)
    center_fv = maps_fv[..., :1]
    cam_offset = maps_fv[..., 1:4]
    local_res = maps_fv[..., 4:7]
    bv_out = _bv_branch(store, "bv_pre_layers", "bv_out_layers", feats,
                        [center_fv, cam_offset, local_res],
                        DEPTH_LEVELS * 3)
    center_bv = bv_out[:, :DEPTH_LEVELS]
    camoff_bv = bv_out[:, DEPTH_LEVELS:DEPTH_LEVELS * 2]
    c3d = center_fv[:, None, :, :, 0] * center_bv[:, :, None, :]
    c3d = basic_block_3d(store, "center_map_refiner2.0", c3d[..., None],
                         1)[..., 0]
    cam3d = coord3d + cam_offset[:, None]
    cam3d = cam3d.at[..., 0].add(camoff_bv[:, :, None, :])  # z offset
    cam3d = basic_block_3d(store, "cam_map_refiner.0", cam3d, 3)

    combined = jnp.concatenate([flows, feats], axis=-1)
    mesh_feats = _head(store, "param_head", combined, None, block_num=2)

    # motion_regression (model.py:231-236)
    motion_fv = _head(store, "motion_head", combined, 3, block_num=2)
    motion_bv = _bv_branch(store, "bv_motion_pre_layers",
                           "bv_motion_out_layers", combined, [motion_fv],
                           DEPTH_LEVELS)
    m3d = motion_fv[:, None] + motion_bv[:, :, None, :, None]
    m3d = basic_block_3d(store, "motion_map_refiner.0", m3d, 3)
    # frame 0 of each clip has no supervised motion (model.py:429)
    m3d = m3d.at[0].set(0.0)

    # camera motion / rotation heads (model.py:92-94, 424-426): the 6-block
    # cam_motion_head is split as [:-2] (5 blocks -> shared motion features)
    # and [-2:] (block 5 + 1x1 conv -> cam motion); cam_rot_head consumes the
    # shared features.
    cm = combined
    for b in range(5):
        cm = basic_block_conv_ds(store, f"cam_motion_head.{b}.0", cm, HC)
    cam_motion_feats = cm
    cm = basic_block_conv_ds(store, "cam_motion_head.5.0", cam_motion_feats,
                             HC)
    cam_motion = conv2d(store, "cam_motion_head.6", cm, 3, 1, 1, padding=0,
                        bias=True)
    cr = basic_block_conv_ds(store, "cam_rot_head.0", cam_motion_feats, HC)
    cam_rot = conv2d(store, "cam_rot_head.1", cr, 6, 1, 1, padding=0,
                     bias=True)

    return TraceMaps(c3d, center_fv, cam3d, m3d, motion_fv, mesh_feats,
                     cam_motion, cam_rot), hidden


def trace_regress_trajectory(store: ParamStore, traj_features: jax.Array,
                             ) -> jax.Array:
    """(N, T, 128) trajectory features -> (N, T, 159) params
    [world grot 6 | cam grot 6 | pose 126 | betas 21] (model.py:238-252)."""
    grots = temporal_encoder(store, "temp_globalrot_regressor",
                             traj_features, (6, 6))
    pose = temporal_encoder(store, "temp_smplpose_regressor",
                            traj_features, (126,))
    betas = temporal_encoder(store, "temp_smplshape_regressor",
                             traj_features, (SMPL_SHAPE_DIM,))
    return jnp.concatenate([grots, pose, betas], axis=-1)


def trace_regress_trans(store: ParamStore, cams_init: jax.Array,
                        traj_features: jax.Array) -> jax.Array:
    """(N, T, 3)+(N, T, 128) -> (N, T, 3) normalized cams (model.py:282-285)."""
    x = jnp.concatenate([cams_init, traj_features], axis=-1)
    return temporal_encoder(store, "temp_trans_regressor", x, (3,))


def init_trace_params(rng: jax.Array, clip_length: int = 4,
                      map_size: int = OUTMAP):
    """Trace the head once to materialize parameters.

    NOTE: like BEV, the BV 1D-conv channel count is tied to the map height
    (C*H); only full-size (128) init matches released checkpoints.
    """
    store = ParamStore(rng=rng)
    feats = jnp.zeros((clip_length + 1, map_size, map_size, BACKBONE_CH))
    flows = jnp.zeros((clip_length, map_size, map_size, 2))
    trace_forward_maps(store, feats, flows, temp_clip_length=clip_length)
    tf = jnp.zeros((2, clip_length, HC))
    trace_regress_trajectory(store, tf)
    trace_regress_trans(store, jnp.zeros((2, clip_length, 3)), tf)
    embedding_lookup(store, "position_embeddings",
                     jnp.zeros((2,), jnp.int32), OUTMAP, HC)
    return store.params
