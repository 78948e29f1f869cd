"""TRACE video inference pipeline: clip-chunked streaming with carried state.

Mirrors `simple_romp/trace2/main.py:23-118` (TRACE.forward /
sequence_inference) + `trace2/models/model.py:412-519` (inference_regression):

per clip of `temp_clip_length` frames (+ the previous clip's last frame):
  [device] image backbone (HRNet) -> feature maps
  [device] flow between consecutive frames
  [device] ConvGRU + deform-warp fusion; det/motion/cam maps; fixed-K 3D
           parse; per-detection gathers (cams/motions/features/init cams)
  [host]   motion-offset tracking -> per-track trajectories; memory5D
           feature gating; cam infilling
  [device] trajectory regressors (pose/shape/grot/trans)
  [host]   world-cam accumulation, pose/world smoothing
  [device] SMPL+A forward + perspective projection

Cross-clip state = (ConvGRU hidden, memory5D, tracker, init_world_cams),
exactly the reference's temp_states (model.py:508-519).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from romp_tpu.models.hrnet import hrnet_w32
from romp_tpu.models.layers import ParamStore
from romp_tpu.models.trace import (
    DEPTH_LEVELS, HC, OUTMAP, trace_cam_anchor, trace_forward_maps,
    trace_regress_trajectory, trace_regress_trans,
)
from romp_tpu.ops.centermap import parse_centermap3d, sample_maps_at
from romp_tpu.ops.projection import perspective_projection
from romp_tpu.ops.rotations import rot6d_to_axis_angle
from romp_tpu.pipeline.trace_tracking import (
    ClipTrajectories, Memory5D, MotionOffsetTracker, SeqConfig,
    accumulate_world_cams, assemble_trajectories, gate_features_with_memory,
    infill_and_smooth_cams, smooth_pose_params, trace_cam_to_trans,
)
from romp_tpu.smpl.body_model import SmplModel, smpla_forward

FOCAL_TRACE = 548.0  # FOV 50 deg at 512 input


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    input_size: int = 512
    temp_clip_length: int = 8
    max_person: int = 64
    max_tracks: int = 16
    conf_thresh: float = 0.05
    compute_dtype: str = "float32"
    act_dtype: str = "float32"
    # dtype big per-vertex outputs (verts/joints/pj2d) are FETCHED in.
    # float16 halves the dominant host<-device transfer (~5 MB/clip of
    # verts); quantization is <0.5 mm at metre scale. float32 = exact.
    transfer_dtype: str = "float32"


def _sample3d(maps: jax.Array, zyx: jax.Array) -> jax.Array:
    """maps: (T, D, H, W, C); zyx: (T, K, 3) int -> (T, K, C)."""
    T, D, H, W, C = maps.shape
    flat = maps.reshape(T, D * H * W, C)
    idx = (zyx[..., 0] * H + zyx[..., 1]) * W + zyx[..., 2]
    idx = jnp.clip(idx, 0, D * H * W - 1)
    return jnp.take_along_axis(
        flat, idx[..., None].astype(jnp.int32), axis=1, mode="clip")


def _store(params, cfg: TraceConfig) -> ParamStore:
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    at = jnp.bfloat16 if cfg.act_dtype == "bfloat16" else jnp.float32
    return ParamStore(params, compute_dtype=dt, act_dtype=at)


@functools.partial(jax.jit, static_argnums=(3,))
def trace_extract_features(params, images, _unused, cfg: TraceConfig):
    """(T, 512, 512, 3) RGB (uint8 or float [0,255]) -> (T, 128, 128, 32)
    frozen-backbone features. uint8 input keeps the host->device transfer
    4x smaller — the dominant per-clip cost on a tunneled device."""
    store = _store(params, cfg)
    x = (images.astype(jnp.float32) / 255.0) * 2.0 - 1.0
    return hrnet_w32(store, x, prefix="backbone").astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(4,))
def trace_maps_and_detect(params, feature_maps, flows, hidden,
                          cfg: TraceConfig):
    """Device stage 1: maps + fixed-K per-frame detections + gathers."""
    store = _store(params, cfg)
    maps, hidden = trace_forward_maps(
        store, feature_maps, flows, hidden,
        temp_clip_length=cfg.temp_clip_length)
    det = parse_centermap3d(maps.center_maps_3d, cfg.max_person,
                            cfg.conf_thresh, nms_window=5)
    zyx = det.zyx.astype(jnp.int32)
    cams = _sample3d(maps.cam_maps_3d, zyx)          # (T, K, 3)
    motions = _sample3d(maps.motion_maps_3d, zyx)    # (T, K, 3)
    yx_flat = zyx[..., 1] * OUTMAP + zyx[..., 2]
    feats = sample_maps_at(maps.mesh_feature_maps, yx_flat)  # (T, K, 128)
    # initial normalized cams from the trans regressor in image mode
    init_cams = trace_regress_trans(
        store, cams.reshape(-1, 1, 3), feats.reshape(-1, 1, HC)
    ).reshape(cams.shape)
    f32 = lambda x: x.astype(jnp.float32)
    return (maps, hidden, det, f32(cams), f32(motions), f32(feats),
            f32(init_cams))


@functools.partial(jax.jit, static_argnums=(4,))
def trace_regress(params, traj_feats, cams_init_traj, traj_yx,
                  cfg: TraceConfig, maps=None):
    """Device stage 2: trajectory regression + map gathers at traj positions.

    traj_feats: (N, T, 128) gated features; cams_init_traj: (N, T, 3);
    traj_yx: (N, T, 2) int (y, x). Returns params_pred (N, T, 159), normed
    cams (N, T, 3), cam motions (N, T, 3), cam rot maps at traj (N, T, 6).
    """
    store = _store(params, cfg)
    params_pred = trace_regress_trajectory(store, traj_feats)
    normed_cams = trace_regress_trans(store, cams_init_traj, traj_feats)
    N, T = traj_yx.shape[:2]
    yx_flat = (traj_yx[..., 0] * OUTMAP + traj_yx[..., 1]).T  # (T, N)
    cam_motion = sample_maps_at(maps.cam_motion_maps, yx_flat)  # (T, N, 3)
    cam_rot = sample_maps_at(maps.cam_rot_maps, yx_flat)        # (T, N, 6)
    f32 = lambda x: x.astype(jnp.float32)
    return (f32(params_pred), f32(normed_cams),
            f32(cam_motion).transpose(1, 0, 2),
            f32(cam_rot).transpose(1, 0, 2))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _trace_smpl_stage(params_pred, normed_cams, cam_rot, smpls,
                      input_size: int, transfer_dtype: str = "float32"):
    """Final device stage, one jit: 6D->aa, SMPL+A, projection, world grots.

    params_pred: (N, T, 159); normed_cams: (N, T, 3); cam_rot: (N, T, 6);
    smpls: (adult, baby) SmplModel pytrees.
    """
    N, T = params_pred.shape[:2]
    pose6d = params_pred[..., 6:138].reshape(N * T, -1)
    thetas = jnp.concatenate([
        rot6d_to_axis_angle(pose6d),
        jnp.zeros((N * T, 6), params_pred.dtype)], axis=-1)
    betas = params_pred[..., 138:149].reshape(N * T, 11)
    verts, joints = smpla_forward(smpls[0], smpls[1], betas, thetas,
                                  root_align=True)
    cams = normed_cams.reshape(N * T, 3)
    depth = 1.0 / (cams[:, 0] * TAN_FOV_HALF_TRACE_J + 1e-3)
    xy = cams[:, jnp.asarray([2, 1])] * depth[:, None] * TAN_FOV_HALF_TRACE_J
    cam_trans = jnp.concatenate([xy, depth[:, None]], axis=-1)
    pj2d = perspective_projection(joints, cam_trans,
                                  focal_length=FOCAL_TRACE,
                                  img_size=input_size)
    world_grots = rot6d_to_axis_angle(
        (cam_rot + params_pred[..., 6:12]).reshape(N * T, 6))
    if transfer_dtype == "float16":
        # clamp into f16 range (degenerate slots -> inf otherwise)
        tcast = lambda a: jnp.clip(a, -6.0e4, 6.0e4).astype(jnp.float16)
    else:
        tcast = lambda a: a
    return (thetas, betas, tcast(verts), tcast(joints),
            cam_trans, tcast(pj2d), world_grots)


TAN_FOV_HALF_TRACE_J = float(np.tan(np.radians(25.0)))


@jax.jit
def _trace_gather_traj(mesh_feature_maps, cam_maps_3d, czyxs):
    """Trajectory-position gathers fused into one device call.

    czyxs: (N, T, 3) int. Returns (feat_traj (N, T, C), cams_init (N, T, 3)).
    """
    H = mesh_feature_maps.shape[1]
    yx_flat = (czyxs[..., 1] * H + czyxs[..., 2]).T             # (T, N)
    feat = sample_maps_at(mesh_feature_maps, yx_flat)           # (T, N, C)
    cams = _sample3d(cam_maps_3d, czyxs.transpose(1, 0, 2))     # (T, N, 3)
    return feat.transpose(1, 0, 2), cams.transpose(1, 0, 2)


class TracePipeline:
    """Stateful sequence processor (one per video / signal)."""

    def __init__(self, params: Dict[str, jax.Array],
                 smpl_adult: SmplModel, smpl_baby: SmplModel,
                 cfg: Optional[TraceConfig] = None,
                 seq_cfg: Optional[SeqConfig] = None,
                 flow_fn=None):
        self.params = params
        self.smpl_adult = smpl_adult
        self.smpl_baby = smpl_baby
        self.cfg = cfg or TraceConfig()
        self.seq_cfg = seq_cfg or SeqConfig()
        self.flow_fn = flow_fn
        self.profile = False           # fills stage_times per clip when True
        self.stage_times: Dict[str, float] = {}
        self.reset()

    def _tick(self, name: str, t0: float, sync=None) -> float:
        """Record a stage duration; `sync` forces a device fetch so the
        timing is real on async/remote backends."""
        import time as _time

        if not self.profile:
            return 0.0
        if sync is not None:
            np.asarray(sync)
        t1 = _time.perf_counter()
        self.stage_times[name] = self.stage_times.get(name, 0.0) + t1 - t0
        return t1

    def prefetch(self, frames: np.ndarray) -> "jax.Array":
        """Start the async host->device upload of a clip NOW (uint8), so it
        overlaps the previous clip's compute/host stages. Pass the returned
        handle to process_clip instead of the raw frames."""
        if frames.dtype != np.uint8:
            frames = np.clip(frames, 0, 255).astype(np.uint8)
        return jnp.asarray(frames)

    def reset(self):
        self.hidden = None
        self.memory = Memory5D()
        self.tracker: Optional[MotionOffsetTracker] = None
        self.init_world_cams: Dict[int, np.ndarray] = {}
        self.last_frame: Optional[np.ndarray] = None
        self.last_feature_map: Optional[jax.Array] = None

    def process_clip(self, frames: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
        """frames: (T, 512, 512, 3) float RGB [0, 255]. Returns per-person
        results for each frame of the clip (flattened N x T entries)."""
        import time as _time

        cfg = self.cfg
        T = frames.shape[0]
        self.stage_times = {}
        t0 = _time.perf_counter()
        # ONE uint8 upload of the clip, shared by backbone and flow (a
        # float32 upload of 8x512x512x3 is ~25 MB — the single biggest cost
        # per clip on the tunneled device). Already-uploaded handles from
        # prefetch() pass straight through.
        if isinstance(frames, jnp.ndarray):
            frames_dev = frames
        else:
            frames_dev = self.prefetch(frames)
        feats = trace_extract_features(self.params, frames_dev, None, cfg)
        t0 = self._tick("backbone", t0, sync=feats[0, 0, 0, 0])
        # prepend previous clip's last feature map (`trace2/main.py:66-77`)
        if self.last_feature_map is None:
            feats_full = jnp.concatenate([feats[:1], feats], axis=0)
        else:
            feats_full = jnp.concatenate(
                [self.last_feature_map[None], feats], axis=0)
        self.last_feature_map = feats[-1]

        if self.flow_fn is not None:
            prev = (self.last_frame if self.last_frame is not None
                    else frames_dev[:1])
            # frame pairs assembled ON DEVICE — no second clip upload
            frames_prev = jnp.concatenate([prev, frames_dev[:-1]], axis=0)
            flows = self.flow_fn(frames_prev, frames_dev)
            t0 = self._tick("flow", t0, sync=flows[0, 0, 0, 0])
        else:
            flows = jnp.zeros((T, OUTMAP, OUTMAP, 2))
        self.last_frame = frames_dev[-1:]

        maps, self.hidden, det, cams, motions, feats_det, init_cams = \
            trace_maps_and_detect(self.params, feats_full, flows,
                                  self.hidden, cfg)
        t0 = self._tick("maps_detect", t0, sync=det.scores)

        # ---- host: tracking + memory ----
        det_np = {k: np.asarray(v) for k, v in
                  {"mask": det.mask, "zyx": det.zyx, "scores": det.scores}.items()}
        cams_np, motions_np, init_np = (np.asarray(cams), np.asarray(motions),
                                        np.asarray(init_cams))
        det_czyxs, det_scores, det_cams, det_motions = [], [], [], []
        for f in range(T):
            m = det_np["mask"][f]
            det_czyxs.append(det_np["zyx"][f][m].astype(np.int32))
            det_scores.append(det_np["scores"][f][m])
            det_cams.append(init_np[f][m])
            det_motions.append(motions_np[f][m])
        traj, self.tracker = assemble_trajectories(
            det_czyxs, det_scores, det_cams, det_motions, self.seq_cfg,
            self.tracker)
        if traj is None:
            return None
        t0 = self._tick("host_tracking", t0)

        # sample features + init cams along (completed) trajectories in ONE
        # jitted call (eager per-op gathers cost a device round trip EACH on
        # remote-tunneled backends), then gate with the host memory5D.
        #
        # The track count N changes from clip to clip (births/deaths), and
        # every distinct N would re-jit the three downstream device stages —
        # on a remote device that recompile dominated the whole clip. Pad N
        # to the next power of two: a handful of compilations total, padded
        # rows are dead weight sliced off before any host work.
        N = traj.czyxs.shape[0]
        T_ = traj.czyxs.shape[1]
        n_pad = 1 << (N - 1).bit_length()
        czyxs_p = traj.czyxs
        if n_pad > N:
            czyxs_p = np.concatenate(
                [traj.czyxs, np.zeros((n_pad - N, T_, 3),
                                      traj.czyxs.dtype)], axis=0)
        feat_traj, cams_init_traj = map(np.array, _trace_gather_traj(
            maps.mesh_feature_maps, maps.cam_maps_3d, jnp.asarray(czyxs_p)))
        t0 = self._tick("traj_gather", t0)
        feat_traj[:N] = gate_features_with_memory(
            traj, feat_traj[:N], self.memory, self.seq_cfg)
        t0 = self._tick("memory_gate", t0)

        params_pred_d, normed_cams_d, cam_motion, cam_rot = trace_regress(
            self.params, jnp.asarray(feat_traj),
            jnp.asarray(cams_init_traj),
            jnp.asarray(czyxs_p[..., 1:]), cfg, maps=maps)
        params_pred = np.array(params_pred_d)          # (n_pad, T, 159)
        normed_cams = np.array(normed_cams_d)
        t0 = self._tick("regress", t0)

        if self.seq_cfg.smooth_pose_shape:
            params_pred[:N, :, 6:] = smooth_pose_params(
                traj, params_pred[:N, :, 6:], self.memory, self.seq_cfg)
        normed_cams[:N] = infill_and_smooth_cams(
            traj, normed_cams[:N], self.memory, self.seq_cfg)
        world_cams = accumulate_world_cams(
            traj, normed_cams[:N], np.asarray(cam_motion)[:N], self.memory,
            self.init_world_cams, self.seq_cfg)
        t0 = self._tick("host_smooth_world", t0)

        # ---- device: SMPL + projection, ONE jitted call (eager op-by-op
        # here costs seconds per clip on remote-tunneled devices) ----
        thetas, betas, verts, joints, cam_trans, pj2d, world_grots = \
            _trace_smpl_stage(
                jnp.asarray(params_pred), jnp.asarray(normed_cams),
                jnp.asarray(np.asarray(cam_rot)),
                (self.smpl_adult, self.smpl_baby), cfg.input_size,
                cfg.transfer_dtype)
        # fetch only the live N*T rows (padding is trailing, N-major)
        nt = N * T_
        thetas = np.asarray(thetas[:nt])
        betas = np.asarray(betas[:nt])
        cam_trans = np.asarray(cam_trans[:nt])
        normed_cams = normed_cams[:N]
        t0 = self._tick("smpl_project", t0, sync=pj2d[0])

        out = {
            "track_ids": np.repeat(traj.track_ids, T),
            "frame_ids": np.tile(np.arange(T), N),
            "frame_valid": traj.frame_valid.reshape(-1),
            "czyxs": traj.czyxs.reshape(N * T, 3),
            "cam": normed_cams.reshape(N * T, 3),
            "cam_trans": cam_trans,
            "world_cams": world_cams.reshape(N * T, 3),
            "world_grots": np.asarray(world_grots[:nt]),
            "smpl_thetas": thetas,
            "smpl_betas": betas,
            "verts": np.asarray(verts[:nt]).astype(np.float32),
            "joints": np.asarray(joints[:nt]).astype(np.float32),
            "pj2d": np.asarray(pj2d[:nt]).astype(np.float32),
        }
        self._tick("fetch_results", t0)
        return out
