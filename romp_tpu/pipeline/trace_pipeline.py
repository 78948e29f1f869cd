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
    # Run the whole per-clip frontend (backbone -> flow -> maps -> detect)
    # as ONE jitted call instead of a call per stage + eager glue: each
    # call costs a ~15 ms host dispatch on a remote-tunneled device and
    # the stream is host-bound there. None = auto (on for TPU backends,
    # off elsewhere: the fused graph doubles CPU test compile time for no
    # dispatch win). Outputs are identical either way
    # (tests/test_trace_pipeline.py fused-equivalence test).
    fused_frontend: Optional[bool] = None


def _sample3d(maps: jax.Array, zyx: jax.Array) -> jax.Array:
    """maps: (T, D, H, W, C); zyx: (T, K, 3) int -> (T, K, C)."""
    T, D, H, W, C = maps.shape
    flat = maps.reshape(T, D * H * W, C)
    idx = (zyx[..., 0] * H + zyx[..., 1]) * W + zyx[..., 2]
    idx = jnp.clip(idx, 0, D * H * W - 1)
    return jnp.take_along_axis(
        flat, idx[..., None].astype(jnp.int32), axis=1, mode="clip")


def _copy_to_host_async(arr) -> None:
    """Kick off a device->host transfer without blocking; a later
    np.asarray finds the data (partly) on host already. Best-effort: a
    backend without the method just pays the transfer at fetch time."""
    try:
        arr.copy_to_host_async()
    except AttributeError:
        pass


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
    """Device stage 1: maps + fixed-K per-frame detections + gathers.

    Everything the host tracker consumes is packed into ONE (T, K, 11)
    float32 buffer — [mask, zyx(3), score, motion(3), init_cam(3)] — so the
    host pays a single fetch round trip instead of six (each fetch is a full
    network RTT on a remote-tunneled device).
    """
    return _maps_and_detect_core(_store(params, cfg), feature_maps, flows,
                                 hidden, cfg)


def _maps_and_detect_core(store, feature_maps, flows, hidden,
                          cfg: TraceConfig):
    maps, hidden = trace_forward_maps(
        store, feature_maps, flows, hidden,
        temp_clip_length=cfg.temp_clip_length)
    det = parse_centermap3d(maps.center_maps_3d, cfg.max_person,
                            cfg.conf_thresh, nms_window=5)
    zyx = det.zyx.astype(jnp.int32)
    cams = _sample3d(maps.cam_maps_3d, zyx)          # (T, K, 3)
    motions = _sample3d(maps.motion_maps_3d, zyx)    # (T, K, 3)
    yx_flat = zyx[..., 1] * maps.mesh_feature_maps.shape[2] + zyx[..., 2]
    feats = sample_maps_at(maps.mesh_feature_maps, yx_flat)  # (T, K, 128)
    # initial normalized cams from the trans regressor in image mode
    init_cams = trace_regress_trans(
        store, cams.reshape(-1, 1, 3), feats.reshape(-1, 1, HC)
    ).reshape(cams.shape)
    f32 = lambda x: x.astype(jnp.float32)
    det_pack = jnp.concatenate([
        det.mask.astype(jnp.float32)[..., None],
        zyx.astype(jnp.float32),
        f32(det.scores)[..., None],
        f32(motions),
        f32(init_cams)], axis=-1)                    # (T, K, 11)
    return maps, hidden, det_pack


@functools.partial(jax.jit, static_argnums=(2,))
def trace_regress(params, traj_pack, cfg: TraceConfig, maps=None):
    """Device stage 2: trajectory regression + map gathers at traj positions.

    traj_pack: ONE packed (N, T, 133) float32 upload —
    [gated features(128), init cams(3), traj (y, x)(2)] — each host->device
    array enqueue costs ~15 ms on a tunneled device, so the three inputs
    ride one buffer (int coords round-trip f32 exactly: map indices < 2^24).
    Returns ONE packed (N, T, 171) float32 buffer —
    [params_pred(159), normed_cams(3), cam_motion(3), cam_rot(6)]
    — one host fetch instead of four.
    """
    store = _store(params, cfg)
    traj_feats = traj_pack[..., :HC]
    cams_init_traj = traj_pack[..., HC:HC + 3]
    traj_yx = traj_pack[..., HC + 3:HC + 5].astype(jnp.int32)
    params_pred = trace_regress_trajectory(store, traj_feats)
    normed_cams = trace_regress_trans(store, cams_init_traj, traj_feats)
    N, T = traj_yx.shape[:2]
    yx_flat = (traj_yx[..., 0] * maps.cam_motion_maps.shape[2]
               + traj_yx[..., 1]).T                           # (T, N)
    cam_motion = sample_maps_at(maps.cam_motion_maps, yx_flat)  # (T, N, 3)
    cam_rot = sample_maps_at(maps.cam_rot_maps, yx_flat)        # (T, N, 6)
    f32 = lambda x: x.astype(jnp.float32)
    return jnp.concatenate([
        f32(params_pred), f32(normed_cams),
        f32(cam_motion).transpose(1, 0, 2),
        f32(cam_rot).transpose(1, 0, 2)], axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _trace_smpl_stage(smpl_pack, smpls, input_size: int,
                      transfer_dtype: str = "float32"):
    """Final device stage, one jit: 6D->aa, SMPL+A, projection, world grots.

    smpl_pack: ONE packed (N, T, 168) float32 upload —
    [params_pred(159), normed_cams(3), cam_rot(6)] — a single array enqueue
    instead of three (each costs ~15 ms on a tunneled device).
    smpls: (adult, baby) SmplModel pytrees.
    """
    params_pred = smpl_pack[..., :159]
    normed_cams = smpl_pack[..., 159:162]
    cam_rot = smpl_pack[..., 162:168]
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
    # Two packed fetch buffers (small f32 params + big transfer-dtype
    # geometry): 2 host fetches instead of 7 — each is an RTT on a
    # remote-tunneled device. Host split offsets are derived from the SMPL
    # model shapes (see TracePipeline._geom_split).
    pack_f32 = jnp.concatenate(
        [thetas, betas, cam_trans, world_grots], axis=-1)   # (NT, 89)
    pack_geom = tcast(jnp.concatenate(
        [verts.reshape(N * T, -1), joints.reshape(N * T, -1),
         pj2d.reshape(N * T, -1)], axis=-1))
    return pack_f32, pack_geom


TAN_FOV_HALF_TRACE_J = float(np.tan(np.radians(25.0)))


@jax.jit
def _trace_gather_traj(mesh_feature_maps, cam_maps_3d, czyxs):
    """Trajectory-position gathers fused into one device call.

    czyxs: (N, T, 3) int. Returns one packed (N, T, C+3) buffer
    [features(C), init_cams(3)] — a single host fetch.
    """
    H = mesh_feature_maps.shape[1]
    yx_flat = (czyxs[..., 1] * H + czyxs[..., 2]).T             # (T, N)
    feat = sample_maps_at(mesh_feature_maps, yx_flat)           # (T, N, C)
    cams = _sample3d(cam_maps_3d, czyxs.transpose(1, 0, 2))     # (T, N, 3)
    return jnp.concatenate(
        [feat.transpose(1, 0, 2), cams.transpose(1, 0, 2)], axis=-1)


@functools.lru_cache(maxsize=None)
def _build_frontends(cfg: TraceConfig, flow_fn):
    """ONE jitted device call for the whole per-clip frontend
    (backbone -> flow -> ConvGRU maps -> detect), replacing the
    call-per-stage chain plus its eager concat/slice glue.

    Why: on a remote-tunneled device every call — jitted stage or eager
    concat — costs a ~15 ms host dispatch (measured round 4), and the
    unfused path paid ~8 of them per clip (backbone, 2 feature concats,
    flow-pair concat, flow, last-frame slice, maps, det slicing). The
    pipelined stream's clip time is host-bound (zero-flow floor 884 ms vs
    645 ms device chain, BENCH_ALL round 4), so host dispatches are the
    binding cost, not device FLOPs. Two jit variants because the first
    clip has no carried state (hidden=None warm-start graph, reference
    `trace2/main.py:66-77`). Cached per (cfg, flow_fn) so every
    TracePipeline instance shares the compiled executables.
    """
    takes_seq = getattr(flow_fn, "takes_sequence", False)

    def _flows(frames_dev, prev_frame, feats_hw):
        if flow_fn is None:
            T = frames_dev.shape[0]
            return jnp.zeros((T,) + feats_hw + (2,))
        if takes_seq:
            return flow_fn(jnp.concatenate([prev_frame, frames_dev], 0))
        frames_prev = jnp.concatenate([prev_frame, frames_dev[:-1]], 0)
        return flow_fn(frames_prev, frames_dev)

    def _core(params, frames_dev, prev_frame, prev_feat, hidden):
        store = _store(params, cfg)
        x = (frames_dev.astype(jnp.float32) / 255.0) * 2.0 - 1.0
        feats = hrnet_w32(store, x, prefix="backbone").astype(jnp.float32)
        first = feats[:1] if prev_feat is None else prev_feat
        feats_full = jnp.concatenate([first, feats], axis=0)
        flows = _flows(frames_dev,
                       frames_dev[:1] if prev_frame is None else prev_frame,
                       feats.shape[1:3])
        maps, hidden, det_pack = _maps_and_detect_core(
            store, feats_full, flows, hidden, cfg)
        return feats[-1:], frames_dev[-1:], hidden, maps, det_pack

    @jax.jit
    def frontend_first(params, frames_dev):
        return _core(params, frames_dev, None, None, None)

    @jax.jit
    def frontend_rest(params, frames_dev, prev_frame, prev_feat, hidden):
        return _core(params, frames_dev, prev_frame, prev_feat, hidden)

    return frontend_first, frontend_rest


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
        if self.cfg.fused_frontend is None:
            self._fused = any(d.platform == "tpu" for d in jax.devices())
        else:
            self._fused = bool(self.cfg.fused_frontend)
        self.reset()

    def _tick(self, name: str, t0: float, sync=None) -> float:
        """Record a stage duration; `sync` forces a device barrier so the
        timing is real on async/remote backends. The barrier is a 4-byte
        checksum fetch, NOT a fetch of the synced tensor itself — fetching
        a full feature-map buffer over a tunneled device costs seconds and
        would swamp the stage being measured."""
        import time as _time

        if not self.profile:
            return 0.0
        if sync is not None:
            leaf = jax.tree_util.tree_leaves(sync)[0]
            if hasattr(leaf, "astype"):
                float(jnp.sum(leaf.astype(jnp.float32)))
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

    def _geom_split(self) -> tuple:
        """(3V, 3J) host-side split offsets of the packed geometry buffer,
        derived from the SMPL model shapes (no device fetch)."""
        m = self.smpl_adult
        V = m.v_template.shape[0]
        J = (m.J_regressor.shape[0] + m.extra_joints_idxs.shape[0]
             + m.J_regressor_extra9.shape[0] + m.J_regressor_h36m17.shape[0])
        return 3 * V, 3 * J

    def dispatch_clip(self, frames) -> Dict:
        """Enqueue the device frontend (backbone -> flow -> maps + detect)
        for one clip WITHOUT any host synchronization, and advance the
        cross-clip device state (GRU hidden, last frame/feature handles).

        On TPU backends (or cfg.fused_frontend=True) the whole frontend
        rides ONE jitted call: on a remote-tunneled device each call —
        jitted or eager glue — costs a ~15 ms host dispatch, and the
        stream's clip time is host-bound. Profile mode (per-stage timings)
        keeps the unfused chain.

        Returns a handle dict for collect_clip. Because nothing here blocks,
        the caller can dispatch clip k+1 before collecting clip k: the
        device then computes the next clip's frontend while the host runs
        this clip's tracking/smoothing (see process_stream).
        """
        if self.profile or not self._fused:
            return self._dispatch_clip_profiled(frames)
        T = int(frames.shape[0])
        if isinstance(frames, jnp.ndarray):
            frames_dev = frames
        else:
            frames_dev = self.prefetch(frames)
        front_first, front_rest = _build_frontends(self.cfg, self.flow_fn)
        if self.last_feature_map is None:
            (self.last_feature_map, self.last_frame, self.hidden, maps,
             det_pack) = front_first(self.params, frames_dev)
        else:
            (self.last_feature_map, self.last_frame, self.hidden, maps,
             det_pack) = front_rest(
                self.params, frames_dev, self.last_frame,
                self.last_feature_map, self.hidden)
        # start the (small) detection-pack transfer now so collect_clip's
        # blocking fetch finds it already on host
        _copy_to_host_async(det_pack)
        return {"maps": maps, "det_pack": det_pack, "T": T}

    def _dispatch_clip_profiled(self, frames) -> Dict:
        """Unfused frontend: one call per stage (+ sync ticks in profile
        mode so profile_trace.py can attribute time per stage). Same math
        as the fused call; default off-TPU, where per-call dispatch is
        cheap and the smaller graphs compile much faster."""
        import time as _time

        cfg = self.cfg
        T = int(frames.shape[0])
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
                [self.last_feature_map, feats], axis=0)
        self.last_feature_map = feats[-1:]

        if self.flow_fn is not None:
            prev = (self.last_frame if self.last_frame is not None
                    else frames_dev[:1])
            if getattr(self.flow_fn, "takes_sequence", False):
                # sequence convention: fnet runs once per unique frame
                # (raft_forward_seq) instead of once per pair side
                flows = self.flow_fn(
                    jnp.concatenate([prev, frames_dev], axis=0))
            else:
                # frame pairs assembled ON DEVICE — no second clip upload
                frames_prev = jnp.concatenate([prev, frames_dev[:-1]],
                                              axis=0)
                flows = self.flow_fn(frames_prev, frames_dev)
            t0 = self._tick("flow", t0, sync=flows[0, 0, 0, 0])
        else:
            # cached across clips: an eager zeros() is a device round trip
            # per clip on a tunneled backend
            hw = feats.shape[1:3]
            if getattr(self, "_zero_flows", None) is None \
                    or self._zero_flows.shape[:3] != (T,) + hw:
                self._zero_flows = jnp.zeros((T,) + hw + (2,))
            flows = self._zero_flows
        self.last_frame = frames_dev[-1:]

        maps, self.hidden, det_pack = trace_maps_and_detect(
            self.params, feats_full, flows, self.hidden, cfg)
        self._tick("maps_dispatch", t0)
        return {"maps": maps, "det_pack": det_pack, "T": T}

    def dispatch_clips(self, frames_list) -> List[Dict]:
        """Batched device frontend over CONSECUTIVE clips.

        The backbone is per-frame and flow is per-frame-pair, so both run
        once over the concatenated frames of all clips — amortizing the
        per-call dispatch/launch latency that dominates small-batch stages
        on a tunneled device — while the ConvGRU maps stage (whose hidden
        state is recurrent across clips) stays sequential per clip.
        Bit-identical to dispatch_clip called in order: the pair list of
        the concatenated flow call (prev_clip_last, A0), (A0, A1), ...,
        (A_last, B0), ... is exactly the sequence the per-clip calls build.
        """
        import time as _time

        if len(frames_list) == 1:
            return [self.dispatch_clip(frames_list[0])]
        cfg = self.cfg
        devs = [f if isinstance(f, jnp.ndarray) else self.prefetch(f)
                for f in frames_list]
        Ts = [int(d.shape[0]) for d in devs]
        offs = np.concatenate([[0], np.cumsum(Ts)])
        t0 = _time.perf_counter()
        frames_cat = jnp.concatenate(devs, axis=0)
        feats_cat = trace_extract_features(self.params, frames_cat, None,
                                           cfg)
        t0 = self._tick("backbone", t0, sync=feats_cat[0, 0, 0, 0])
        flows_cat = None
        if self.flow_fn is not None:
            prev0 = (self.last_frame if self.last_frame is not None
                     else devs[0][:1])
            if getattr(self.flow_fn, "takes_sequence", False):
                flows_cat = self.flow_fn(
                    jnp.concatenate([prev0, frames_cat], axis=0))
            else:
                frames_prev = jnp.concatenate([prev0, frames_cat[:-1]],
                                              axis=0)
                flows_cat = self.flow_fn(frames_prev, frames_cat)
            t0 = self._tick("flow", t0, sync=flows_cat[0, 0, 0, 0])
        self.last_frame = devs[-1][-1:]

        handles = []
        for i, T in enumerate(Ts):
            feats = feats_cat[offs[i]:offs[i + 1]]
            if flows_cat is not None:
                flows = flows_cat[offs[i]:offs[i + 1]]
            else:
                hw = feats.shape[1:3]
                if getattr(self, "_zero_flows", None) is None \
                        or self._zero_flows.shape[:3] != (T,) + hw:
                    self._zero_flows = jnp.zeros((T,) + hw + (2,))
                flows = self._zero_flows
            if self.last_feature_map is None:
                feats_full = jnp.concatenate([feats[:1], feats], axis=0)
            else:
                feats_full = jnp.concatenate(
                    [self.last_feature_map, feats], axis=0)
            self.last_feature_map = feats[-1:]
            maps, self.hidden, det_pack = trace_maps_and_detect(
                self.params, feats_full, flows, self.hidden, cfg)
            _copy_to_host_async(det_pack)
            handles.append({"maps": maps, "det_pack": det_pack, "T": T})
        self._tick("maps_dispatch", t0)
        return handles

    def collect_clip(self, handles: Dict) -> Optional[Dict[str, np.ndarray]]:
        """Host backend for a dispatched clip: fetch detections, track,
        regress trajectories, smooth, SMPL, fetch results.

        Equivalent to collect_clip_compute + finalize_clip back to back;
        process_stream splits them so the big geometry fetch of clip k
        rides the tunnel while clip k+1 computes."""
        return self.finalize_clip(self.collect_clip_compute(handles))

    def collect_clip_compute(self, handles: Dict) -> Optional[Dict]:
        """All host tracking/smoothing + device dispatches for a clip, up to
        (but not including) the final result fetch: ends by STARTING the
        async device->host copy of the two packed result buffers. Returns a
        pending handle for finalize_clip, or None when the clip has no
        tracks (exactly collect_clip's None)."""
        import time as _time

        cfg = self.cfg
        maps, T = handles["maps"], handles["T"]
        t0 = _time.perf_counter()
        # ---- host: tracking + memory (ONE packed fetch) ----
        det = np.asarray(handles["det_pack"])          # (T, K, 11)
        t0 = self._tick("maps_detect", t0)
        mask = det[..., 0] > 0.5
        zyx_np = det[..., 1:4].astype(np.int32)
        scores_np = det[..., 4]
        motions_np = det[..., 5:8]
        init_np = det[..., 8:11]
        det_czyxs, det_scores, det_cams, det_motions = [], [], [], []
        for f in range(T):
            m = mask[f]
            det_czyxs.append(zyx_np[f][m])
            det_scores.append(scores_np[f][m])
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
        gather = np.asarray(_trace_gather_traj(
            maps.mesh_feature_maps, maps.cam_maps_3d, jnp.asarray(czyxs_p)))
        feat_traj = np.ascontiguousarray(gather[..., :HC])
        cams_init_traj = gather[..., HC:]
        t0 = self._tick("traj_gather", t0)
        feat_traj[:N] = gate_features_with_memory(
            traj, feat_traj[:N], self.memory, self.seq_cfg)
        t0 = self._tick("memory_gate", t0)

        traj_pack = np.concatenate(
            [feat_traj, cams_init_traj,
             czyxs_p[..., 1:].astype(np.float32)], axis=-1)
        reg = np.asarray(trace_regress(
            self.params, jnp.asarray(traj_pack), cfg, maps=maps))
        params_pred = np.ascontiguousarray(reg[..., :159])  # (n_pad, T, 159)
        normed_cams = np.ascontiguousarray(reg[..., 159:162])
        cam_motion = reg[..., 162:165]
        cam_rot = reg[..., 165:171]
        t0 = self._tick("regress", t0)

        if self.seq_cfg.smooth_pose_shape:
            params_pred[:N, :, 6:] = smooth_pose_params(
                traj, params_pred[:N, :, 6:], self.memory, self.seq_cfg)
        normed_cams[:N] = infill_and_smooth_cams(
            traj, normed_cams[:N], self.memory, self.seq_cfg)
        world_cams = accumulate_world_cams(
            traj, normed_cams[:N], cam_motion[:N], self.memory,
            self.init_world_cams, self.seq_cfg)
        t0 = self._tick("host_smooth_world", t0)

        # ---- device: SMPL + projection, ONE jitted call (eager op-by-op
        # here costs seconds per clip on remote-tunneled devices) ----
        smpl_pack = np.concatenate(
            [params_pred, normed_cams, cam_rot.astype(np.float32)], axis=-1)
        pack_f32, pack_geom = _trace_smpl_stage(
            jnp.asarray(smpl_pack),
            (self.smpl_adult, self.smpl_baby), cfg.input_size,
            cfg.transfer_dtype)
        # slice the live N*T rows (padding is trailing, N-major) and start
        # the async device->host copies NOW; finalize_clip collects them
        # (on the pipelined stream: a clip later, so the dominant geometry
        # transfer — N*T rows of verts+joints+pj2d, megabytes on a tunneled
        # device — overlaps the next clip's compute)
        nt = N * T_
        pack_f32 = pack_f32[:nt]
        pack_geom = pack_geom[:nt]
        _copy_to_host_async(pack_f32)
        _copy_to_host_async(pack_geom)
        self._tick("smpl_dispatch", t0)

        return {
            "pack_f32": pack_f32, "pack_geom": pack_geom,
            "traj": traj, "world_cams": world_cams,
            "normed_cams": normed_cams[:N], "N": N, "T": T_,
        }

    def finalize_clip(self, pending: Optional[Dict]) \
            -> Optional[Dict[str, np.ndarray]]:
        """Blocking tail of collect_clip: fetch the two packed result
        buffers and assemble the per-clip output dict. Stateless — safe to
        run any number of clips behind collect_clip_compute."""
        import time as _time

        if pending is None:
            return None
        t0 = _time.perf_counter()
        traj = pending["traj"]
        N, T = pending["N"], pending["T"]
        nt = N * T
        p32 = np.asarray(pending["pack_f32"])                # (nt, 89)
        geom = np.asarray(pending["pack_geom"], np.float32)  # (nt, 3V+3J+2J)
        v3, j3 = self._geom_split()

        out = {
            "track_ids": np.repeat(traj.track_ids, T),
            "frame_ids": np.tile(np.arange(T), N),
            "frame_valid": traj.frame_valid.reshape(-1),
            "czyxs": traj.czyxs.reshape(N * T, 3),
            "cam": pending["normed_cams"].reshape(N * T, 3),
            "cam_trans": p32[:, 83:86],
            "world_cams": pending["world_cams"].reshape(N * T, 3),
            "world_grots": p32[:, 86:89],
            "smpl_thetas": p32[:, :72],
            "smpl_betas": p32[:, 72:83],
            "verts": geom[:, :v3].reshape(nt, -1, 3),
            "joints": geom[:, v3:v3 + j3].reshape(nt, -1, 3),
            "pj2d": geom[:, v3 + j3:].reshape(nt, -1, 2),
        }
        self._tick("fetch_results", t0)
        return out

    def process_clip(self, frames) -> Optional[Dict[str, np.ndarray]]:
        """frames: (T, 512, 512, 3) RGB [0, 255] (ndarray or a prefetch()
        handle). Returns per-person results for each frame of the clip
        (flattened N x T entries). Sequential dispatch + collect; for
        throughput over a whole sequence use process_stream."""
        return self.collect_clip(self.dispatch_clip(frames))

    def process_stream(self, clips, depth: int = 1,
                       frontend_batch: int = 1):
        """Pipelined driver over an iterable of clips: the device computes
        clip k+1's frontend (backbone/flow/maps — the bulk of the device
        work) while the host runs clip k's tracking/smoothing backend.

        frontend_batch > 1 additionally batches the backbone + flow of
        that many consecutive clips into single device calls
        (dispatch_clips) — higher throughput for offline sequences at the
        cost of one extra clip of latency per increment.

        The cross-clip recurrences (GRU hidden, tracker, memory5D) stay
        exact: dispatch only consumes device-side state already produced
        by the previous dispatch, and collect_clip_compute consumes host
        state in clip order; the stateless result fetch (finalize_clip)
        lags ONE further clip so the dominant device->host geometry
        transfer rides the tunnel while the next clip computes. Yields one
        result dict (or None) per clip, in order.
        """
        from collections import deque

        inflight: deque = deque()
        pending: deque = deque()
        group: List = []
        depth = max(depth, frontend_batch)
        for clip in clips:
            group.append(clip)
            if len(group) >= max(1, frontend_batch):
                inflight.extend(self.dispatch_clips(group))
                group = []
            while len(inflight) > depth:
                pending.append(
                    self.collect_clip_compute(inflight.popleft()))
                if len(pending) > 1:
                    yield self.finalize_clip(pending.popleft())
        if group:
            inflight.extend(self.dispatch_clips(group))
        while inflight:
            pending.append(self.collect_clip_compute(inflight.popleft()))
            if len(pending) > 1:
                yield self.finalize_clip(pending.popleft())
        while pending:
            yield self.finalize_clip(pending.popleft())
