"""TRACE training step: temporal head on frozen image features, SPMD.

Reference flow (`trace/train_video.py:10-258`): the image backbone is FROZEN
(features precomputed per clip); only the temporal head trains, supervised
with GT 2D/3D trajectories (`trace/lib/models/trace.py:378`
train_regression): 3D centermap focal, motion-offset supervision from GT
trajectory differences, trajectory pose/shape losses, world-translation
consistency and temporal smoothing losses (video_loss.py).

Batch schema (fixed shapes; one clip per sample):
  feature_maps (B, T+1, 128, 128, 32)  frozen-backbone features (+carry)
  flows        (B, T, 128, 128, 2)
  traj_czyx    (B, N, T, 3) int GT trajectory bins (z, y, x)
  traj_valid   (B, N, T) bool
  traj3d_gt    (B, N, T, 3) GT camera-space positions
  world_trans_gt (B, N, T, 3); world_grot_gt (B, N, T, 3) axis-angle
  pose_gt      (B, N, T, 66); betas_gt (B, N, T, 11)
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from romp_tpu.models.layers import ParamStore
from romp_tpu.models.trace import (
    trace_forward_maps, trace_regress_trajectory, trace_regress_trans,
)
from romp_tpu.ops.centermap import sample_maps_at
from romp_tpu.ops.rotations import rot6d_to_axis_angle
from romp_tpu.train import losses
from romp_tpu.train.centermap_gt import generate_centermap3d
from romp_tpu.train.train_step import split_params
from romp_tpu.train.video_losses import (
    motion_offset3d_loss, quaternion_angle_loss,
    temporal_shape_consistency_loss, world_trans_consistency_loss,
)


class TraceTrainConfig(NamedTuple):
    lr: float = 1e-4
    lr_milestones: Tuple[int, ...] = ()  # MultiStepLR steps (romp/base.py:70)
    lr_decay: float = 0.1
    warmup_steps: int = 0
    weight_decay: float = 1e-6
    grad_clip: float = 3.0
    centermap3d_weight: float = 1.0
    motion_weight: float = 40.0
    pose_weight: float = 80.0
    shape_weight: float = 6.0
    world_trans_weight: float = 50.0
    world_grot_weight: float = 40.0
    temp_shape_weight: float = 10.0
    prior_weight: float = 1.6
    loss_thresh: float = 1000.0
    compute_dtype: str = "float32"


class TraceTrainState(NamedTuple):
    trainable: Dict[str, jax.Array]
    bn_state: Dict[str, jax.Array]
    opt_state: Any
    step: jax.Array


def _optimizer(cfg: TraceTrainConfig):
    from romp_tpu.train.train_step import make_lr_schedule

    lr = make_lr_schedule(cfg.lr, cfg.lr_milestones, cfg.lr_decay,
                          cfg.warmup_steps)
    return optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                    optax.adamw(lr, weight_decay=cfg.weight_decay)),
        max_consecutive_errors=10000)


def trace_init_train_state(params, cfg: TraceTrainConfig) -> TraceTrainState:
    trainable, bn_state = split_params(params)
    return TraceTrainState(trainable, bn_state,
                           _optimizer(cfg).init(trainable),
                           jnp.zeros((), jnp.int32))


def trace_compute_losses(trainable, bn_state, batch,
                         cfg: TraceTrainConfig, prior=None):
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    store = ParamStore({**trainable, **bn_state}, train=True,
                       compute_dtype=dt)
    B, T1 = batch["feature_maps"].shape[:2]
    T = T1 - 1
    N = batch["traj_valid"].shape[1]

    # One clip's losses as a PURE function, vmapped over the batch: the
    # graph is traced/compiled ONCE instead of unrolled B times (a batch-8
    # dryrun previously compiled 8 copies of the temporal head). BN stat
    # updates are returned, vmapped out, and averaged over clips.
    def clip_losses(fm, fl, czyx, valid, pose_gt, betas_gt, traj3d_gt,
                    wtrans_gt, wgrot_gt):
        st = ParamStore({**trainable, **bn_state}, train=True,
                        compute_dtype=dt)
        maps, _ = trace_forward_maps(st, fm, fl, temp_clip_length=T)
        D, H = maps.center_maps_3d.shape[1], maps.center_maps_3d.shape[2]

        c3d_gt = generate_centermap3d(
            czyx.transpose(1, 0, 2), valid.T, map_size=H, depth_size=D)
        loss_cm = losses.focal_heatmap_loss(maps.center_maps_3d, c3d_gt)

        # per-trajectory samples from maps: motion offsets + features
        zyx_t = czyx.transpose(1, 0, 2)            # (T, N, 3)
        from romp_tpu.pipeline.trace_pipeline import _sample3d

        motion = _sample3d(maps.motion_maps_3d, zyx_t).transpose(1, 0, 2)
        cams_init = _sample3d(maps.cam_maps_3d, zyx_t).transpose(1, 0, 2)
        yx_flat = zyx_t[..., 1] * H + zyx_t[..., 2]
        feats = sample_maps_at(maps.mesh_feature_maps, yx_flat
                               ).transpose(1, 0, 2)  # (N, T, C)
        cam_motion = sample_maps_at(maps.cam_motion_maps, yx_flat
                                    ).transpose(1, 0, 2)
        cam_rot = sample_maps_at(maps.cam_rot_maps, yx_flat
                                 ).transpose(1, 0, 2)

        params_pred = trace_regress_trajectory(st, feats)  # (N, T, 159)
        normed_cams = trace_regress_trans(st, cams_init, feats)

        w = valid.astype(jnp.float32)
        pose_pred = rot6d_to_axis_angle(
            params_pred[..., 6:132].reshape(N * T, -1)).reshape(N, T, 63)
        loss_pose = losses.pose_l2_loss(
            pose_gt[..., 3:].reshape(N * T, 63),
            pose_pred.reshape(N * T, 63), w.reshape(-1))
        loss_shape = losses.shape_loss(
            betas_gt.reshape(N * T, -1)[:, :10],
            params_pred[..., 138:148].reshape(N * T, 10), w.reshape(-1))

        loss_motion = motion_offset3d_loss(motion, traj3d_gt, valid)
        # world accumulation: init at first frame + cumsum of cam motions
        world_pred = (normed_cams[:, :1]
                      + jnp.cumsum(cam_motion, axis=1))
        loss_wtrans = world_trans_consistency_loss(
            world_pred, wtrans_gt, valid)
        wgrot_pred = rot6d_to_axis_angle(
            (cam_rot + params_pred[..., 6:12]).reshape(N * T, 6)
        ).reshape(N, T, 3)
        loss_wgrot = quaternion_angle_loss(wgrot_pred, wgrot_gt, w)
        loss_tshape = temporal_shape_consistency_loss(
            params_pred[..., 138:149], valid)

        m = {
            "centermap3d": cfg.centermap3d_weight * loss_cm,
            "motion": cfg.motion_weight * loss_motion,
            "pose": cfg.pose_weight * loss_pose,
            "shape": cfg.shape_weight * loss_shape,
            "world_trans": cfg.world_trans_weight * loss_wtrans,
            "world_grot": cfg.world_grot_weight * loss_wgrot,
            "temp_shape": cfg.temp_shape_weight * loss_tshape,
        }
        if prior is not None and cfg.prior_weight > 0:
            from romp_tpu.train.priors import gmm_prior_loss

            m["prior"] = cfg.prior_weight * gmm_prior_loss(
                prior, pose_pred.reshape(N * T, 63), w.reshape(-1))
        return m, st.stats_updates

    m_b, stats_b = jax.vmap(clip_losses)(
        batch["feature_maps"], batch["flows"], batch["traj_czyx"],
        batch["traj_valid"], batch["pose_gt"], batch["betas_gt"],
        batch["traj3d_gt"], batch["world_trans_gt"],
        batch["world_grot_gt"])
    loss_dict = {k: jnp.mean(v) for k, v in m_b.items()}
    store.stats_updates = {k: v.mean(axis=0) for k, v in stats_b.items()}
    from romp_tpu.train.loss_merger import merge_losses

    total, metrics = merge_losses(loss_dict, cfg.loss_thresh)
    return total, (store.stats_updates, metrics)


def trace_train_step(state: TraceTrainState, batch, cfg: TraceTrainConfig,
                     prior=None
                     ) -> Tuple[TraceTrainState, Dict[str, jax.Array]]:
    grad_fn = jax.value_and_grad(trace_compute_losses, has_aux=True)
    (_, (bn_updates, metrics)), grads = grad_fn(
        state.trainable, state.bn_state, batch, cfg, prior)
    updates, opt_state = _optimizer(cfg).update(grads, state.opt_state,
                                                state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    return TraceTrainState(trainable, {**state.bn_state, **bn_updates},
                           opt_state, state.step + 1), metrics


def make_trace_synthetic_batch(rng: jax.Array, batch_size: int = 1,
                               num_tracks: int = 2, clip_len: int = 2,
                               map_size: int = 128):
    ks = jax.random.split(rng, 10)
    B, N, T = batch_size, num_tracks, clip_len
    czyx = jnp.stack([
        jax.random.randint(ks[0], (B, N, T), 0, 64),
        jax.random.randint(ks[1], (B, N, T), 0, map_size),
        jax.random.randint(ks[2], (B, N, T), 0, map_size)], -1)
    return {
        "feature_maps": jax.random.normal(
            ks[3], (B, T + 1, map_size, map_size, 32)) * 0.3,
        "flows": jax.random.normal(ks[4], (B, T, map_size, map_size, 2)),
        "traj_czyx": czyx,
        "traj_valid": jnp.ones((B, N, T), bool),
        "traj3d_gt": jax.random.normal(ks[5], (B, N, T, 3)),
        "world_trans_gt": jax.random.normal(ks[6], (B, N, T, 3)),
        "world_grot_gt": jax.random.normal(ks[7], (B, N, T, 3)) * 0.5,
        "pose_gt": jax.random.normal(ks[8], (B, N, T, 66)) * 0.3,
        "betas_gt": jax.random.normal(ks[9], (B, N, T, 11)) * 0.5,
    }
