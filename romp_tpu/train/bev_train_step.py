"""BEV training step — 3D-centermap supervision + relative losses, SPMD.

Reference flow (`romp/lib/models/bev_model.py` + `result_parser.py:97`
match_params_new for model_version>4 + `calc_loss.py`): forward the BEV
maps, build GT 3D centermaps (depth bin from the annotated/derived camera
scale via the depth anchors), sample cam/params at GT 3D centers, supervise
with focal3D + keypoint/param losses + BEV's relative depth/age losses.

Same SPMD shape discipline as the ROMP step: fixed (B, P) persons + masks.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from romp_tpu.models.bev import (
    bev_forward_maps, bev_regress_params, cam3dmap_anchor, cam_to_depth_bin,
    coord_maps_3d_halfz,
)
from romp_tpu.models.layers import ParamStore
from romp_tpu.ops.centermap import CenterDetections3D, sample_maps_at
from romp_tpu.ops.projection import (
    FOCAL_LENGTH_BEV, perspective_projection,
)
from romp_tpu.pipeline.bev_pipeline import bev_cam_to_trans, unpack_bev_params
from romp_tpu.smpl.body_model import SmplModel, smpla_forward
from romp_tpu.train import losses
from romp_tpu.train.centermap_gt import generate_centermap3d
from romp_tpu.train.relative_losses import (
    age_group_loss, kid_offset_loss, relative_depth_loss,
)
from romp_tpu.train.train_step import TrainConfig, is_bn_stat, split_params


class BevTrainConfig(NamedTuple):
    base: TrainConfig = TrainConfig()
    centermap3d_weight: float = 1.0
    rdepth_weight: float = 10.0
    rage_weight: float = 2.0
    # direct supervision of the sampled (scale, y, x) cams at GT centers
    # (the reference's Cam loss on match_params GT cams,
    # `romp/lib/loss_funcs/calc_loss.py`). BEV needs it more than ROMP:
    # the perspective depth 1/(s*tan+eps) is singular at s->0, so without
    # a well-scaled anchor on s the kp2d/depth gradients blow the cam maps
    # up instead of guiding them (measured: cam scale drifting to -94 over
    # 600 synthetic-convergence steps with this loss absent).
    cam_weight: float = 100.0
    input_size: int = 512
    backbone: str = "hrnet32"


def bev_compute_losses(trainable, bn_state, batch, smpl_adult: SmplModel,
                       smpl_baby: SmplModel, cfg: BevTrainConfig,
                       prior=None):
    """batch adds to the ROMP schema:
      person_scales  (B, P) GT weak-persp scale (for the depth-anchor bin)
      depth_ids      (B, P) int ordinal depth layer, -1 unannotated
      age_gts        (B, P) int age group, -1 unannotated
      kid_offsets_gt (B, P) float in [0,1], -1 unannotated
      betas_gt       (B, P, 11)
    """
    base = cfg.base
    dt = jnp.bfloat16 if base.compute_dtype == "bfloat16" else jnp.float32
    store = ParamStore({**trainable, **bn_state}, train=True,
                       compute_dtype=dt)
    anchors_np = cam3dmap_anchor()
    anchors = jnp.asarray(anchors_np)
    coord3d = jnp.asarray(
        coord_maps_3d_halfz(cfg.input_size // 4, anchors_np))
    maps = bev_forward_maps(store, batch["image"], anchors, coord3d,
                            backbone=cfg.backbone)
    B, P = batch["person_mask"].shape
    S = maps.center_maps_fv.shape[1]

    # GT 3D center bins: depth from the person's scale via the anchor table.
    cz = cam_to_depth_bin(batch["person_scales"], anchors)
    cx = jnp.clip(jnp.floor((batch["person_centers"][..., 0] + 1) / 2 * S),
                  0, S - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor((batch["person_centers"][..., 1] + 1) / 2 * S),
                  0, S - 1).astype(jnp.int32)
    mask = batch["person_mask"]
    centermap3d_gt = generate_centermap3d(
        jnp.stack([cz, cy, cx], -1), mask, map_size=S,
        depth_size=maps.center_maps_3d.shape[1])

    det = CenterDetections3D(
        flat_inds=(cy * S + cx).astype(jnp.int32),
        zyx=jnp.stack([cz, cy, cx], -1).astype(jnp.float32),
        scores=jnp.ones((B, P)), mask=mask)
    params_pred = bev_regress_params(store, maps, det, anchors)
    out = unpack_bev_params(params_pred)

    flat = lambda a: a.reshape(B * P, *a.shape[2:])
    w = flat(mask).astype(jnp.float32)
    verts, joints = smpla_forward(smpl_adult, smpl_baby,
                                  flat(out["smpl_betas"]),
                                  flat(out["smpl_thetas"]))
    # TRAINING-SAFE depth: 1/(s*tan+eps) has a pole at s -> -eps/tan whose
    # infinite gradient the rdepth hinge happily rides — measured on the
    # synthetic convergence runs: scales dragged to -1.3 and pinned there
    # (the pj2d path's max(z, 1e-6) then zeroes ITS gradient, so nothing
    # pulls back). Fencing the denominator at 0.05 kills the pole's pull
    # (zero subgradient below the floor) so the Cam L2 governs recovery.
    # Inference (bev_cam_to_trans) keeps the reference formula exactly.
    from romp_tpu.pipeline.bev_pipeline import TAN_FOV_HALF
    camf = flat(out["cam"])
    denom = jnp.maximum(camf[..., 0] * TAN_FOV_HALF + 1e-3, 0.05)
    depth = (1.0 / denom)[..., None]
    cam_trans = jnp.concatenate(
        [jnp.stack([camf[..., 2], camf[..., 1]], -1) * depth * TAN_FOV_HALF,
         depth], axis=-1)
    pj2d = perspective_projection(
        joints, cam_trans,
        focal_length=FOCAL_LENGTH_BEV * cfg.input_size / 512.0,
        img_size=cfg.input_size)   # 512-calibrated focal, size-invariant

    kp3d_w = w * flat(batch["kp3d_mask"]).astype(jnp.float32)
    pose_w = w * flat(batch["pose_mask"]).astype(jnp.float32)
    loss_dict = {
        "centermap3d": cfg.centermap3d_weight * losses.focal_heatmap_loss(
            maps.center_maps_3d, centermap3d_gt),
        "centermap": base.centermap_weight * losses.focal_heatmap_loss(
            maps.center_maps_fv[..., 0],
            jnp.max(centermap3d_gt, axis=1)),
        "kp2d": base.kp2d_weight * losses.kp2d_l2_loss(
            flat(batch["kp2d_gt"]), pj2d[:, :54],
            w * flat(batch["kp2d_mask"]).astype(jnp.float32)
            if "kp2d_mask" in batch else w),
        "mpjpe": base.mpjpe_weight * losses.mpjpe_loss(
            flat(batch["kp3d_gt"]), joints[:, :54], kp3d_w),
        "pose": base.pose_weight * losses.pose_l2_loss(
            flat(batch["pose_gt"]), flat(out["smpl_thetas"])[:, :66],
            pose_w),
        "shape": base.shape_weight * losses.shape_loss(
            flat(batch["betas_gt"])[:, :10],
            flat(out["smpl_betas"])[:, :10], w,
            flat(batch["betas_mask"]).astype(jnp.float32)),
        "cam": cfg.cam_weight * (jnp.sum(
            jnp.sum((out["cam"] - jnp.stack(
                [batch["person_scales"],
                 batch["person_centers"][..., 1],
                 batch["person_centers"][..., 0]], -1)) ** 2, -1)
            * mask.astype(jnp.float32))
            / jnp.maximum(jnp.sum(mask), 1)),
        "rdepth": cfg.rdepth_weight * relative_depth_loss(
            cam_trans.reshape(B, P, 3)[..., 2], batch["depth_ids"], mask),
        "rage": cfg.rage_weight * (
            age_group_loss(out["smpl_betas"][..., 10], batch["age_gts"],
                           mask)
            + 2.0 * kid_offset_loss(out["smpl_betas"][..., 10],
                                    batch["kid_offsets_gt"], mask)),
    }
    if prior is not None and base.prior_weight > 0:
        from romp_tpu.train.priors import gmm_prior_loss

        loss_dict["prior"] = base.prior_weight * gmm_prior_loss(
            prior, flat(out["smpl_thetas"])[:, 3:66], w)

    from romp_tpu.train.loss_merger import merge_losses

    total, metrics = merge_losses(loss_dict, base.loss_thresh,
                                  base.new_training)
    return total, (store.stats_updates, metrics)


class BevTrainState(NamedTuple):
    trainable: Dict[str, jax.Array]
    bn_state: Dict[str, jax.Array]
    opt_state: Any
    step: jax.Array


def bev_make_optimizer(cfg: BevTrainConfig):
    from romp_tpu.train.train_step import make_lr_schedule

    lr = make_lr_schedule(cfg.base.lr, cfg.base.lr_milestones,
                          cfg.base.lr_decay, cfg.base.warmup_steps)
    return optax.apply_if_finite(
        optax.chain(
            optax.clip_by_global_norm(cfg.base.grad_clip),
            optax.adamw(lr, weight_decay=cfg.base.weight_decay)),
        max_consecutive_errors=10000)


def bev_init_train_state(params, cfg: BevTrainConfig) -> BevTrainState:
    trainable, bn_state = split_params(params)
    return BevTrainState(trainable, bn_state,
                         bev_make_optimizer(cfg).init(trainable),
                         jnp.zeros((), jnp.int32))


def bev_train_step(state: BevTrainState, batch, smpl_adult, smpl_baby,
                   cfg: BevTrainConfig, prior=None
                   ) -> Tuple[BevTrainState, Dict[str, jax.Array]]:
    grad_fn = jax.value_and_grad(bev_compute_losses, has_aux=True)
    (_, (bn_updates, metrics)), grads = grad_fn(
        state.trainable, state.bn_state, batch, smpl_adult, smpl_baby, cfg,
        prior)
    updates, opt_state = bev_make_optimizer(cfg).update(
        grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    return BevTrainState(trainable, {**state.bn_state, **bn_updates},
                         opt_state, state.step + 1), metrics


def make_bev_synthetic_batch(rng: jax.Array, batch_size: int,
                             num_person: int = 3, input_size: int = 512):
    from romp_tpu.train.train_step import make_synthetic_batch

    base = make_synthetic_batch(rng, batch_size, num_person, input_size)
    B, P = base["person_mask"].shape
    ks = jax.random.split(jax.random.fold_in(rng, 7), 4)
    base.update({
        "person_scales": jax.random.uniform(ks[0], (B, P), jnp.float32,
                                            0.2, 3.0),
        "depth_ids": jax.random.randint(ks[1], (B, P), 0, 3),
        "age_gts": jax.random.randint(ks[2], (B, P), 0, 4),
        "kid_offsets_gt": jax.random.uniform(ks[3], (B, P), jnp.float32,
                                             0.0, 1.0),
        "betas_gt": jnp.concatenate(
            [base["betas_gt"], jnp.zeros((B, P, 1))], -1),
    })
    return base
