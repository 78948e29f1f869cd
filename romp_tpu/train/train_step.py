"""ROMP training step — SPMD data-parallel, matching-mode supervision.

Reference flow (`romp/train.py:37-54` + `romp/lib/maps_utils/result_parser.py:33`
matching_forward): forward the net, sample parameter maps AT GROUND-TRUTH
center locations, run SMPL, compute the composite loss
(`romp/lib/loss_funcs/calc_loss.py:25`), backprop under AMP, DDP-allreduce.

Here the whole step is one jitted SPMD function over a `Mesh`: the batch is
sharded on the "data" axis, parameters replicated; XLA inserts gradient psums
(replacing NCCL allreduce) and global BatchNorm statistics emerge from the
sharded batch reductions (replacing SyncBatchNorm).

Fixed shapes: each image carries up to P ground-truth persons with a validity
mask — the matching step is a gather, not a dynamic match (the reference's
center matching reduces to sampling at GT centers for supervision; its
argmin-matching refinement can be layered on later without changing shapes).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from romp_tpu.models.layers import ParamStore
from romp_tpu.models.romp import romp_forward
from romp_tpu.ops.centermap import sample_maps_at
from romp_tpu.ops.projection import weak_perspective_projection
from romp_tpu.pipeline.romp_pipeline import unpack_params
from romp_tpu.smpl.body_model import SmplModel, smpl_forward
from romp_tpu.train import losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Loss weights follow `romp/lib/config.py` defaults / configs/v1.yml."""

    lr: float = 3e-4
    # MultiStepLR decay (`romp/base.py:70`: milestones=[60,80] EPOCHS,
    # gamma=adjust_lr_factor) — expressed here in STEPS (the trainer loop is
    # step-based); () disables. lr_decay mirrors --adjust_lr_factor
    # (`romp/lib/config.py:86`, default 0.1).
    lr_milestones: Tuple[int, ...] = ()
    lr_decay: float = 0.1
    warmup_steps: int = 0              # linear warmup from 0 (TPU-friendly
    # replacement for the reference's fixed initial lr; 0 = off)
    weight_decay: float = 1e-6
    grad_clip: float = 3.0
    centermap_weight: float = 1.0
    kp2d_weight: float = 400.0
    mpjpe_weight: float = 200.0
    pampjpe_weight: float = 360.0
    pose_weight: float = 80.0
    shape_weight: float = 6.0
    prior_weight: float = 1.6          # GMM pose prior (configs/v1.yml:45)
    angle_prior_weight: float = 0.0    # SMPLify bend prior (off in the
    # reference objective — prior_loss.py:114 is shipped but calc_loss only
    # adds the GMM term; keep it available for SMPLify-style fitting)
    loss_thresh: float = 1000.0        # per-loss clamp (learnable_loss.py:50)
    new_training: bool = False         # det-only warmup (learnable_loss.py:45)
    compute_dtype: str = "float32"
    act_dtype: str = "float32"         # bfloat16 halves stashed activations
    remat: str = "stage"               # "stage" | "net" | "none"
    cam_scale_base: float = 1.1
    match_pred_centers: bool = False   # matching_forward refinement
    match_radius: float = 3.0          # map-pixel match gate
    backbone: str = "hrnet32"


class TrainState(NamedTuple):
    trainable: Dict[str, jax.Array]
    bn_state: Dict[str, jax.Array]
    opt_state: Any
    step: jax.Array


def is_bn_stat(name: str) -> bool:
    return name.endswith("running_mean") or name.endswith("running_var")


def split_params(params: Dict[str, jax.Array]):
    trainable = {k: v for k, v in params.items() if not is_bn_stat(k)}
    bn_state = {k: v for k, v in params.items() if is_bn_stat(k)}
    return trainable, bn_state


def make_lr_schedule(lr: float, milestones: Tuple[int, ...] = (),
                     decay: float = 0.1, warmup_steps: int = 0):
    """MultiStepLR(milestones, gamma) + optional linear warmup, as an optax
    schedule (`romp/base.py:70`). Returns a plain float when both are off so
    the optimizer stays schedule-free."""
    if not milestones and not warmup_steps:
        return lr
    ms = jnp.asarray(milestones, jnp.int32) if milestones else None

    def schedule(count):
        count = jnp.asarray(count)
        scale = jnp.asarray(lr, jnp.float32)
        if ms is not None:
            scale = scale * jnp.power(
                jnp.asarray(decay, jnp.float32),
                jnp.sum(count >= ms).astype(jnp.float32))
        if warmup_steps:
            scale = scale * jnp.minimum(
                1.0, (count + 1).astype(jnp.float32) / warmup_steps)
        return scale

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # apply_if_finite = the reference's NaN-loss step skip
    # (`romp/train.py:45-46`), done on-device: a step with non-finite
    # gradients leaves params untouched instead of poisoning them.
    lr = make_lr_schedule(cfg.lr, cfg.lr_milestones, cfg.lr_decay,
                          cfg.warmup_steps)
    return optax.apply_if_finite(
        optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(lr, weight_decay=cfg.weight_decay),
        ),
        max_consecutive_errors=10000,
    )


def init_train_state(params: Dict[str, jax.Array],
                     cfg: TrainConfig) -> TrainState:
    trainable, bn_state = split_params(params)
    opt_state = make_optimizer(cfg).init(trainable)
    return TrainState(trainable, bn_state, opt_state, jnp.zeros((), jnp.int32))


def run_net_remat(trainable, bn_state, image, cfg: TrainConfig):
    """ROMP net forward under the configured rematerialization policy.

    "stage" (default): each backbone stage / head block is its own
    `jax.checkpoint` segment — the backward stashes only the inter-stage
    boundary tensors across the graph and re-materializes one stage at a
    time, so peak HBM is max-over-stages instead of sum-over-net. A single
    whole-net checkpoint ("net") re-runs the ENTIRE forward inside the
    backward, re-materializing every intermediate at once — it only saves
    the stash lifetime, not the peak, which is why batch 64 at 512^2 OOMed.
    BN batch-stat updates are threaded out of each segment explicitly
    (tracers may not escape a checkpoint scope via store mutation).

    Returns (center_maps, params_maps, stats_updates).
    """
    from romp_tpu.models.romp import romp_forward_segments

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    adt = jnp.bfloat16 if cfg.act_dtype == "bfloat16" else jnp.float32

    def seg_runner(seg):
        def run(tr, bn, arrs):
            st = ParamStore({**tr, **bn}, train=True, compute_dtype=dt,
                            act_dtype=adt)
            out = seg(st, arrs)
            return out, st.stats_updates
        return run

    if cfg.remat == "stage":
        stats_updates = {}
        arrs = [image]
        for seg in romp_forward_segments(cfg.backbone):
            arrs, su = jax.checkpoint(seg_runner(seg))(
                trainable, bn_state, arrs)
            stats_updates.update(su)
        center_maps, params_maps = arrs
        return center_maps, params_maps, stats_updates

    def net_fwd(tr, bn, image):
        store = ParamStore({**tr, **bn}, train=True, compute_dtype=dt,
                           act_dtype=adt)
        cm, pm = romp_forward(store, image, backbone=cfg.backbone)
        return cm, pm, store.stats_updates

    if cfg.remat == "net":
        net_fwd = jax.checkpoint(net_fwd)
    return net_fwd(trainable, bn_state, image)


def compute_losses(trainable, bn_state, batch, smpl: SmplModel,
                   cfg: TrainConfig, prior=None):
    """Forward + composite loss. Returns (total, (bn_updates, metrics)).

    batch keys (all fixed-shape):
      image          (B, S, S, 3) float RGB [0,255]
      person_centers (B, P, 2) normalized (x, y) in [-1, 1]; invalid = -2
      person_bbox_hw (B, P, 2) normalized bbox (h, w) sizes
      person_mask    (B, P) bool
      (GT center heatmaps and flat sampling indices are derived here, ON
       DEVICE, from the centers — the host ships only compact annotations)
      kp2d_gt        (B, P, 54, 2) in [-1,1], invalid joints = -2
      kp3d_gt        (B, P, 54, 3), invalid joints = -2
      kp3d_mask      (B, P) bool — person has 3D supervision
      pose_gt        (B, P, 66) axis-angle (global + 21 body joints)
      pose_mask      (B, P) bool
      betas_gt       (B, P, 10)
      betas_mask     (B, P) bool
    """
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    adt = jnp.bfloat16 if cfg.act_dtype == "bfloat16" else jnp.float32

    center_maps, params_maps, stats_updates = run_net_remat(
        trainable, bn_state, batch["image"], cfg)
    # Loss math always in f32: with bf16 activations, sigmoid saturates to
    # exactly 0/1 and the focal loss' log turns -inf (NaN grads). The bf16
    # memory win lives INSIDE the remat segments; this one cast is tiny.
    center_maps = center_maps.astype(jnp.float32)
    params_maps = params_maps.astype(jnp.float32)
    store = ParamStore({**trainable, **bn_state}, train=True,
                       compute_dtype=dt, act_dtype=adt)
    store.stats_updates = stats_updates

    B, P = batch["person_mask"].shape
    map_size = center_maps.shape[1]
    from romp_tpu.train.centermap_gt import generate_centermap, person_radius

    centers = batch["person_centers"]
    radii = person_radius(batch["person_bbox_hw"], map_size)
    centermap_gt = generate_centermap(centers, radii, batch["person_mask"],
                                      map_size)
    cx = jnp.clip(jnp.floor((centers[..., 0] + 1) / 2 * map_size), 0,
                  map_size - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor((centers[..., 1] + 1) / 2 * map_size), 0,
                  map_size - 1).astype(jnp.int32)
    person_inds = cy * map_size + cx

    if cfg.match_pred_centers:
        # matching_forward refinement (`romp/lib/maps_utils/result_parser.py:
        # 97,190`): parse the PREDICTED centermap and supervise each GT person
        # at its nearest predicted peak (within a radius), falling back to the
        # GT location — robust to center drift, fixed-shape via top-K + argmin.
        from romp_tpu.ops.centermap import parse_centermap2d

        det = parse_centermap2d(
            jax.lax.stop_gradient(center_maps[..., 0]), P, -1e9)
        d = jnp.linalg.norm(
            det.yx[:, None, :, :]
            - jnp.stack([cy, cx], -1)[:, :, None, :].astype(jnp.float32),
            axis=-1)                                   # (B, P_gt, K_pred)
        best = jnp.argmin(d, axis=-1)                  # (B, P_gt)
        best_d = jnp.min(d, axis=-1)
        matched_inds = jnp.take_along_axis(det.flat_inds, best, axis=1)
        person_inds = jnp.where(best_d <= cfg.match_radius, matched_inds,
                                person_inds)

    params_pred = sample_maps_at(params_maps, person_inds)
    out = unpack_params(params_pred, cfg.cam_scale_base)

    flat = lambda a: a.reshape(B * P, *a.shape[2:])
    w = flat(batch["person_mask"]).astype(jnp.float32)
    verts, joints = smpl_forward(smpl, flat(out["smpl_betas"]),
                                 flat(out["smpl_thetas"]))
    pj2d = weak_perspective_projection(joints, flat(out["cam"]))

    kp3d_w = w * flat(batch["kp3d_mask"]).astype(jnp.float32)
    pose_w = w * flat(batch["pose_mask"]).astype(jnp.float32)
    # bbox-only persons (CrowdHuman-style) supervise the centermap only
    # (vmask_2d[:,0]=False in the reference); kp2d_mask excludes them here.
    kp2d_w = w * flat(batch["kp2d_mask"]).astype(jnp.float32) \
        if "kp2d_mask" in batch else w
    j54 = joints[:, :54]

    loss_dict = {
        "centermap": cfg.centermap_weight * losses.focal_heatmap_loss(
            center_maps[..., 0], centermap_gt),
        "kp2d": cfg.kp2d_weight * losses.kp2d_l2_loss(
            flat(batch["kp2d_gt"]), pj2d[:, :54], kp2d_w),
        "mpjpe": cfg.mpjpe_weight * losses.mpjpe_loss(
            flat(batch["kp3d_gt"]), j54, kp3d_w),
        "pampjpe": cfg.pampjpe_weight * losses.pampjpe_loss(
            flat(batch["kp3d_gt"])[:, :24], joints[:, :24], kp3d_w),
        "pose": cfg.pose_weight * losses.pose_l2_loss(
            flat(batch["pose_gt"]), flat(out["smpl_thetas"])[:, :66], pose_w),
        "shape": cfg.shape_weight * losses.shape_loss(
            flat(batch["betas_gt"]), out["smpl_betas"].reshape(B * P, -1),
            w, flat(batch["betas_mask"]).astype(jnp.float32)),
    }
    if prior is not None and cfg.prior_weight > 0:
        # GMM max-mixture pose prior on the body pose (no global orient),
        # /100 + low-value gating inside gmm_prior_loss
        # (`calc_loss.py:151-155`); weight from configs/v1.yml:45.
        from romp_tpu.train.priors import angle_prior, gmm_prior_loss

        body_pose = flat(out["smpl_thetas"])[:, 3:66]
        loss_dict["prior"] = cfg.prior_weight * gmm_prior_loss(
            prior, body_pose, w)
        if cfg.angle_prior_weight > 0:
            bend = angle_prior(flat(out["smpl_thetas"]))
            loss_dict["prior"] = loss_dict["prior"] + (
                cfg.angle_prior_weight
                * jnp.sum(bend * w) / (jnp.sum(w) + 1e-6))

    from romp_tpu.train.loss_merger import merge_losses

    total, metrics = merge_losses(loss_dict, cfg.loss_thresh,
                                  cfg.new_training)
    return total, (store.stats_updates, metrics)


def train_step(state: TrainState, batch, smpl: SmplModel, cfg: TrainConfig,
               prior=None) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One SGD step. jit this with cfg static; under a Mesh with the batch
    sharded on "data", gradients/BN stats are globally correct SPMD."""
    grad_fn = jax.value_and_grad(compute_losses, has_aux=True)
    (_, (bn_updates, metrics)), grads = grad_fn(
        state.trainable, state.bn_state, batch, smpl, cfg, prior)
    updates, opt_state = make_optimizer(cfg).update(
        grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    finite = jnp.all(jnp.asarray([jnp.all(jnp.isfinite(g))
                                  for g in jax.tree_util.tree_leaves(grads)]))
    metrics["grads_finite"] = finite.astype(jnp.float32)
    # BN stats follow the same skip rule as params on a non-finite step.
    bn_state = {k: jnp.where(finite, bn_updates.get(k, state.bn_state[k]),
                             state.bn_state[k])
                for k in state.bn_state}
    return TrainState(trainable, bn_state, opt_state,
                      state.step + 1), metrics


def make_synthetic_batch(rng: jax.Array, batch_size: int, num_person: int = 4,
                         input_size: int = 512):
    """Random well-formed training batch (for tests, dryruns, benchmarks)."""
    ks = jax.random.split(rng, 8)
    B, P = batch_size, num_person
    mask = jnp.ones((B, P), bool)
    return {
        "image": jax.random.uniform(ks[0], (B, input_size, input_size, 3),
                                    jnp.float32, 0.0, 255.0),
        "person_centers": jax.random.uniform(ks[1], (B, P, 2), jnp.float32,
                                             -0.9, 0.9),
        "person_bbox_hw": jnp.full((B, P, 2), 0.5),
        "person_mask": mask,
        "kp2d_gt": jax.random.uniform(ks[2], (B, P, 54, 2), jnp.float32,
                                      -1.0, 1.0),
        "kp3d_gt": jax.random.normal(ks[3], (B, P, 54, 3)) * 0.3,
        "kp3d_mask": jnp.ones((B, P), bool),
        "pose_gt": jax.random.normal(ks[4], (B, P, 66)) * 0.3,
        "pose_mask": jnp.ones((B, P), bool),
        "betas_gt": jax.random.normal(ks[5], (B, P, 10)) * 0.5,
        "betas_mask": jnp.ones((B, P), bool),
    }
