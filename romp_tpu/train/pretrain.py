"""2D-pose backbone pretraining driver.

Counterpart of the reference's pretrain entry (`romp/pretrain.py:1-208`,
launched by `scripts/pretrain.sh` with `configs/pretrain.yml` — the yml
itself is not shipped upstream): train the backbone bottom-up on 2D pose
only, with joint heatmaps + associative-embedding tags + the person-center
map, before the 3D training stages load the pretrained backbone.

TPU redesign: one jitted SPMD step over the data mesh; the kp/AE head is an
extra conv head ("pretrain_head.*" parameter namespace) on the shared
backbone + CoordConv trunk, alongside the regular center head
("final_layers.2") so both pretrain. Loading the result into the main
trainer is a plain flat-dict load — the extra head keys are simply unused.

Deviation noted: the reference supervises COCO-17 heatmaps
(`romp/pretrain.py` Heatmap_AE_loss(17, ...)); here the heatmaps cover the
full SMPL_ALL_54 joint set with per-joint visibility masks (invalid = -2
annotations), a superset that avoids a per-dataset joint remap.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from romp_tpu.models.layers import ParamStore
from romp_tpu.models.romp import _head, coord_maps
from romp_tpu.train.heatmap_ae import (
    ae_loss, generate_joint_heatmaps, heatmap_mse_loss,
)
from romp_tpu.train.train_step import make_lr_schedule, split_params

NUM_JOINTS = 54


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    lr: float = 3e-4
    lr_milestones: Tuple[int, ...] = ()
    lr_decay: float = 0.1
    warmup_steps: int = 0
    weight_decay: float = 1e-6
    grad_clip: float = 3.0
    heatmap_weight: float = 100.0      # MSE on unit-peak gaussians is tiny
    ae_weight: float = 1.0             # pull + push
    centermap_weight: float = 1.0
    heatmap_sigma: float = 2.0
    num_joints: int = NUM_JOINTS
    compute_dtype: str = "float32"
    backbone: str = "hrnet32"


class PretrainState(NamedTuple):
    trainable: Dict[str, jax.Array]
    bn_state: Dict[str, jax.Array]
    opt_state: Any
    step: jax.Array


def pretrain_forward(store: ParamStore, image: jax.Array,
                     cfg: PretrainConfig):
    """Backbone -> CoordConv -> (kp heatmaps+tags, center map).

    Returns (heat (B, S, S, J), tags (B, S, S, J), center (B, S, S, 1)).
    """
    if cfg.backbone == "hrnet32":
        from romp_tpu.models.hrnet import hrnet_w32

        feat = hrnet_w32(store, (image / 255.0) * 2.0 - 1.0,
                         prefix="backbone")
    else:
        from romp_tpu.models.resnet import resnet50

        feat = resnet50(store, image, prefix="backbone")
    cm = coord_maps(feat.shape[1], feat.dtype)
    feat = jnp.concatenate(
        [feat, jnp.broadcast_to(cm, (feat.shape[0], *cm.shape[1:]))], axis=-1)
    J = cfg.num_joints
    kp_ae = _head(store, "pretrain_head.kp_ae", feat, 2 * J)
    center = _head(store, "final_layers.2", feat, 1)
    return kp_ae[..., :J], kp_ae[..., J:], center


def init_pretrain_params(rng: jax.Array, cfg: PretrainConfig,
                         input_size: int = 512) -> Dict[str, jax.Array]:
    store = ParamStore(rng=rng)
    pretrain_forward(store, jnp.zeros((1, input_size, input_size, 3),
                                      jnp.float32), cfg)
    return store.params


def _optimizer(cfg: PretrainConfig):
    lr = make_lr_schedule(cfg.lr, cfg.lr_milestones, cfg.lr_decay,
                          cfg.warmup_steps)
    return optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                    optax.adamw(lr, weight_decay=cfg.weight_decay)),
        max_consecutive_errors=10000)


def init_pretrain_state(params, cfg: PretrainConfig) -> PretrainState:
    trainable, bn_state = split_params(params)
    return PretrainState(trainable, bn_state,
                         _optimizer(cfg).init(trainable),
                         jnp.zeros((), jnp.int32))


def pretrain_losses(trainable, bn_state, batch, cfg: PretrainConfig):
    """batch: image (B,S,S,3) [0,255]; kp2d_gt (B,P,J,2) in [-1,1] with
    invalid = -2; person_centers (B,P,2); person_bbox_hw (B,P,2);
    person_mask (B,P)."""
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    store = ParamStore({**trainable, **bn_state}, train=True,
                       compute_dtype=dt)
    heat, tags, center = pretrain_forward(store, batch["image"], cfg)
    heat = heat.astype(jnp.float32)
    tags = tags.astype(jnp.float32)
    center = center.astype(jnp.float32)

    kp2d = batch["kp2d_gt"][..., :cfg.num_joints, :]
    vis = jnp.all(kp2d > -1.99, axis=-1) \
        & batch["person_mask"][..., None]                       # (B, P, J)
    S = heat.shape[1]
    heat_gt = generate_joint_heatmaps(kp2d, vis, S, cfg.heatmap_sigma)

    from romp_tpu.train import losses
    from romp_tpu.train.centermap_gt import generate_centermap, person_radius

    centers = batch["person_centers"]
    radii = person_radius(batch["person_bbox_hw"], S)
    center_gt = generate_centermap(centers, radii, batch["person_mask"], S)

    pull, push = ae_loss(tags, kp2d, vis, batch["person_mask"])
    loss_dict = {
        "heatmap": cfg.heatmap_weight * heatmap_mse_loss(heat, heat_gt),
        "AE": cfg.ae_weight * (pull + push),
        "centermap": cfg.centermap_weight * losses.focal_heatmap_loss(
            center[..., 0], center_gt),
    }
    total = sum(loss_dict.values())
    metrics = {**loss_dict, "total": total}
    return total, (store.stats_updates, metrics)


def pretrain_step(state: PretrainState, batch, cfg: PretrainConfig
                  ) -> Tuple[PretrainState, Dict[str, jax.Array]]:
    grad_fn = jax.value_and_grad(pretrain_losses, has_aux=True)
    (_, (bn_updates, metrics)), grads = grad_fn(
        state.trainable, state.bn_state, batch, cfg)
    updates, opt_state = _optimizer(cfg).update(
        grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    finite = jnp.all(jnp.asarray([jnp.all(jnp.isfinite(g))
                                  for g in jax.tree_util.tree_leaves(grads)]))
    metrics["grads_finite"] = finite.astype(jnp.float32)
    bn_state = {k: jnp.where(finite, bn_updates.get(k, state.bn_state[k]),
                             state.bn_state[k])
                for k in state.bn_state}
    return PretrainState(trainable, bn_state, opt_state,
                         state.step + 1), metrics


def make_synthetic_pretrain_batch(rng: jax.Array, batch_size: int,
                                  num_person: int = 4, input_size: int = 64):
    ks = jax.random.split(rng, 4)
    B, P = batch_size, num_person
    return {
        "image": jax.random.uniform(ks[0], (B, input_size, input_size, 3),
                                    jnp.float32, 0.0, 255.0),
        "kp2d_gt": jax.random.uniform(ks[1], (B, P, NUM_JOINTS, 2),
                                      jnp.float32, -0.9, 0.9),
        "person_centers": jax.random.uniform(ks[2], (B, P, 2), jnp.float32,
                                             -0.9, 0.9),
        "person_bbox_hw": jnp.full((B, P, 2), 0.5),
        "person_mask": jnp.ones((B, P), bool),
    }


def main(input_args=None) -> int:
    """Pretrain launcher: same annotation packs as the main trainer
    (2D-only datasets — COCO/MPII/CrowdPose... suffice; 3D fields unused)."""
    import argparse
    import json
    import os
    import os.path as osp
    import time

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data_root", type=str, default="data")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(input_args)

    from romp_tpu.config import dump_config, load_config
    from romp_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from romp_tpu.train.data.dataset import batch_iterator
    from romp_tpu.train.launch import build_datasets
    from romp_tpu.train.trainer import save_train_state

    cfg = load_config(args.config, overrides=args.overrides)
    cfg.data_root = args.data_root
    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    dump_config(cfg, f"{cfg.train.checkpoint_dir}/active_config.yml")

    pcfg = PretrainConfig(
        lr=cfg.train.lr, lr_milestones=tuple(cfg.train.lr_milestones),
        lr_decay=cfg.train.lr_decay, warmup_steps=cfg.train.warmup_steps,
        weight_decay=cfg.train.weight_decay, grad_clip=cfg.train.grad_clip,
        compute_dtype=cfg.train.compute_dtype, backbone=cfg.model.backbone)
    mesh = make_mesh(cfg.mesh.n_devices, (cfg.mesh.data_axis,))
    params = init_pretrain_params(jax.random.PRNGKey(cfg.train.seed), pcfg,
                                  input_size=cfg.model.input_size)
    state = replicate_tree(init_pretrain_state(params, pcfg), mesh)
    import jax.numpy as jnp
    import numpy as np

    # packed metrics + one-step-late consumption (the Trainer.fit
    # pipelining): ONE fetch per step instead of a scalar round trip each
    def _packed(s, b):
        s2, m = pretrain_step(s, b, pcfg)
        return s2, jnp.stack([m[k].astype(jnp.float32) for k in sorted(m)])

    step_jit = jax.jit(_packed, donate_argnums=(0,))

    mixed = build_datasets(cfg)
    log_path = osp.join(cfg.train.checkpoint_dir, "pretrain_log.jsonl")
    t0 = time.time()
    names = None
    step0 = int(state.step)
    n_done = 0
    pending = None

    def consume(packed, step, i):
        vals = np.asarray(packed)
        if step % cfg.train.log_every == 0:
            rec = {"step": step, **dict(zip(names, vals.tolist())),
                   "steps_per_sec": round((i + 1) / (time.time() - t0), 3)}
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    for i, batch in enumerate(batch_iterator(mixed, cfg.train.batch_size,
                                             seed=cfg.train.seed)):
        if args.max_steps is not None and i >= args.max_steps:
            break
        batch = {k: batch[k] for k in ("image", "kp2d_gt", "person_centers",
                                       "person_bbox_hw", "person_mask")}
        if names is None:
            _, mshape = jax.eval_shape(
                lambda s, b: pretrain_step(s, b, pcfg), state, batch)
            names = tuple(sorted(mshape))
        batch = shard_batch(batch, mesh, cfg.mesh.data_axis)
        state, packed = step_jit(state, batch)
        n_done += 1
        if pending is not None:
            consume(*pending)
        pending = (packed, step0 + n_done, i)
    if pending is not None:
        consume(*pending)
    save_train_state(osp.join(cfg.train.checkpoint_dir, "pretrain_last.npz"),
                     state)
    print(f"pretrain finished at step {step0 + n_done}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
