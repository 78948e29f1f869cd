"""Training launcher: config -> datasets -> Trainer.fit.

Counterpart of `romp/train.py main()` + the shell launchers in
`scripts/` of the reference. Single process drives the whole mesh (SPMD);
for multi-host pods call `jax.distributed.initialize()` first (env-driven).
"""
from __future__ import annotations

import argparse
import sys


def build_datasets(cfg):
    """Instantiate the configured dataset mix from packed annotation files
    laid out as <data_root>/<name>.npz (records packs) — see
    romp_tpu/train/data/dataset.py converters for producing them."""
    import os.path as osp

    from romp_tpu.train.data.augment import AugmentConfig
    from romp_tpu.train.data.dataset import (
        MixedDataset, SingleDataset, load_pack,
    )

    aug = AugmentConfig(input_size=cfg.model.input_size,
                        flip_prob=cfg.data.flip_prob,
                        rot_factor=cfg.data.rot_aug,
                        color_jitter=cfg.data.color_jitter,
                        occlusion_prob=cfg.data.synthetic_occlusion_prob)
    datasets = []
    data_root = getattr(cfg, "data_root", "data")
    for name in cfg.data.datasets:
        pack = osp.join(data_root, f"{name}.npz")
        if not osp.exists(pack):
            print(f"WARNING: missing annotation pack {pack}; skipping",
                  file=sys.stderr)
            continue
        datasets.append(SingleDataset(load_pack(pack), name, aug,
                                      num_person=cfg.data.num_person))
    if not datasets:
        raise FileNotFoundError(
            "no annotation packs found; convert datasets first "
            "(romp_tpu/train/data/dataset.py converters)")
    probs = cfg.data.sample_probs if len(cfg.data.sample_probs) else None
    return MixedDataset(datasets, probs)


def run_trace_training(cfg, args) -> int:
    """TRACE video training: frozen image backbone + trainable temporal head
    (`trace/train_video.py:10-258`). Consumes video packs
    <data_root>/<name>.npz written by `video_dataset.save_video_pack`."""
    import json
    import os
    import os.path as osp
    import time

    import jax

    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from romp_tpu.pipeline.trace_pipeline import (
        TraceConfig as TracePipeConfig, trace_extract_features,
    )
    from romp_tpu.train.data.video_dataset import (
        ClipDataset, clip_batch_iterator, load_video_pack,
    )
    from romp_tpu.train.trace_train_step import (
        TraceTrainConfig, trace_init_train_state, trace_train_step,
    )
    from romp_tpu.train.trainer import save_train_state

    tc = cfg.trace
    seqs = []
    for name in cfg.data.datasets:
        pack = osp.join(cfg.data_root, f"{name}.npz")
        if not osp.exists(pack):
            print(f"WARNING: missing video pack {pack}; skipping",
                  file=sys.stderr)
            continue
        seqs.extend(load_video_pack(pack))
    if not seqs:
        raise FileNotFoundError(
            "no video packs found; convert sequences first "
            "(romp_tpu/train/data/video_dataset.py converters + "
            "save_video_pack)")
    ds = ClipDataset(seqs, clip_length=tc.clip_length,
                     max_tracks=tc.max_tracks,
                     input_size=cfg.model.input_size,
                     dynamic_aug_prob=tc.dynamic_aug_prob,
                     tracking_aug_prob=tc.tracking_aug_prob,
                     changing_ratio=tc.changing_ratio)

    # frozen image backbone (reference: separate pretrained image model,
    # `trace/train_video.py:47-65`)
    key = jax.random.PRNGKey(cfg.train.seed)
    if tc.backbone_ckpt and osp.exists(tc.backbone_ckpt):
        from romp_tpu.cli.common import load_checkpoint_flexible

        bparams = load_checkpoint_flexible(
            tc.backbone_ckpt,
            lambda r: init_romp_params(r, input_size=cfg.model.input_size))
    else:
        print("WARNING: no frozen-backbone checkpoint (trace.backbone_ckpt)"
              " — random-init features", file=sys.stderr)
        bparams = init_romp_params(key, input_size=cfg.model.input_size)
    pcfg = TracePipeConfig(input_size=cfg.model.input_size,
                           temp_clip_length=tc.clip_length,
                           compute_dtype=cfg.train.compute_dtype)
    # trace_extract_features is already jitted with cfg static
    feature_fn = lambda fr: trace_extract_features(bparams, fr, None, pcfg)

    flow_fn = None
    if tc.use_optical_flow and tc.raft_model_path \
            and osp.exists(tc.raft_model_path):
        from romp_tpu.models.raft import (
            filter_raft_state_dict, make_trace_flow_fn,
        )
        from romp_tpu.utils.checkpoint import load_torch_checkpoint

        import jax.numpy as jnp

        raft_params = {k: jnp.asarray(v) for k, v in filter_raft_state_dict({
            k: v for k, v in load_torch_checkpoint(
                tc.raft_model_path).items()
            if "num_batches_tracked" not in k}).items()}
        flow_fn = make_trace_flow_fn(raft_params)
    elif tc.use_optical_flow:
        print("WARNING: trace.use_optical_flow set but no RAFT weights — "
              "training with zero flow", file=sys.stderr)

    map_size = cfg.model.input_size // 4
    ttcfg = TraceTrainConfig(
        lr=cfg.train.lr, lr_milestones=tuple(cfg.train.lr_milestones),
        lr_decay=cfg.train.lr_decay, warmup_steps=cfg.train.warmup_steps,
        weight_decay=cfg.train.weight_decay, grad_clip=cfg.train.grad_clip,
        centermap3d_weight=tc.centermap3d_weight,
        motion_weight=tc.motion_weight, pose_weight=tc.pose_weight,
        shape_weight=tc.shape_weight,
        world_trans_weight=tc.world_trans_weight,
        world_grot_weight=tc.world_grot_weight,
        temp_shape_weight=tc.temp_shape_weight,
        compute_dtype=cfg.train.compute_dtype)
    tparams = init_trace_params(key, clip_length=tc.clip_length,
                                map_size=map_size)
    import jax.numpy as jnp
    import numpy as np

    mesh = make_mesh(cfg.mesh.n_devices, (cfg.mesh.data_axis,))
    state = replicate_tree(trace_init_train_state(tparams, ttcfg), mesh)

    # packed metrics + one-step-late consumption (same pipelining as
    # Trainer.fit): ONE fetch per step instead of ~10 scalar round trips
    def _packed(s, b):
        s2, m = trace_train_step(s, b, ttcfg)
        return s2, jnp.stack([m[k].astype(jnp.float32)
                              for k in sorted(m)])

    step_jit = jax.jit(_packed, donate_argnums=(0,))

    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    log_path = osp.join(cfg.train.checkpoint_dir, "trace_train_log.jsonl")
    t0 = time.time()
    it = clip_batch_iterator(ds, feature_fn, flow_fn=flow_fn,
                             batch_size=cfg.train.batch_size,
                             seed=cfg.train.seed)
    if cfg.train.num_workers > 0:
        from romp_tpu.train.data.loader import PrefetchLoader

        it = PrefetchLoader(
            lambda seed: clip_batch_iterator(
                ds, feature_fn, flow_fn=flow_fn,
                batch_size=cfg.train.batch_size, seed=seed),
            num_workers=cfg.train.num_workers,
            prefetch=cfg.train.prefetch_batches, seed=cfg.train.seed)
    last = {}
    names = None
    step0 = int(state.step)
    n_done = 0
    pending = None

    def consume(packed, step, i):
        nonlocal last
        vals = np.asarray(packed)
        last = dict(zip(names, vals.tolist()))
        if step % cfg.train.log_every == 0:
            rec = {"step": step, **last,
                   "steps_per_sec": round((i + 1) / (time.time() - t0), 3)}
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    for i, batch in enumerate(it):
        if args.max_steps is not None and i >= args.max_steps:
            break
        if names is None:
            _, mshape = jax.eval_shape(
                lambda s, b: trace_train_step(s, b, ttcfg), state, batch)
            names = tuple(sorted(mshape))
        batch = shard_batch(batch, mesh, cfg.mesh.data_axis)
        state, packed = step_jit(state, batch)
        n_done += 1
        if pending is not None:
            consume(*pending)
        pending = (packed, step0 + n_done, i)
    if pending is not None:
        consume(*pending)
    if hasattr(it, "close"):
        it.close()
    save_train_state(osp.join(cfg.train.checkpoint_dir, "trace_last.npz"),
                     state)
    print(f"trace training finished: {last}")
    return 0


def main(input_args=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data_root", type=str, default="data")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--smpl_path", type=str, default=None)
    parser.add_argument("overrides", nargs="*",
                        help="dotted config overrides, e.g. train.lr=1e-4")
    args = parser.parse_args(input_args)

    from romp_tpu.cli.common import load_smpl_assets_flexible
    from romp_tpu.config import dump_config, load_config
    from romp_tpu.smpl.body_model import SmplModel
    from romp_tpu.train.data.dataset import batch_iterator
    from romp_tpu.train.trainer import Trainer

    cfg = load_config(args.config, overrides=args.overrides)
    cfg.data_root = args.data_root
    dump_config(cfg, f"{cfg.train.checkpoint_dir}/active_config.yml")

    if cfg.model.version == "trace":
        return run_trace_training(cfg, args)

    assets = load_smpl_assets_flexible(args.smpl_path or cfg.smpl_assets)
    smpl = SmplModel.from_assets(assets)
    mixed = build_datasets(cfg)
    trainer = Trainer(cfg, smpl)
    if cfg.train.num_workers > 0:
        # batch assembly on worker threads, overlapped with device steps
        from romp_tpu.train.data.loader import PrefetchLoader

        batches = PrefetchLoader(
            lambda seed: batch_iterator(mixed, cfg.train.batch_size,
                                        seed=seed),
            num_workers=cfg.train.num_workers,
            prefetch=cfg.train.prefetch_batches, seed=cfg.train.seed)
    else:
        batches = batch_iterator(mixed, cfg.train.batch_size,
                                 seed=cfg.train.seed)
    try:
        metrics = trainer.fit(batches, max_steps=args.max_steps)
    finally:
        if hasattr(batches, "close"):
            batches.close()
    print(f"finished: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
