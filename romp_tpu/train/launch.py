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

    assets = load_smpl_assets_flexible(args.smpl_path or cfg.smpl_assets)
    smpl = SmplModel.from_assets(assets)
    mixed = build_datasets(cfg)
    trainer = Trainer(cfg, smpl)
    metrics = trainer.fit(
        batch_iterator(mixed, cfg.train.batch_size, seed=cfg.train.seed),
        max_steps=args.max_steps)
    print(f"finished: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
