"""Model export via jax.export: serialized StableHLO inference functions.

The reference's interop story is ONNX export (`simple_romp/romp/model.py:484`,
`bev/model.py:252`); the JAX-native equivalent is `jax.export` — the jitted
inference graph (weights embedded or as arguments) serialized to portable
StableHLO bytes, loadable from any JAX process (`jax.export.deserialize`)
or compiled by other StableHLO consumers (IREE, TF via PJRT, etc.).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def export_romp(checkpoint: str, out_path: str, batch: int = 1,
                backbone: str = "hrnet32", max_person: int = 8) -> str:
    import jax
    import jax.numpy as jnp

    from romp_tpu.cli.common import load_checkpoint_flexible
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.romp_pipeline import RompConfig, romp_inference
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    params = load_checkpoint_flexible(
        checkpoint, lambda rng: init_romp_params(rng, backbone=backbone))
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    cfg = RompConfig(max_person=max_person, backbone=backbone)

    def fn(images):
        return romp_inference(params, smpl, images, cfg)

    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch, 512, 512, 3), jnp.float32))
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def export_bev(checkpoint: str, out_path: str, batch: int = 1,
               max_person: int = 8, input_size: int = 512) -> str:
    """BEV export — parity with the reference's second ONNX graph
    (`simple_romp/bev/model.py:252`); SMPL+A (adult+baby) is embedded."""
    import jax
    import jax.numpy as jnp

    from romp_tpu.cli.common import load_checkpoint_flexible
    from romp_tpu.models.bev import init_bev_params
    from romp_tpu.pipeline.bev_pipeline import BevConfig, bev_inference
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    params = load_checkpoint_flexible(
        checkpoint,
        lambda rng: init_bev_params(rng, input_size=input_size))
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = BevConfig(max_person=max_person, input_size=input_size)

    def fn(images):
        return bev_inference(params, adult, baby, images, cfg)

    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch, input_size, input_size, 3),
                             jnp.float32))
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    return out_path


def load_exported(path: str):
    import jax

    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())


def main(input_args=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("output", type=str)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--backbone", type=str, default="hrnet32")
    parser.add_argument("--model", type=str, default="romp",
                        choices=("romp", "bev"))
    args = parser.parse_args(input_args)
    if args.model == "bev":
        out = export_bev(args.checkpoint, args.output, args.batch)
    else:
        out = export_romp(args.checkpoint, args.output, args.batch,
                          args.backbone)
    print(f"exported StableHLO to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
