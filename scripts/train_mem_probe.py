"""Probe ROMP training throughput/HBM at a given batch size on the device.

Usage: python scripts/train_mem_probe.py [--batch 64] [--size 512]
       [--act bfloat16] [--remat stage] [--steps 5]
Prints one JSON line with img/s (or the OOM error).
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--compute", default="bfloat16")
    ap.add_argument("--act", default="bfloat16")
    ap.add_argument("--remat", default="stage")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel
    from romp_tpu.train.priors import GmmPrior
    from romp_tpu.train.train_step import (
        TrainConfig, init_train_state, make_synthetic_batch, train_step,
    )

    cfg = TrainConfig(compute_dtype=args.compute, act_dtype=args.act,
                      remat=args.remat)
    params = init_romp_params(jax.random.PRNGKey(0), input_size=args.size)
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    prior = GmmPrior.synthetic(num_gaussians=2, seed=0)
    state = init_train_state(params, cfg)
    batch = make_synthetic_batch(jax.random.PRNGKey(1),
                                 batch_size=args.batch,
                                 input_size=args.size)
    step = jax.jit(lambda s, b: train_step(s, b, smpl, cfg, prior),
                   donate_argnums=(0,))
    state, metrics = step(state, batch)          # compile
    # axon-safe timing barrier: fetch a scalar, not block_until_ready
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    total = float(metrics["total"])
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "batch": args.batch, "size": args.size, "act": args.act,
        "remat": args.remat, "step_ms": round(dt * 1e3, 1),
        "img_s": round(args.batch / dt, 1), "loss": round(total, 3),
        "grads_finite": float(metrics["grads_finite"]),
        "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
