"""Benchmark: ROMP HRNet-32 @ 512x512 end-to-end inference throughput/chip.

Measures the full jitted pipeline (normalize -> HRNet-W32 -> heads -> center
NMS/top-K parse -> param gather -> 6D->aa -> SMPL LBS -> projections +
least-squares camera translation) in bf16 compute on one chip, steady state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: 500 img/s/chip target (BASELINE.md; the torch reference runs ~24
FPS end-to-end on a GTX 1070Ti, `docs/romp_evaluation.md:96-102`).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.romp_pipeline import RompConfig, romp_inference
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    warmup = 5

    params = init_romp_params(jax.random.PRNGKey(0))
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(batch, 512, 512, 3).astype(np.float32) * 255.0)

    def measure(cfg):
        # The jitted step returns a scalar checksum over every output so a
        # tiny host fetch forces full execution each iteration
        # (block_until_ready is not a reliable barrier on the
        # remote-tunneled TPU platform here).
        @jax.jit
        def fn(p, im):
            out = romp_inference(p, smpl, im, cfg)
            chk = sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
            return chk

        for _ in range(warmup):
            float(fn(params, images))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(params, images))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # Headline (`value`) = the MIXED path (bf16 MXU matmuls, f32
    # activations): the CLI parity default, measured BIT-IDENTICAL to f32
    # on this chip on a trained checkpoint (CONVERGENCE.json
    # bf16_on_trained_tpu) — this is the number that satisfies the
    # BASELINE "<1 mm vs reference" gate. The bf16-activation fast path
    # (folded BN) rides alongside as a first-class field with ITS accuracy
    # evidence: 100% top-1 detection agreement, ~4.6 mm mean / 9.8 mm p95
    # vertex delta on trained weights (scripts/convergence.py --bf16_ckpt).
    t_mixed = measure(RompConfig(max_person=8, compute_dtype="bfloat16",
                                 act_dtype="float32", calc_smpl=True))
    t_bf16a = measure(RompConfig(max_person=8, compute_dtype="bfloat16",
                                 act_dtype="bfloat16", calc_smpl=True))

    mixed_img_s = batch / t_mixed
    bf16a_img_s = batch / t_bf16a
    print(json.dumps({
        "metric": "images/sec/chip (ROMP HRNet-32 512^2, e2e incl. SMPL; "
                  "mixed bf16-MXU/f32-act path, bit-identical to f32 on "
                  "chip: CONVERGENCE.json)",
        "value": round(mixed_img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(mixed_img_s / 500.0, 3),
        "p50_batch_ms": round(t_mixed * 1000.0, 2),
        "bf16_act_img_s": round(bf16a_img_s, 2),
        "bf16_act_vs_baseline": round(bf16a_img_s / 500.0, 3),
        "bf16_act_accuracy": "100% top-1 detection agreement, 6.3mm mean / "
                             "19.1mm p95 vertex delta on FULL-SCALE "
                             "(512^2 HRNet-W32) trained weights on this "
                             "chip; mixed is bit-identical there "
                             "(CONVERGENCE.json full_scale_512)",
        "batch": batch,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
