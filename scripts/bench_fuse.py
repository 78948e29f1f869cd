"""On-chip A/B of the Pallas fused BasicBlock-chain kernel (VERDICT r4 #2).

For each HRNet-W32 branch shape (the 4-block stride-1 chains the kernel
fuses, `simple_romp/romp/model.py:54-83`) this times, on the real chip:
  xla    the layer-library formulation XLA compiles (conv per block,
         mixed path: bf16 MXU, f32 activations, folded BN)
  fused  fused_basic_chain (ops/pallas_fuse.py): whole chain VMEM-resident

Prints one JSON line per shape + a summary. Compiles are per-shape, so a
single pathological Mosaic compile can't starve the other measurements
(the round-4 environment SIGKILLed ALL fresh Mosaic compiles; round 5
re-probed OK).

Run on TPU:  python scripts/bench_fuse.py [--batch 128] [--blocks 4]
CPU check:   JAX_PLATFORMS=cpu python scripts/bench_fuse.py --check
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _med(fn, iters, warmup=3):
    import jax.numpy as jnp

    for _ in range(warmup):
        float(jnp.sum(fn()))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated channel list, e.g. 32,256 — "
                         "bound one invocation to a subset of branch "
                         "shapes (remote compiles can be slow)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.iters = 2, 2

    from romp_tpu.models.layers import ParamStore
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.ops.pallas_fuse import (
        fused_basic_chain, pack_chain_weights,
    )

    B = args.batch
    # (branch stage/index in HRNet-W32, spatial, channels)
    shapes = [("stage2.0.branches.0", 128, 32),
              ("stage2.0.branches.1", 64, 64),
              ("stage3.0.branches.2", 32, 128),
              ("stage4.0.branches.3", 16, 256)]
    t0 = time.time()
    print(f"init params... (device {jax.devices()[0]})", flush=True)
    params = init_romp_params(jax.random.PRNGKey(0))
    jax.block_until_ready(list(params.values())[0])
    print(f"params ready in {time.time()-t0:.1f}s", flush=True)

    only = ({int(c) for c in args.only.split(",")} if args.only else None)
    rows = []
    for prefix, hw, C in shapes:
        if args.check and hw > 64:
            continue
        if only is not None and C not in only:
            continue
        w, scale, shift = pack_chain_weights(
            params, f"backbone.{prefix}", args.blocks)
        w, scale, shift = map(jnp.asarray, (w, scale, shift))
        x = jnp.asarray(np.random.RandomState(0).rand(
            B, hw, hw, C).astype(np.float32))

        @jax.jit
        def run_xla(x, params=params, prefix=prefix):
            st = ParamStore(params, compute_dtype=jnp.bfloat16,
                            act_dtype=jnp.float32)
            from romp_tpu.models.hrnet import _branch
            return _branch(st, f"backbone.{prefix}", x, C, args.blocks)

        @jax.jit
        def run_fused(x, w=w, scale=scale, shift=shift):
            return fused_basic_chain(x, w, scale, shift, args.blocks,
                                     interpret=args.check)

        print(f"{prefix}: compiling/timing XLA chain...", flush=True)
        t_xla = _med(lambda: run_xla(x), args.iters)
        print(f"{prefix}: xla {t_xla:.2f} ms; compiling fused...",
              flush=True)
        t0 = time.perf_counter()
        y_f = run_fused(x)
        compile_s = time.perf_counter() - t0
        t_fused = _med(lambda: run_fused(x), args.iters)
        y_x = run_xla(x)
        delta = float(jnp.max(jnp.abs(y_f - y_x)))
        rows.append({
            "branch": prefix, "hw": hw, "C": C, "batch": B,
            "xla_ms": round(t_xla, 2), "fused_ms": round(t_fused, 2),
            "speedup": round(t_xla / t_fused, 2),
            "mosaic_compile_s": round(compile_s, 1),
            "max_abs_delta": delta,
        })
        print(json.dumps(rows[-1]), flush=True)

    tot_x = sum(r["xla_ms"] for r in rows)
    tot_f = sum(r["fused_ms"] for r in rows)
    print(json.dumps({"summary": "per-image branch chains",
                      "xla_ms": round(tot_x, 2),
                      "fused_ms": round(tot_f, 2),
                      "speedup": round(tot_x / max(tot_f, 1e-9), 2)}),
          flush=True)
    if args.check:
        print("CHECK OK")


if __name__ == "__main__":
    main()
