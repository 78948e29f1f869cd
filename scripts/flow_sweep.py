"""RAFT flow-stage cost sweep on the real chip.

Times make_trace_flow_fn configurations on one 8-pair 512^2 clip — the
exact tensor the TRACE pipeline feeds it — to pick the default flow
config on data rather than guesswork.

Run on TPU: python scripts/flow_sweep.py [--iters_list 12,20]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from romp_tpu.models.raft import init_raft_params, make_trace_flow_fn

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters_list", default="12,20")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--configs", default="f32,bf16,bf16corr",
                    help="comma subset of {f32,bf16,bf16corr} dtype configs "
                         "(each costs two remote compiles per iters value)")
    args = ap.parse_args()

    params = init_raft_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    a = jnp.asarray((rng.rand(args.pairs, args.size, args.size, 3)
                     * 255).astype(np.uint8))
    b = jnp.asarray((rng.rand(args.pairs, args.size, args.size, 3)
                     * 255).astype(np.uint8))

    def timed(fn, iters=6, warmup=2):
        for _ in range(warmup):
            out = fn(a, b)
            float(jnp.sum(out))            # checksum barrier (axon-safe)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(a, b)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    seq = jnp.concatenate([a[:1], b], axis=0)  # (pairs+1, S, S, 3)

    cfg_map = {"f32": ("float32", "float32"),
               "bf16": ("bfloat16", "float32"),
               "bf16corr": ("bfloat16", "bfloat16")}
    configs = [cfg_map[c] for c in args.configs.split(",")]

    for it in [int(x) for x in args.iters_list.split(",")]:
        for compute, corr in configs:
            fn = make_trace_flow_fn(params, iters=it,
                                    compute_dtype=compute, corr_dtype=corr)
            ms = timed(fn)
            print(json.dumps({"iters": it, "compute": compute,
                              "corr": corr, "clip_ms": round(ms, 1)}),
                  flush=True)
            # sequence formulation (fnet shared over unique frames) at the
            # same config — the TracePipeline streaming default
            sfn = make_trace_flow_fn(params, iters=it, compute_dtype=compute,
                                     corr_dtype=corr, sequence=True)
            ms = timed(lambda x, _y: sfn(seq))
            print(json.dumps({"iters": it, "compute": compute, "corr": corr,
                              "mode": "sequence", "clip_ms": round(ms, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
