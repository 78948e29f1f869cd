"""Does the axon tunnel overlap host->device transfers with device compute?

Times three things:
  compute_ms        a long jitted matmul chain alone (checksum-forced)
  upload_ms         a 6.3 MB uint8 clip upload alone (forced)
  overlapped_ms     dispatch the compute, THEN upload, then force both

If overlapped ~= max(compute, upload), transfers ride alongside compute and
TracePipeline.prefetch can hide the clip upload; if ~= compute + upload,
the tunnel serializes them and the per-clip wire time is an unavoidable
floor on this deployment (irrelevant on a co-located host).

Run on TPU:  python scripts/tunnel_overlap_probe.py
CPU check:   JAX_PLATFORMS=cpu python scripts/tunnel_overlap_probe.py --check
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        args.iters = 2

    n = 4096 if not args.check else 256
    reps = 24 if not args.check else 2

    @jax.jit
    def heavy(a):
        def body(x, _):
            return jnp.tanh(x @ a), None
        y, _ = jax.lax.scan(body, a, None, length=reps)
        return jnp.sum(y[0])

    a = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32))
    clip = (np.random.RandomState(1).rand(8, 512, 512, 3) * 255
            ).astype(np.uint8)
    force = lambda h: float(jnp.sum(h[0, 0, 0].astype(jnp.float32)))

    def med(fn):
        for _ in range(2):
            fn()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    compute_ms = med(lambda: float(heavy(a)))

    def up():
        h = jnp.asarray(clip)
        force(h)
    upload_ms = med(up)

    def both():
        c = heavy(a)          # dispatched, not forced
        h = jnp.asarray(clip)
        force(h)
        float(c)
    overlapped_ms = med(both)

    print(json.dumps({
        "compute_ms": round(compute_ms, 1),
        "upload_ms": round(upload_ms, 1),
        "overlapped_ms": round(overlapped_ms, 1),
        "serial_sum_ms": round(compute_ms + upload_ms, 1),
    }, indent=1))
    if args.check:
        print("CHECK OK")


if __name__ == "__main__":
    main()
