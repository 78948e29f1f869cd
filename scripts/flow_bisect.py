"""Bisect RAFT's per-iteration cost on the chip: lookup vs update block.

flow_sweep puts the 20-iteration refinement at ~14 ms/iteration for an
8-pair 512^2 clip while the conv/HBM roofline of one iteration is ~2 ms;
this times the two halves of the scan body as standalone jitted calls:

  corr_lookup   one-hot window contraction over the 4-level pyramid
  update_block  motion encoder + SepConvGRU + flow head

Run on TPU:  python scripts/flow_bisect.py [--iters 12]
CPU check:   JAX_PLATFORMS=cpu python scripts/flow_bisect.py --check
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _med(fn, iters, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        args.iters = 2

    from romp_tpu.models.layers import ParamStore
    from romp_tpu.models.raft import (
        CDIM, HDIM, _flow_head, _motion_encoder, _sep_conv_gru,
        build_corr_pyramid, corr_lookup, init_raft_params,
    )

    B = 8                      # pairs per clip
    H = W = 64 if not args.check else 16
    params = init_raft_params(jax.random.PRNGKey(0))
    store = lambda: ParamStore(params, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    fmap1 = jnp.asarray(rng.rand(B, H, W, 256).astype(np.float32))
    fmap2 = jnp.asarray(rng.rand(B, H, W, 256).astype(np.float32))
    coords = jnp.asarray(
        (rng.rand(B, H, W, 2) * np.asarray([W, H])).astype(np.float32))
    flow = jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32))
    net = jnp.asarray(rng.rand(B, H, W, HDIM).astype(np.float32))
    inp = jnp.asarray(rng.rand(B, H, W, CDIM).astype(np.float32))

    force = lambda a: float(jnp.sum(a[..., 0].astype(jnp.float32)))

    pyr_fn = jax.jit(build_corr_pyramid)
    pyramid = pyr_fn(fmap1, fmap2)
    rows = {"B": B, "H": H}
    rows["build_pyramid_ms"] = round(
        _med(lambda: force(pyr_fn(fmap1, fmap2)[0]), args.iters), 2)

    look_fn = jax.jit(corr_lookup)
    corr = look_fn(pyramid, coords)
    rows["corr_lookup_ms"] = round(
        _med(lambda: force(look_fn(pyramid, coords)), args.iters), 2)

    # per-level lookup cost (levels differ 64x in volume size)
    for lv in range(4):
        one = [pyramid[lv]]
        f = jax.jit(lambda p, c: corr_lookup(p, c))
        f(one, coords)
        rows[f"lookup_level{lv}_ms"] = round(
            _med(lambda: force(f(one, coords)), args.iters), 2)

    def update(net_c, flow_c, corr_c):
        st = store()
        motion = _motion_encoder(st, flow_c, corr_c)
        net_c = _sep_conv_gru(st, net_c, jnp.concatenate([inp, motion], -1))
        return _flow_head(st, net_c)

    upd_fn = jax.jit(update)
    upd_fn(net, flow, corr)
    rows["update_block_ms"] = round(
        _med(lambda: force(upd_fn(net, flow, corr)), args.iters), 2)

    print(json.dumps(rows, indent=1))
    if args.check:
        print("CHECK OK")


if __name__ == "__main__":
    main()
