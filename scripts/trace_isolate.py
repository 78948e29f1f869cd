"""Isolate TRACE per-clip device stages on resident data (no profile syncs).

profile_trace's per-stage numbers bundle host->device upload, stage compute,
and a sync RTT into each tick; this script separates them on the real chip:

  upload      uint8 clip host->device (forced), and the async enqueue cost
  backbone    trace_extract_features on a RESIDENT clip
  flow20      raft_forward_seq (parity config) on RESIDENT frames
  maps        trace_maps_and_detect on resident feats/flows
  smpl        _trace_smpl_stage compute (checksum-forced, no result fetch)
  smpl_fetch  np.asarray of the packed geometry buffer (f32 and f16)

Run on TPU:  python scripts/trace_isolate.py [--iters 8]
CPU check:   JAX_PLATFORMS=cpu python scripts/trace_isolate.py --check
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        args.iters = 2

    from romp_tpu.models.raft import init_raft_params, make_trace_flow_fn
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.pipeline.trace_pipeline import (
        TraceConfig, _trace_smpl_stage, trace_extract_features,
        trace_maps_and_detect,
    )
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    size = 512 if not args.check else 128
    T = 8
    cfg = TraceConfig(input_size=size, compute_dtype="bfloat16",
                      act_dtype="bfloat16")
    params = init_trace_params(jax.random.PRNGKey(0), clip_length=T,
                               map_size=size // 4)
    params.update({k: v for k, v in
                   init_romp_params(jax.random.PRNGKey(1),
                                    input_size=size).items()
                   if k not in params})
    flow_fn = make_trace_flow_fn(init_raft_params(jax.random.PRNGKey(2)),
                                 iters=20, out_size=size // 4,
                                 compute_dtype="bfloat16",
                                 flow_input_size=size, sequence=True)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))

    rng = np.random.RandomState(0)
    clip_np = (rng.rand(T, size, size, 3) * 255).astype(np.uint8)
    force = lambda a: float(jnp.sum(
        jax.tree_util.tree_leaves(a)[0][..., 0].astype(jnp.float32)))

    rows = {}

    # upload: forced (full transfer) vs enqueue-only (asyncness probe)
    def up_forced():
        h = jnp.asarray(clip_np)
        force(h[0, 0, 0])
    rows["upload_forced_ms"] = round(_med(up_forced, args.iters), 1)
    t0 = time.perf_counter()
    handles = [jnp.asarray(clip_np) for _ in range(4)]
    rows["upload_enqueue_ms_each"] = round(
        (time.perf_counter() - t0) / 4 * 1e3, 1)
    del handles

    clip_dev = jnp.asarray(clip_np)
    force(clip_dev[0, 0, 0])

    feats = trace_extract_features(params, clip_dev, None, cfg)
    rows["backbone_resident_ms"] = round(_med(
        lambda: force(trace_extract_features(params, clip_dev, None, cfg)),
        args.iters), 1)

    seq = jnp.concatenate([clip_dev[:1], clip_dev], axis=0)
    rows["flow20_resident_ms"] = round(_med(
        lambda: force(flow_fn(seq)), args.iters), 1)
    flows = flow_fn(seq)

    feats_full = jnp.concatenate([feats[:1], feats], axis=0)

    def run_maps():
        maps, hidden, det = trace_maps_and_detect(params, feats_full, flows,
                                                  None, cfg)
        force(det)
    rows["maps_detect_resident_ms"] = round(_med(run_maps, args.iters), 1)

    N = 16
    sp = jnp.asarray(rng.rand(N, T, 168).astype(np.float32) * 0.1)
    for td in ("float32", "float16"):
        packs = _trace_smpl_stage(sp, (adult, baby), size, td)
        rows[f"smpl_compute_ms_{td}"] = round(_med(
            lambda: force(_trace_smpl_stage(sp, (adult, baby),
                                            size, td)[0]),
            args.iters), 1)
        # jax caches the host copy after the first np.asarray of an array,
        # so each timed fetch must hit a DISTINCT device buffer
        geoms = [_trace_smpl_stage(sp + 1e-6 * k, (adult, baby), size,
                                   td)[1] for k in range(args.iters + 1)]
        for g in geoms:
            g.block_until_ready()
        ts = []
        for g in geoms[1:]:
            t0 = time.perf_counter()
            np.asarray(g)
            ts.append(time.perf_counter() - t0)
        rows[f"smpl_geom_fetch_ms_{td}"] = round(
            float(np.median(ts)) * 1e3, 1)
        geom = geoms[0]
        rows[f"geom_bytes_{td}"] = int(geom.size) * geom.dtype.itemsize

    print(json.dumps(rows, indent=1))
    if args.check:
        print("CHECK OK")


if __name__ == "__main__":
    main()
