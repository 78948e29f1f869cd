"""BEV per-stage profile on the real chip (VERDICT r4 item 7).

Splits `bev_inference` (pipeline/bev_pipeline.py) into its map stages —
backbone / 2D heads / BV 1D branch / the two 3D refiners / post (3D parse +
param regression + SMPL+A + projections) — and times each as its own jitted
call at the BENCH_ALL batch/dtype config (batch 128, compute bf16).

Each stage is synced by fetching a checksum scalar (block_until_ready is
not a reliable barrier on the tunneled axon platform). Stage-sum vs the
whole jitted pipeline is printed too: the whole graph benefits from
cross-stage fusion/overlap, so the per-stage numbers are upper bounds that
localize where the time goes.

Run on TPU:  python scripts/profile_bev.py [--batch 128] [--act float32]
CPU check:   JAX_PLATFORMS=cpu python scripts/profile_bev.py --check
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _timed(jfn, args, iters=8, warmup=2):
    for _ in range(warmup):
        float(jfn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--act", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        args.batch = 2

    from romp_tpu.models.bev import (
        DEPTH_LEVELS, OUTMAP, bev_forward_maps, bev_regress_params,
        cam3dmap_anchor, coord_maps_3d_halfz, init_bev_params,
    )
    from romp_tpu.models.hrnet import hrnet_w32
    from romp_tpu.models.layers import (
        ParamStore, basic_block_1d, basic_block_3d, basic_block_conv_ds,
        bn_relu, conv2d,
    )
    from romp_tpu.ops.centermap import parse_centermap3d
    from romp_tpu.pipeline.bev_pipeline import BevConfig, bev_inference
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    B = args.batch
    size = 512 if not args.check else 128
    params = init_bev_params(jax.random.PRNGKey(0), input_size=size)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    anchors = jnp.asarray(cam3dmap_anchor())
    coord3d = jnp.asarray(coord_maps_3d_halfz(size // 4,
                                              np.asarray(anchors)))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, size, size, 3).astype(np.float32)
                         * 255.0)
    dt = jnp.bfloat16
    at = jnp.float32 if args.act == "float32" else jnp.bfloat16

    def store():
        return ParamStore(params, compute_dtype=dt, act_dtype=at)

    HEAD_CH = 128
    BV_CH = 16

    def head_block(st, prefix, x, out_ch, with_out=True):
        x = basic_block_conv_ds(st, f"{prefix}.0.0", x, HEAD_CH)
        if with_out:
            x = conv2d(st, f"{prefix}.1", x, out_ch, 1, 1, padding=0,
                       bias=True)
        return x

    # ---- stage fns (mirror bev_forward_maps's dataflow) ----
    def s_backbone(im):
        x = (im / 255.0) * 2.0 - 1.0
        return hrnet_w32(store(), x, prefix="backbone")

    def s_heads2d(feat):
        st = store()
        maps_fv = head_block(st, "det_head", feat, 4)
        g = conv2d(st, "bv_pre_layers.0", feat, BV_CH, 1, 1, padding=0,
                   bias=True)
        g = bn_relu(st, "bv_pre_layers.1", g)
        g = conv2d(st, "bv_pre_layers.3", g, BV_CH, 3, 1, bias=True)
        g = bn_relu(st, "bv_pre_layers.4", g)
        g = conv2d(st, "bv_pre_layers.6", g, BV_CH, 1, 1, padding=0,
                   bias=True)
        g = bn_relu(st, "bv_pre_layers.7", g)
        front = head_block(st, "param_head", feat, 0, with_out=False)
        return maps_fv, g, front

    def s_bv1d(maps_fv, g):
        st = store()
        Bq, H, W, _ = g.shape
        center_fv = maps_fv[..., :1]
        cam_offset = maps_fv[..., 1:4]
        summon = jnp.concatenate([center_fv, cam_offset, g], axis=-1)
        summon = summon.transpose(0, 3, 1, 2).reshape(Bq, -1, W)
        s = summon.transpose(0, 2, 1)
        s = basic_block_1d(st, "bv_out_layers.0", s, 512)
        s = basic_block_1d(st, "bv_out_layers.1", s, 512)
        s = basic_block_1d(st, "bv_out_layers.2", s, 2 * DEPTH_LEVELS)
        return s.transpose(0, 2, 1)

    def s_refine_center(maps_fv, s):
        st = store()
        center_fv = maps_fv[..., :1]
        center_bv = s[:, :DEPTH_LEVELS]
        c3d = center_fv[:, None, :, :, 0] * center_bv[:, :, None, :]
        c3d = basic_block_3d(st, "center_map_refiner.0", c3d[..., None], 1)
        return c3d[..., 0]

    def s_refine_cam(maps_fv, s):
        st = store()
        cam_offset = maps_fv[..., 1:4]
        camoff_bv = s[:, DEPTH_LEVELS:]
        cam3d = coord3d + cam_offset[:, None]
        cam3d = cam3d.at[..., 2].add(camoff_bv[:, :, None, :])
        return basic_block_3d(st, "cam_map_refiner.0", cam3d, 3)

    cfg = BevConfig(input_size=size, max_person=8,
                    compute_dtype="bfloat16", act_dtype=args.act)

    def s_post(c3d, cam3d, front, maps_fv):
        from romp_tpu.models.bev import BevMaps

        maps = BevMaps(c3d, cam3d, maps_fv[..., :1], front)
        det = parse_centermap3d(maps.center_maps_3d, cfg.max_person,
                                cfg.conf_thresh)
        return bev_regress_params(store(), maps, det, anchors)

    chk = lambda o: sum(jnp.sum(jnp.asarray(v).astype(jnp.float32))
                        for v in (o if isinstance(o, tuple) else (o,)))

    # materialize stage inputs once
    j_back = jax.jit(lambda im: s_backbone(im))
    feat = j_back(images)
    maps_fv, g, front = jax.jit(s_heads2d)(feat)
    s = jax.jit(s_bv1d)(maps_fv, g)
    c3d = jax.jit(s_refine_center)(maps_fv, s)
    cam3d = jax.jit(s_refine_cam)(maps_fv, s)

    stages = [
        ("backbone", jax.jit(lambda im: chk(s_backbone(im))), (images,)),
        ("heads2d", jax.jit(lambda f: chk(s_heads2d(f))), (feat,)),
        ("bv1d", jax.jit(lambda m, gg: chk(s_bv1d(m, gg))), (maps_fv, g)),
        ("refine3d_center", jax.jit(lambda m, ss: chk(s_refine_center(m, ss))),
         (maps_fv, s)),
        ("refine3d_cam", jax.jit(lambda m, ss: chk(s_refine_cam(m, ss))),
         (maps_fv, s)),
        ("post", jax.jit(lambda a, b, c, d: chk(s_post(a, b, c, d))),
         (c3d, cam3d, front, maps_fv)),
    ]
    iters = 3 if args.check else 8
    rows = []
    for name, jfn, a in stages:
        ms = _timed(jfn, a, iters=iters)
        rows.append({"stage": name, "ms": round(ms, 2)})
        print(f"{name:16s} {ms:8.2f} ms", flush=True)

    full = jax.jit(lambda p, im: chk(tuple(
        bev_inference(p, adult, baby, im, cfg).values())))
    ms_full = _timed(full, (params, images), iters=iters)
    total = sum(r["ms"] for r in rows)
    print(f"{'stage-sum':16s} {total:8.2f} ms")
    print(f"{'full-pipeline':16s} {ms_full:8.2f} ms "
          f"({B / ms_full * 1e3:.1f} img/s)")
    print(json.dumps({"batch": B, "act": args.act, "rows": rows,
                      "full_ms": round(ms_full, 2)}))
    if args.check:
        print("CHECK OK")


if __name__ == "__main__":
    main()
