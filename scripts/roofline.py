"""HRNet per-stage roofline: attained vs attainable time on the real chip.

VERDICT r3 item 2: "measure a bytes-moved roofline per stage and publish it
in STATUS so 'HBM-bound' becomes a number, not a claim."

For each forward segment (stem / stage2 / stage3 / stage4 / heads) this
script computes, analytically:
  - conv MAC FLOPs (2*K*K*Cin*Cout*H*W per conv),
  - the MXU *lane-occupancy-capped* attainable FLOP rate
    (a conv's MXU lane use is capped at min(Cout,128)/128 — see STATUS
    "lane-occupancy arithmetic"),
  - minimum HBM bytes assuming PERFECT elementwise fusion: every conv
    reads its input once and writes its output once (BN/ReLU/residual
    free), weights read once;
and measures the actual per-segment wall time at the requested activation
dtype. Roofline time = max(flops / lane_capped_peak, bytes / HBM_BW);
"attainment" = roofline_time / measured_time (1.0 = speed of light).

Run on TPU:  python scripts/roofline.py [--batch 512] [--act float32]
CPU check:   JAX_PLATFORMS=cpu python scripts/roofline.py --check
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK_BF16 = 197e12        # v5e (lite) peak bf16 FLOP/s
HBM_BW = 819e9            # v5e HBM bandwidth, bytes/s
MXU_LANES = 128


def conv_cost(h, w, cin, cout, k, act_bytes, stride=1):
    """(flops, lane_capped_flops_denominator_weight, min_bytes) of one conv.

    Returns (flops, flops / lane_frac, bytes): the second term is the
    "lane-weighted" FLOPs such that sum(lane_weighted) / PEAK = attainable
    compute time under the Cout/128 lane cap.
    """
    ho, wo = h // stride, w // stride
    flops = 2 * k * k * cin * cout * ho * wo
    lane_frac = min(cout, MXU_LANES) / MXU_LANES
    bytes_ = (h * w * cin + ho * wo * cout) * act_bytes \
        + k * k * cin * cout * 2  # weights as bf16
    return flops, flops / lane_frac, bytes_


def segment_costs(B, act_bytes, input_size=512):
    """Per-segment (flops, lane_weighted_flops, min_bytes) for HRNet-W32 +
    ROMP heads, batch B. Mirrors romp_tpu/models/hrnet.py structure."""
    s = input_size // 4  # 128 for 512 input

    def acc(items):
        f = lw = by = 0
        for it in items:
            f += it[0]
            lw += it[1]
            by += it[2]
        return f, lw, by

    def basic_block(h, c):
        return [conv_cost(h, h, c, c, 3, act_bytes),
                conv_cost(h, h, c, c, 3, act_bytes)]

    def bottleneck(h, cin, planes, downsample):
        items = [conv_cost(h, h, cin, planes, 1, act_bytes),
                 conv_cost(h, h, planes, planes, 3, act_bytes),
                 conv_cost(h, h, planes, planes * 4, 1, act_bytes)]
        if downsample:
            items.append(conv_cost(h, h, cin, planes * 4, 1, act_bytes))
        return items

    stem = [conv_cost(input_size, input_size, 3, 64, 3, act_bytes, 2),
            conv_cost(input_size // 2, input_size // 2, 64, 64, 3,
                      act_bytes, 2)]
    stem += bottleneck(s, 64, 64, True)
    for _ in range(3):
        stem += bottleneck(s, 256, 64, False)

    def hr_module(chs):
        items = []
        for i, c in enumerate(chs):
            h = s >> i
            for _ in range(4):
                items += basic_block(h, c)
        for i, ci in enumerate(chs):
            for j, cj in enumerate(chs):
                if j > i:      # 1x1 at source res + upsample
                    items.append(conv_cost(s >> j, s >> j, cj, ci, 1,
                                           act_bytes))
                elif j < i:    # chain of stride-2 3x3s
                    c_prev = cj
                    for k_ in range(i - j):
                        last = k_ == i - j - 1
                        cout = ci if last else cj
                        hh = s >> (j + k_)
                        items.append(conv_cost(hh, hh, c_prev, cout, 3,
                                               act_bytes, 2))
                        c_prev = cout
        return items

    def transition(pre, cur):
        items = []
        if len(cur) > len(pre):
            h = s >> (len(pre) - 1)
            items.append(conv_cost(h, h, pre[-1], cur[-1], 3, act_bytes, 2))
        return items

    s2 = transition((256,), (32, 64)) + hr_module((32, 64))
    s3 = transition((32, 64), (32, 64, 128))
    for _ in range(4):
        s3 += hr_module((32, 64, 128))
    s4 = transition((32, 64, 128), (32, 64, 128, 256))
    for _ in range(3):
        s4 += hr_module((32, 64, 128, 256))

    hh = s // 2  # heads run at map 64 for input 512
    heads = []
    for _ in range(3):
        heads.append(conv_cost(hh, hh, 34, 64, 3, act_bytes))
        for _ in range(4):
            heads.append(conv_cost(hh, hh, 64, 64, 3, act_bytes))

    out = {}
    for name, items in (("stem", stem), ("stage2", s2), ("stage3", s3),
                        ("stage4", s4), ("heads", heads)):
        f, lw, by = acc(items)
        out[name] = (f * B, lw * B, by * B)
    return out


def _timed(f, *args, iters=10):
    import jax
    import jax.numpy as jnp

    jf = jax.jit(f)
    out = jf(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = jf(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--act", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--fused", action="store_true",
                    help="use the Pallas fused-branch backbone path")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        costs = segment_costs(1, 4)
        for k, (f, lw, by) in costs.items():
            print(f"{k:8s} {f/1e9:7.2f} GFLOP  lane-wtd {lw/1e9:7.2f}  "
                  f"min {by/1e6:7.1f} MB")
        print("CHECK OK")
        return

    from romp_tpu.models.layers import ParamStore
    from romp_tpu.models.romp import init_romp_params, romp_forward_segments

    B = args.batch
    act_bytes = 4 if args.act == "float32" else 2
    act_dt = jnp.float32 if args.act == "float32" else jnp.bfloat16
    params = init_romp_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(
        B, 512, 512, 3).astype(np.float32) * 255.0)

    segs = romp_forward_segments("hrnet32")
    names = ["normalize", "stem", "stage2", "stage3", "stage4", "heads"]
    costs = segment_costs(B, act_bytes)

    rows = []
    arrs = [x]
    print(f"batch {B}, act {args.act}, fused={args.fused}  (roofline = "
          f"max(lane-capped MXU, HBM bytes); attain = roofline/measured)")
    for name, seg in zip(names, segs):
        def run(arrs_in):
            st = ParamStore(params, compute_dtype=jnp.bfloat16,
                            act_dtype=act_dt, fuse_chains=args.fused)
            return seg(st, arrs_in)
        ms = _timed(run, arrs)
        st = ParamStore(params, compute_dtype=jnp.bfloat16, act_dtype=act_dt,
                        fuse_chains=args.fused)
        arrs = seg(st, arrs)
        f, lw, by = costs.get(name, (0, 0, 0))
        t_mxu = lw / PEAK_BF16 * 1e3
        t_hbm = by / HBM_BW * 1e3
        roof = max(t_mxu, t_hbm)
        attain = roof / ms if ms else 0.0
        bound = "HBM" if t_hbm > t_mxu else "MXU"
        rows.append({"segment": name, "ms": round(ms, 2),
                     "gflop": round(f / 1e9, 1),
                     "min_gb": round(by / 1e9, 3),
                     "t_mxu_ms": round(t_mxu, 2),
                     "t_hbm_ms": round(t_hbm, 2),
                     "bound": bound, "attain": round(attain, 3)})
        print(f"{name:10s} {ms:8.2f} ms | mxu {t_mxu:7.2f} hbm {t_hbm:7.2f} "
              f"-> roof {roof:7.2f} ms ({bound}-bound) attain {attain:5.1%}",
              flush=True)
    total_ms = sum(r["ms"] for r in rows)
    total_roof = sum(max(r["t_mxu_ms"], r["t_hbm_ms"]) for r in rows)
    print(f"{'TOTAL':10s} {total_ms:8.2f} ms   roofline {total_roof:.2f} ms "
          f"attain {total_roof/total_ms:5.1%}   "
          f"({B / total_ms * 1e3:.0f} img/s backbone-only)")
    print(json.dumps({"batch": B, "act": args.act, "rows": rows}))


if __name__ == "__main__":
    main()
