"""HRNet MXU-utilization experiment: space-to-depth stem packing.

VERDICT r2 item 4: the ~17% MXU utilization claim for HRNet-W32 was
asserted, not demonstrated. This script produces the evidence:

1. per-segment wall times of the HRNet forward (stem / stage2 / stage3 /
   stage4 / heads) at batch 64 bf16 on the real TPU, with analytic conv
   FLOPs per segment -> per-segment MXU utilization;
2. an exact space-to-depth rewrite of the stem's first conv
   (3x3 stride-2 on (512, 512, 3) == 2x2 stride-1 on (256, 256, 12) with
   rearranged weights, zero row/col of taps padded away), verified
   numerically, then timed against the baseline stem.

The input conv is the thinnest matmul in the net (C_in=3 of 128 MXU lanes
-> <3% lane use); s2d packs 4 pixels into channels (C_in=12) and quarters
the spatial positions. The rest of the net is C>=32 convs whose utilization
this experiment measures rather than guesses.

Run on TPU: python scripts/mxu_experiment.py
CPU check:  JAX_PLATFORMS=cpu python scripts/mxu_experiment.py --check
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# v5e (lite) peak: 197 TFLOP/s bf16, 394 TOP/s int8
PEAK_BF16 = 197e12


def s2d_pack(x):
    """(B, H, W, 3) -> (B, H/2, W/2, 12), channel = (dy*2+dx)*3 + c."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    xb = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def s2d_weight(w):
    """(3, 3, 3, 64) HWIO stride-2 kernel -> (2, 2, 12, 64) blocked kernel.

    Original tap ky in {0,1,2} (offset -1..+1 of output row*2) maps to
    (block P, subrow dy): ky=0 -> (0, 1); ky=1 -> (1, 0); ky=2 -> (1, 1).
    Block (0, 0) taps rows 2i-2 the 3x3 kernel never reads -> zero.
    """
    import jax.numpy as jnp

    kh, kw, Ci, Co = w.shape
    out = np.zeros((2, 2, 4 * Ci, Co), np.float32)
    wn = np.asarray(w, np.float32)
    for ky in range(3):
        P, dy = (0, 1) if ky == 0 else (1, ky - 1)
        for kx in range(3):
            Q, dx = (0, 1) if kx == 0 else (1, kx - 1)
            out[P, Q, (dy * 2 + dx) * Ci:(dy * 2 + dx + 1) * Ci] = wn[ky, kx]
    return jnp.asarray(out)


def conv_ref(x, w):
    import jax
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2d(x, w2):
    import jax
    return jax.lax.conv_general_dilated(
        s2d_pack(x), w2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 16).astype(np.float32))
    a = conv_ref(x, w)
    b = conv_s2d(x, s2d_weight(w))
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"s2d rewrite max abs diff: {err:.2e}")
    assert err < 1e-4
    print("CHECK OK")


def _timed(f, *args, iters=10):
    import jax
    import jax.numpy as jnp

    jf = jax.jit(f)
    out = jf(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = jf(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # checksum barrier
    return (time.time() - t0) / iters * 1000


def seg_flops(name, B):
    """Analytic conv FLOPs (2*K*K*Cin*Cout*H*W each) per segment, batch B,
    input 512^2."""
    def conv(h, cin, cout, k=3):
        return 2 * k * k * cin * cout * h * h

    stem = (conv(256, 3, 64) + conv(128, 64, 64)
            + 4 * (conv(128, 64, 64, 1) + conv(128, 64, 64)
                   + conv(128, 64, 256, 1)))
    def hr_module(chs):
        f = 0
        for i, c in enumerate(chs):
            h = 128 >> i
            f += 4 * 2 * conv(h, c, c)           # 4 basic blocks x 2 convs
        # fuse layers approx: every pair exchange via 1x1/3x3
        for i, ci in enumerate(chs):
            for j, cj in enumerate(chs):
                if i == j:
                    continue
                h = 128 >> max(i, j)
                f += conv(h, cj, ci, 1 if j > i else 3)
        return f

    segs = {
        "stem": stem,
        "stage2": hr_module((32, 64)),
        "stage3": 4 * hr_module((32, 64, 128)),
        "stage4": 3 * hr_module((32, 64, 128, 256)),
        "heads": 3 * (conv(64, 34, 64) + 4 * conv(64, 64, 64)),
    }
    return {k: v * B for k, v in segs.items()}


def main():
    import jax
    import jax.numpy as jnp

    from romp_tpu.models.layers import ParamStore
    from romp_tpu.models.romp import init_romp_params, romp_forward_segments

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env
        check()
        return

    B = args.batch
    params = init_romp_params(jax.random.PRNGKey(0))
    params = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
              for k, v in params.items()}
    x = jnp.asarray(np.random.RandomState(0).rand(
        B, 512, 512, 3).astype(np.float32) * 255.0)

    segs = romp_forward_segments("hrnet32")
    names = ["normalize", "stem", "stage2", "stage3", "stage4", "heads"]
    flops = seg_flops("", B)

    # per-segment timing (each jitted alone; boundaries are real tensors)
    arrs = [x]
    total = 0.0
    for name, seg in zip(names, segs):
        def run(arrs_in):
            st = ParamStore(params, compute_dtype=jnp.bfloat16,
                            act_dtype=jnp.bfloat16)
            return seg(st, arrs_in)
        ms = _timed(run, arrs)
        st = ParamStore(params, compute_dtype=jnp.bfloat16,
                        act_dtype=jnp.bfloat16)
        arrs = seg(st, arrs)
        total += ms
        fl = flops.get(name, 0)
        util = fl / (ms / 1e3) / PEAK_BF16 * 100 if fl else 0.0
        print(f"{name:10s} {ms:8.2f} ms   {fl/1e9:8.1f} GFLOP   "
              f"MXU {util:5.1f}%", flush=True)
    print(f"{'TOTAL':10s} {total:8.2f} ms   batch {B}")

    # --- stem s2d experiment: replace conv1 with the blocked equivalent ---
    w1 = params["backbone.conv1.weight"]  # (3, 3, 3, 64) HWIO
    w1b = s2d_weight(w1).astype(jnp.bfloat16)

    def stem_base(img):
        st = ParamStore(params, compute_dtype=jnp.bfloat16,
                        act_dtype=jnp.bfloat16)
        xs = segs[0](st, [img])
        return segs[1](st, xs)

    def stem_s2d(img):
        st = ParamStore(params, compute_dtype=jnp.bfloat16,
                        act_dtype=jnp.bfloat16)
        xn = ((img / 255.0) * 2.0 - 1.0).astype(jnp.bfloat16)
        h = conv_s2d(xn, w1b)
        # rest of the stem, bypassing conv1
        from romp_tpu.models.layers import bn_relu, bottleneck, conv2d
        h = bn_relu(st, "backbone.bn1", h)
        h = conv2d(st, "backbone.conv2", h, 64, 3, 2)
        h = bn_relu(st, "backbone.bn2", h)
        for b in range(4):
            h = bottleneck(st, f"backbone.layer1.{b}", h, 64,
                           downsample=(b == 0))
        return h

    t_base = _timed(stem_base, x)
    t_s2d = _timed(stem_s2d, x)
    a = jax.jit(stem_base)(x)
    b = jax.jit(stem_s2d)(x)
    a = a[0] if isinstance(a, (list, tuple)) else a
    rel = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)))
                / (float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9))
    print(f"stem baseline {t_base:.2f} ms  s2d {t_s2d:.2f} ms  "
          f"speedup {t_base / t_s2d:.2f}x  rel-diff {rel:.2e}")


if __name__ == "__main__":
    main()
