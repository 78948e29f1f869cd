"""Quantify the bf16 fast path: f32 vs bf16 inference deltas end to end.

The 835 img/s headline number runs compute_dtype=act_dtype=bfloat16; the
parity path is f32. This measures what that buys/costs ON THE SAME WEIGHTS
(converted random-init — no released checkpoints in this environment, but
the rounding behaviour of the network does not depend on where the weights
came from, so the deltas below bound the fast path's numeric cost):
- center map confidence delta (detection stability),
- SMPL parameter deltas,
- per-vertex mesh delta in millimetres (MPVE-style, the quantity 3D
  benchmarks score).

Usage: python scripts/bf16_accuracy.py [--size 512] [--batch 4]
Prints one JSON dict; also writeable into STATUS/BENCH docs.
"""
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.romp_pipeline import RompConfig, romp_inference
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    rng = np.random.RandomState(args.seed)
    params = init_romp_params(jax.random.PRNGKey(0), input_size=args.size)
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    images = (rng.rand(args.batch, args.size, args.size, 3) * 255
              ).astype(np.float32)

    # Calibrate BatchNorm running stats (fresh random init leaves them at
    # 0/1, so activations blow up ~1e8x through the stages and absolute
    # deltas would be meaningless; a trained checkpoint has unit-scale
    # activations, which ~10 stat-update passes reproduce).
    from romp_tpu.models.layers import ParamStore
    from romp_tpu.models.romp import romp_forward

    @jax.jit
    def calib(p, imgs):
        store = ParamStore(p, train=True)
        romp_forward(store, imgs)
        return store.stats_updates

    for i in range(3):
        calib_imgs = (rng.rand(2, args.size, args.size, 3) * 255
                      ).astype(np.float32)
        upd = calib(params, calib_imgs)
        # invert the momentum update (new = .9 old + .1 batch) to assign
        # the batch statistics outright — one pass fully calibrates
        for k, v in upd.items():
            params[k] = 10.0 * v - 9.0 * params[k]

    # ---- map-level deltas (checkpoint-independent signal fidelity) ----
    # The raw network maps are where bf16 rounding enters; everything
    # downstream (NMS picks, 6D->axis-angle, SMPL) amplifies chaotically at
    # RANDOM init (near-degenerate 6D rotations), so map-relative error +
    # detection agreement are the honest transferable numbers; the
    # slot-level deltas below are reported with that caveat.
    import jax.numpy as jnp

    from romp_tpu.models.layers import ParamStore as PS
    from romp_tpu.ops.centermap import parse_centermap2d

    maps = {}
    for name, (cd, ad) in (("f32", (jnp.float32, jnp.float32)),
                           ("mixed", (jnp.bfloat16, jnp.float32)),
                           ("bf16", (jnp.bfloat16, jnp.bfloat16))):
        fwd = jax.jit(lambda p, im, cd=cd, ad=ad: romp_forward(
            PS(p, compute_dtype=cd, act_dtype=ad), im))
        cm, pm = fwd(params, jnp.asarray(images))
        maps[name] = (np.asarray(cm, np.float64), np.asarray(pm, np.float64))

    (cm_a, pm_a) = maps["f32"]
    cm_scale = np.abs(cm_a).max()
    pm_scale = np.abs(pm_a).max()
    det_a = parse_centermap2d(jnp.asarray(cm_a[..., 0], jnp.float32),
                              16, -1e9)
    map_report = {}
    for variant in ("mixed", "bf16"):
        cm_b, pm_b = maps[variant]
        det_b = parse_centermap2d(jnp.asarray(cm_b[..., 0], jnp.float32),
                                  16, -1e9)
        agree = float((np.asarray(det_a.flat_inds)
                       == np.asarray(det_b.flat_inds)).mean())
        map_report[variant] = {
            "centermap_rel_err_max": float(
                np.abs(cm_a - cm_b).max() / cm_scale),
            "paramsmap_rel_err_max": float(
                np.abs(pm_a - pm_b).max() / pm_scale),
            "paramsmap_rel_err_mean": float(
                np.abs(pm_a - pm_b).mean() / pm_scale),
            "top16_detection_agreement": agree,
        }

    # ---- end-to-end slot deltas (caveat: random-init amplification) ----
    outs = {}
    for name, (cd, ad) in (("f32", ("float32", "float32")),
                           ("bf16", ("bfloat16", "bfloat16"))):
        cfg = RompConfig(input_size=args.size, compute_dtype=cd,
                         act_dtype=ad, conf_thresh=-1e9)
        out = romp_inference(params, smpl, images, cfg)
        outs[name] = {k: np.asarray(v, np.float64)
                      for k, v in out.items()}
    a, b = outs["f32"], outs["bf16"]
    mask = (a["mask"] > 0) & (b["mask"] > 0)
    dverts = np.linalg.norm(a["verts"] - b["verts"], axis=-1)[mask]
    report = {
        "size": args.size,
        "batch": args.batch,
        **{f"{var}/{k}": v for var, d in map_report.items()
           for k, v in d.items()},
        "center_conf_max_delta": float(
            np.abs(a["center_confs"] - b["center_confs"]).max()),
        "slot_vertex_mean_delta_mm_RANDOM_INIT_CAVEAT": float(
            dverts.mean() * 1000.0),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
