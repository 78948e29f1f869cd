"""Extended benchmark report: ROMP / BEV / TRACE throughput on one chip.

bench.py prints the single driver-consumed line (ROMP HRNet-32); this tool
reports the whole model zoo (JSON lines, one per config).

`--only romp,bev,trace,train` re-runs a subset; BENCH_ALL.json is merged
(rows matched by "model" are replaced, others kept) so a partial refresh
on an expensive remote chip doesn't drop the other sections' numbers.
"""
import argparse
import json
import os
import time

import numpy as np

BENCH_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_ALL.json")


def _measure(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _merge_and_write(results, partial):
    """Full runs overwrite BENCH_ALL.json (so renamed/removed configs are
    pruned); partial (--only) runs merge into the existing rows. A corrupt
    or malformed existing file ABORTS a partial run rather than silently
    discarding the rows the merge was meant to preserve."""
    if not partial:
        with open(BENCH_PATH, "w") as f:
            json.dump(results, f, indent=1)
        return
    old = []
    if os.path.exists(BENCH_PATH):
        with open(BENCH_PATH) as f:
            old = json.load(f)  # JSONDecodeError propagates: abort, don't drop
        if (not isinstance(old, list)
                or any(not isinstance(r, dict) or "model" not in r
                       for r in old)):
            raise SystemExit(
                f"{BENCH_PATH} is not a list of rows with 'model' keys; "
                "refusing to merge a partial run into it (fix or delete "
                "the file, or run without --only).")
    new_by_model = {r["model"]: r for r in results}
    merged = [new_by_model.pop(r["model"], r) for r in old]
    merged.extend(r for r in results if r["model"] in new_by_model)
    with open(BENCH_PATH, "w") as f:
        json.dump(merged, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated sections: romp,bev,trace,train "
                         "(default: all)")
    args = ap.parse_args()
    only = {s.strip() for s in args.only.split(",") if s.strip()}
    known = {"romp", "bev", "trace", "train", "crowd"}
    unknown = only - known
    if unknown:
        raise SystemExit(f"unknown --only section(s) {sorted(unknown)}; "
                         f"valid: {sorted(known)}")

    def want(section):
        return not only or section in only

    import jax
    import jax.numpy as jnp

    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    rng = np.random.RandomState(0)
    results = []

    def checksum(out):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    smpl = SmplModel.from_assets(synthetic_assets(seed=0))

    # ---- ROMP (hrnet32 / resnet50) ----
    if want("romp"):
        from romp_tpu.models.romp import init_romp_params
        from romp_tpu.pipeline.romp_pipeline import RompConfig, romp_inference

        # act=float32 ("mixed") is the headline config: measured
        # BIT-IDENTICAL to f32 end to end (scripts/bf16_accuracy.py).
        # act=bfloat16 is the opt-in fast path (unbounded map-level
        # rounding at random init).
        for backbone, batch, act in (("hrnet32", 512, "float32"),
                                     ("hrnet32", 512, "bfloat16"),
                                     ("resnet50", 256, "float32"),
                                     ("resnet50", 256, "bfloat16")):
            params = init_romp_params(jax.random.PRNGKey(0),
                                      backbone=backbone)
            cfg = RompConfig(max_person=8, compute_dtype="bfloat16",
                             act_dtype=act, backbone=backbone)
            images = jnp.asarray(
                rng.rand(batch, 512, 512, 3).astype(np.float32) * 255.0)
            f = jax.jit(lambda p, im, cfg=cfg: checksum(
                romp_inference(p, smpl, im, cfg)))
            t = _measure(lambda: float(f(params, images)))
            tag = "_bf16act" if act == "bfloat16" else ""
            results.append({"model": f"romp_{backbone}{tag}", "batch": batch,
                            "img_s": round(batch / t, 1),
                            "p50_batch_ms": round(t * 1e3, 1)})
            print(json.dumps(results[-1]), flush=True)

    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))

    # ---- BEV ----
    if want("bev"):
        from romp_tpu.models.bev import init_bev_params
        from romp_tpu.pipeline.bev_pipeline import BevConfig, bev_inference

        params = init_bev_params(jax.random.PRNGKey(0))
        batch = 128
        images = jnp.asarray(
            rng.rand(batch, 512, 512, 3).astype(np.float32) * 255.0)
        for act in ("float32", "bfloat16"):
            cfg = BevConfig(max_person=8, compute_dtype="bfloat16",
                            act_dtype=act)
            f = jax.jit(lambda p, im, cfg=cfg: checksum(
                bev_inference(p, adult, baby, im, cfg)))
            t = _measure(lambda: float(f(params, images)))
            tag = "_bf16act" if act == "bfloat16" else ""
            results.append({"model": f"bev_hrnet32{tag}", "batch": batch,
                            "img_s": round(batch / t, 1),
                            "p50_batch_ms": round(t * 1e3, 1)})
            print(json.dumps(results[-1]), flush=True)

    # ---- TRACE (full clip pipeline incl. host tracking) ----
    if want("trace"):
        from romp_tpu.models.romp import init_romp_params as _irp
        from romp_tpu.models.trace import init_trace_params
        from romp_tpu.pipeline.trace_pipeline import (
            TraceConfig, TracePipeline,
        )
        from romp_tpu.pipeline.trace_tracking import SeqConfig

        from romp_tpu.models.raft import init_raft_params, make_trace_flow_fn

        tparams = init_trace_params(jax.random.PRNGKey(0), clip_length=8)
        tparams.update({k: v
                        for k, v in _irp(jax.random.PRNGKey(1)).items()
                        if k.startswith("backbone.")})
        cfg = TraceConfig(temp_clip_length=8, max_person=8,
                          conf_thresh=-1e9, compute_dtype="bfloat16",
                          act_dtype="bfloat16", transfer_dtype="float16")
        sc = SeqConfig(large_object_thresh=-1e9,
                       first_frame_det_thresh=-1e9,
                       tracker_det_thresh=-1e9, tracker_match_thresh=1e9)
        raft_params = init_raft_params(jax.random.PRNGKey(2))
        # CLI-default parity flow: 20 iterations (reference FlowExtract,
        # trace2/models/raft/process.py:24) in bfloat16 — the reference
        # itself runs RAFT's encoders/update block under fp16 autocast
        # with an f32 correlation volume (raft.py:93-104), which is
        # exactly this mode.
        flow_fn = make_trace_flow_fn(raft_params, iters=20,
                                     compute_dtype="bfloat16",
                                     sequence=True)
        frames = rng.rand(8, 512, 512, 3).astype(np.float32) * 255.0
        cfg_mixed = TraceConfig(temp_clip_length=8, max_person=8,
                                conf_thresh=-1e9, compute_dtype="bfloat16",
                                act_dtype="float32",
                                transfer_dtype="float16")
        flow_fast = make_trace_flow_fn(raft_params, iters=12,
                                       compute_dtype="bfloat16",
                                       flow_input_size=256, sequence=True)
        for name, ffn, tcfg, fb in (
                ("trace_clip8", flow_fn, cfg, 1),
                ("trace_clip8_fb2", flow_fn, cfg, 2),
                ("trace_clip8_mixed", flow_fn, cfg_mixed, 1),
                ("trace_clip8_fastflow", flow_fast, cfg, 1),
                ("trace_clip8_zeroflow", None, cfg, 1)):
            pipe = TracePipeline(tparams, adult, baby, tcfg, sc, flow_fn=ffn)
            pipe.process_clip(frames)          # compile

            # throughput mode = the pipelined stream the CLI uses (device
            # frontend of clip k+1 overlaps host backend of clip k)
            n_stream = 6
            if fb > 1:  # warm the batched-frontend shapes (fb*8 frames)
                for _ in pipe.process_stream((frames for _ in range(fb)),
                                             frontend_batch=fb):
                    pass

            def run_stream():
                for _ in pipe.process_stream(
                        (frames for _ in range(n_stream)),
                        frontend_batch=fb):
                    pass

            t = _measure(run_stream, iters=3, warmup=1) / n_stream
            note = ("pipelined stream incl. RAFT flow (20 it, bf16 = "
                    "reference autocast parity) + host tracking" if ffn
                    else "flow disabled")
            if tcfg.act_dtype == "bfloat16":
                note += "; bf16-act fast path (opt-in)"
            if ffn is flow_fast:
                note += "; half-res bf16 RAFT (--flow_size 256, opt-in)"
            if fb > 1:
                note += (f"; backbone+flow batched over {fb} clips "
                         "(--frontend_batch)")
            results.append({"model": name, "batch": 8,
                            "img_s": round(8 / t, 1),
                            "p50_clip_ms": round(t * 1e3, 1),
                            "note": note})
            print(json.dumps(results[-1]), flush=True)

    # ---- crowd / long-image mode: batched windows vs per-window calls ----
    if want("crowd"):
        import types

        from romp_tpu.models.bev import init_bev_params
        from romp_tpu.pipeline.bev_pipeline import BevConfig, BevPipeline
        from romp_tpu.pipeline.crowd import process_long_image

        cparams = init_bev_params(jax.random.PRNGKey(0))
        cadult = SmplModel.from_assets(synthetic_assets(seed=0,
                                                        num_betas=11))
        cbaby = SmplModel.from_assets(synthetic_assets(seed=1,
                                                       num_betas=10))
        ccfg = BevConfig(max_person=8, conf_thresh=-1e9,
                         compute_dtype="bfloat16", act_dtype="float32",
                         transfer_dtype="float16")
        pipe = BevPipeline(cparams, cadult, cbaby, ccfg)
        settings = types.SimpleNamespace(
            overlap_ratio=0.46, nms_thresh=16.0,
            relative_scale_thresh=3.0, input_size=512)
        pano = (np.random.RandomState(0).rand(512, 1536, 3)
                * 255).astype(np.uint8)

        class _SeqPipe:
            """The reference's serial per-crop loop
            (`simple_romp/bev/main.py:184-258`): one device call per
            window at batch 1, same merge math afterwards."""

            def __init__(self, inner):
                self.inner = inner

            def __call__(self, batch):
                outs = [self.inner(batch[i:i + 1])
                        for i in range(batch.shape[0])]
                return {k: jnp.concatenate([o[k] for o in outs])
                        for k in outs[0]}

        from romp_tpu.pipeline.crowd import (
            get_image_split_plan, padding_image_overlap,
        )

        pimg, _, _ = padding_image_overlap(pano, 0.46)
        n_windows = len(get_image_split_plan(pimg, 0.46))
        variants = (("crowd_pano_batched", pipe),
                    ("crowd_pano_sequential", _SeqPipe(pipe)))
        # INTERLEAVED A/B: the remote tunnel's bandwidth/RTT drifts on the
        # minute scale (measured 2x between adjacent serve_bench levels),
        # so timing the two variants in separate blocks attributes tunnel
        # weather to the code. Alternate iterations instead.
        times = {name: [] for name, _ in variants}
        for name, p in variants:          # compile both first
            process_long_image(p, pano, settings)
        for _ in range(8):
            for name, p in variants:
                t0 = time.perf_counter()
                process_long_image(p, pano, settings)
                times[name].append(time.perf_counter() - t0)
        for name, p in variants:
            t = float(np.median(times[name]))
            results.append({
                "model": name, "batch": n_windows,
                "img_s": round(n_windows / t, 1),
                "p50_pano_ms": round(t * 1e3, 1),
                "note": ("512x1536 panorama, %d sliding 512^2 windows, "
                         "interleaved A/B; %s; full crowd merge (boundary "
                         "exclusion, cam remap, global pruning) included"
                         % (n_windows,
                            "ONE device call for all windows "
                            "(pipeline/crowd.py)" if p is pipe else
                            "per-window serial dispatch (reference "
                            "bev/main.py:184-258 shape)")),
            })
            print(json.dumps(results[-1]), flush=True)

    # ---- ROMP training step (per-stage remat, bf16 activations) ----
    if want("train"):
        from romp_tpu.models.romp import init_romp_params as _irp2
        from romp_tpu.train.priors import GmmPrior
        from romp_tpu.train.train_step import (
            TrainConfig, init_train_state, make_synthetic_batch, train_step,
        )

        tcfg = TrainConfig(compute_dtype="bfloat16", act_dtype="bfloat16",
                           remat="stage")
        tr_params = _irp2(jax.random.PRNGKey(0))
        prior = GmmPrior.synthetic(num_gaussians=2, seed=0)
        tr_state = init_train_state(tr_params, tcfg)
        tr_batch = make_synthetic_batch(jax.random.PRNGKey(1),
                                        batch_size=64, input_size=512)
        tstep = jax.jit(lambda s, b: train_step(s, b, smpl, tcfg, prior),
                        donate_argnums=(0,))
        tr_state, tmet = tstep(tr_state, tr_batch)
        float(tmet["total"])                        # timing barrier

        def run_train():
            nonlocal tr_state
            tr_state, m = tstep(tr_state, tr_batch)
            float(m["total"])

        t = _measure(run_train, iters=5, warmup=0)
        results.append({"model": "romp_hrnet32_TRAIN_step", "batch": 64,
                        "img_s": round(64 / t, 1),
                        "p50_step_ms": round(t * 1e3, 1),
                        "note": "stage remat + bf16 activations, full "
                                "objective incl. GMM prior"})
        print(json.dumps(results[-1]), flush=True)

    _merge_and_write(results, partial=bool(only))


if __name__ == "__main__":
    main()
