"""Profile the TRACE clip pipeline stage by stage on the current device.

Usage: python scripts/profile_trace.py [--flow] [--clips N]
Prints per-stage median milliseconds per clip (TracePipeline.profile hooks).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flow", action="store_true", help="include RAFT flow")
    ap.add_argument("--clips", type=int, default=5)
    ap.add_argument("--max_person", type=int, default=8)
    ap.add_argument("--pipelined", action="store_true",
                    help="measure process_stream throughput (no per-stage "
                         "breakdown — stage syncs would serialize it)")
    ap.add_argument("--frontend_batch", type=int, default=1,
                    help="batch backbone+flow over this many consecutive "
                         "clips (pipelined mode only)")
    args = ap.parse_args()

    import jax

    from romp_tpu.models.raft import init_raft_params, make_trace_flow_fn
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.pipeline.trace_pipeline import TraceConfig, TracePipeline
    from romp_tpu.pipeline.trace_tracking import SeqConfig
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    rng = np.random.RandomState(0)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    tparams = init_trace_params(jax.random.PRNGKey(0), clip_length=8)
    tparams.update({k: v for k, v in
                    init_romp_params(jax.random.PRNGKey(1)).items()
                    if k.startswith("backbone.")})
    cfg = TraceConfig(temp_clip_length=8, max_person=args.max_person,
                      conf_thresh=-1e9, compute_dtype="bfloat16",
                      act_dtype="bfloat16", transfer_dtype="float16")
    sc = SeqConfig(large_object_thresh=-1e9, first_frame_det_thresh=-1e9,
                   tracker_det_thresh=-1e9, tracker_match_thresh=1e9)
    flow_fn = None
    if args.flow:
        # CLI-default parity flow (20 it, bf16 = reference autocast mode)
        flow_fn = make_trace_flow_fn(init_raft_params(jax.random.PRNGKey(2)),
                                     iters=20, compute_dtype="bfloat16",
                                     sequence=True)
    pipe = TracePipeline(tparams, adult, baby, cfg, sc, flow_fn=flow_fn)
    frames = rng.rand(8, 512, 512, 3).astype(np.float32) * 255.0

    # compile BOTH recurrent variants: first clip traces hidden=None,
    # every later clip the hidden=array graph
    pipe.process_clip(frames)
    pipe.process_clip(frames)
    if args.pipelined:
        fb = max(1, args.frontend_batch)
        if fb > 1:
            # warm the batched-frontend shapes (fb*8 frames per call)
            for _ in pipe.process_stream((frames for _ in range(fb)),
                                         frontend_batch=fb):
                pass
        t0 = time.perf_counter()
        for _ in pipe.process_stream((frames for _ in range(args.clips)),
                                     frontend_batch=fb):
            pass
        total_ms = (time.perf_counter() - t0) / args.clips * 1e3
        print(json.dumps({"device": str(jax.devices()[0]),
                          "flow": bool(args.flow), "pipelined": True,
                          "frontend_batch": fb,
                          "total_ms_per_clip": round(total_ms, 1),
                          "fps": round(8 / (total_ms / 1e3), 1)}, indent=1))
        return
    pipe.profile = True
    stage_runs = []
    totals = []
    for _ in range(args.clips):
        pipe.stage_times = {}          # per-clip snapshot, not cumulative
        t0 = time.perf_counter()
        pipe.process_clip(frames)
        totals.append(time.perf_counter() - t0)
        stage_runs.append(dict(pipe.stage_times))

    stages = {k: round(float(np.median([r.get(k, 0.0) for r in stage_runs]))
                       * 1e3, 1) for k in stage_runs[0]}
    total_ms = round(float(np.median(totals)) * 1e3, 1)
    stages["untracked"] = round(total_ms - sum(stages.values()), 1)
    print(json.dumps({"device": str(jax.devices()[0]),
                      "flow": bool(args.flow),
                      "total_ms_per_clip": total_ms,
                      "fps": round(8 / (total_ms / 1e3), 1),
                      "stages_ms": stages}, indent=1))


if __name__ == "__main__":
    main()
