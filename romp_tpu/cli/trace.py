"""`trace2` CLI — temporal video 3D recovery (TRACE).

Parity target: `simple_romp/trace2/main.py`. The device path is the jitted
TRACE pipeline (romp_tpu/pipeline/trace_pipeline.py).
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

from romp_tpu.cli.common import DEFAULT_HOME, add_common_flags


def trace_settings(input_args=None):
    parser = argparse.ArgumentParser(
        description="romp_tpu TRACE: temporal multi-person 5D regression")
    add_common_flags(parser, "trace")
    parser.add_argument("--center_thresh", type=float, default=0.1)
    parser.add_argument("--show_items", type=str, default="mesh")
    parser.add_argument("--temp_clip_length", type=int, default=8)
    parser.add_argument("--subject_num", type=int, default=-1,
                        help="lock onto the first-frame subjects (>0)")
    parser.add_argument("--smpl_path", type=str,
                        default=osp.join(DEFAULT_HOME, "SMPLA_NEUTRAL.pth"))
    parser.add_argument("--smil_path", type=str,
                        default=osp.join(DEFAULT_HOME, "smil_packed_info.pth"))
    parser.add_argument("--model_path", type=str,
                        default=osp.join(DEFAULT_HOME, "TRACE.pth"))
    parser.add_argument("--raft_model_path", type=str,
                        default=osp.join(DEFAULT_HOME, "raft-things.pth"),
                        help="RAFT optical-flow weights; zero flow if absent")
    parser.add_argument("--raft_iters", type=int, default=20,
                        help="RAFT refinement iterations (reference uses "
                             "20; 12 is a ~1.5x-faster fast path)")
    parser.add_argument("--flow_size", type=int, default=512,
                        help="RAFT input resolution (512 = reference "
                             "parity; 256 runs flow ~3x faster)")
    parser.add_argument("--flow_dtype", type=str, default="bfloat16",
                        choices=("float32", "bfloat16"),
                        help="RAFT compute dtype. bfloat16 is the parity "
                             "default: the reference runs RAFT's encoders "
                             "and update block under fp16 autocast "
                             "(trace2/models/raft/raft.py:93,104,121) with "
                             "the correlation volume in f32 — which is "
                             "exactly this mode (bf16 convs, f32-accumulated "
                             "correlation). float32 = full-precision flow.")
    parser.add_argument("--corr_dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="correlation-pyramid storage dtype. The "
                             "reference keeps the volume f32 even under "
                             "autocast (raft.py:95-96) so float32 is the "
                             "parity default; bfloat16 halves the biggest "
                             "tensor RAFT touches (opt-in, ~3% faster).")
    parser.add_argument("--frontend_batch", type=int, default=1,
                        help="batch the backbone+flow device frontend over "
                             "this many consecutive clips (dispatch_clips): "
                             "amortizes per-call launch latency for offline "
                             "sequences; results are bit-identical, latency "
                             "grows by one clip per increment.")
    args = parser.parse_args(input_args)
    args.calc_smpl = True
    return args


def main(input_args=None):
    settings = trace_settings(input_args)
    from romp_tpu.cli.trace_impl import run_trace

    return run_trace(settings)


if __name__ == "__main__":
    sys.exit(main())
