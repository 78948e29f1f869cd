"""trace2 CLI runner: sequence loading, clip chunking, result saving.

Parity: `simple_romp/trace2/main.py` (sequence loader + cross-clip state
cacher) and `trace2/track.py:198` (collect_sequence_tracking_results).
"""
from __future__ import annotations

import os
import os.path as osp
import sys
from typing import Dict, List

import numpy as np


def load_sequence_frames(path: str) -> List[str]:
    from romp_tpu.utils.io import collect_image_paths, extract_video_frames

    if osp.isfile(path):
        import tempfile

        return extract_video_frames(
            path, tempfile.mkdtemp(prefix="trace_frames_"))
    return collect_image_paths(path)


def save_tracking_matrix(results_per_frame: Dict[int, Dict], path: str):
    """MOT-style tracking text output (frame, id, bbox-ish from pj2d)."""
    lines = []
    for fid in sorted(results_per_frame):
        fr = results_per_frame[fid]
        for j, tid in enumerate(fr.get("track_ids", [])):
            pj = fr["pj2d"][j]
            x0, y0 = pj.min(0)
            x1, y1 = pj.max(0)
            lines.append(
                f"{fid+1},{int(tid)},{x0:.1f},{y0:.1f},{x1-x0:.1f},"
                f"{y1-y0:.1f},1,-1,-1,-1")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def run_trace(settings) -> int:
    try:
        import cv2
    except ImportError:
        print("cv2 required", file=sys.stderr)
        return 1
    import jax

    from romp_tpu.cli.common import (
        load_checkpoint_flexible, load_smpl_assets_flexible,
    )
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.trace_pipeline import TraceConfig, TracePipeline
    from romp_tpu.pipeline.trace_tracking import SeqConfig
    from romp_tpu.smpl.body_model import SmplModel
    from romp_tpu.utils.io import img_preprocess

    def _init_full(rng):
        p = init_trace_params(rng, clip_length=settings.temp_clip_length)
        p.update({k: v for k, v in init_romp_params(rng).items()
                  if k.startswith("backbone.")})
        return p

    params = load_checkpoint_flexible(settings.model_path, _init_full)
    adult = load_smpl_assets_flexible(settings.smpl_path, num_betas=11)
    baby = load_smpl_assets_flexible(settings.smil_path, num_betas=10, seed=1)

    cfg = TraceConfig(temp_clip_length=settings.temp_clip_length,
                      max_person=settings.max_person,
                      conf_thresh=settings.center_thresh,
                      compute_dtype=settings.compute_dtype)
    seq_cfg = SeqConfig(subject_num=settings.subject_num,
                        smooth_pose_shape=True)
    flow_fn = None
    raft_path = getattr(settings, "raft_model_path", "")
    if raft_path and osp.exists(raft_path):
        from romp_tpu.models.raft import (
            filter_raft_state_dict, make_trace_flow_fn,
        )
        from romp_tpu.utils.checkpoint import load_torch_checkpoint

        raft_params = filter_raft_state_dict({
            k: v for k, v in load_torch_checkpoint(raft_path).items()
            if "num_batches_tracked" not in k})
        import jax.numpy as jnp

        raft_params = {k: jnp.asarray(v) for k, v in raft_params.items()}
        flow_fn = make_trace_flow_fn(
            raft_params, iters=getattr(settings, "raft_iters", 20),
            compute_dtype=getattr(settings, "flow_dtype", "bfloat16"),
            flow_input_size=getattr(settings, "flow_size", 512),
            corr_dtype=getattr(settings, "corr_dtype", "float32"),
            # streaming default: fnet shared over the clip's unique frames
            # (same outputs, ~1/3 less encoder compute per clip)
            sequence=getattr(settings, "flow_sequence", True))
    else:
        print("RAFT weights not found; running TRACE with zero optical flow",
              file=sys.stderr)

    pipe = TracePipeline(params, SmplModel.from_assets(adult),
                         SmplModel.from_assets(baby), cfg, seq_cfg,
                         flow_fn=flow_fn)

    frame_paths = load_sequence_frames(settings.input)
    os.makedirs(settings.save_path, exist_ok=True)
    T = settings.temp_clip_length

    def decode_chunk(start):
        chunk = frame_paths[start:start + T]
        return np.stack([
            img_preprocess(cv2.imread(p))[0][0] for p in chunk])

    results_per_frame: Dict[int, Dict] = {}
    starts = list(range(0, len(frame_paths), T))

    # Pipelined stream: process_stream dispatches clip k+1's device frontend
    # before collecting clip k, so decode + upload + backbone/flow/maps of
    # the next clip all overlap the current clip's host tracking/smoothing.
    def clip_iter():
        for s in starts:
            yield pipe.prefetch(decode_chunk(s))

    fb = max(1, int(getattr(settings, "frontend_batch", 1)))
    for start, out in zip(starts,
                          pipe.process_stream(clip_iter(),
                                              frontend_batch=fb)):
        if out is None:
            continue
        for row in range(len(out["track_ids"])):
            fid = start + int(out["frame_ids"][row])
            if not out["frame_valid"][row]:
                continue
            fr = results_per_frame.setdefault(fid, {k: [] for k in (
                "track_ids", "cam", "cam_trans", "world_cams", "world_grots",
                "smpl_thetas", "smpl_betas", "pj2d", "verts", "joints")})
            for k in fr:
                fr[k].append(out[k][row])
    for fid in results_per_frame:
        results_per_frame[fid] = {
            k: np.stack(v) for k, v in results_per_frame[fid].items()}

    seq_name = osp.basename(settings.input.rstrip("/")) or "sequence"
    np.savez(osp.join(settings.save_path, f"{seq_name}.npz"),
             results={str(k): v for k, v in results_per_frame.items()})
    save_tracking_matrix(results_per_frame,
                         osp.join(settings.save_path,
                                  f"TRACE_{seq_name}.txt"))
    if "world" in getattr(settings, "show_items", ""):
        # global-view renders + top-down trajectory + offline HTML viewer
        # (trace/lib/visualization/world_vis.py analog)
        from romp_tpu.vis.world_view import visualize_global_trajectory

        flat = {k: [] for k in ("track_ids", "frame_ids", "frame_valid",
                                "world_cams", "verts")}
        for fid in sorted(results_per_frame):
            fr = results_per_frame[fid]
            n = len(fr["track_ids"])
            flat["track_ids"] += list(fr["track_ids"])
            flat["frame_ids"] += [fid] * n
            flat["frame_valid"] += [True] * n
            flat["world_cams"] += list(fr["world_cams"])
            flat["verts"] += list(fr["verts"])
        if flat["track_ids"]:
            visualize_global_trajectory(
                {k: np.asarray(v) for k, v in flat.items()},
                np.asarray(adult.faces),
                osp.join(settings.save_path, "world_vis"))
    print(f"saved {len(results_per_frame)} frames of results to "
          f"{settings.save_path}")
    return 0
