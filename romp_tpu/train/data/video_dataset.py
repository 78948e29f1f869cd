"""Video clip datasets for TRACE training.

Reference: `trace/lib/datasets/` video adapters + clip samplers
(`video_base_relative.py`, resampled per epoch in `trace/train_video.py:252`).
A VideoSequence holds per-frame annotations with persistent subject IDs;
ClipDataset samples fixed-length clips and emits the TRACE train-batch
schema (see train/trace_train_step.py), with trajectories indexed by subject.

The image backbone is frozen during TRACE training, so the loader emits
IMAGES; callers run the (jitted) feature extractor once per clip and cache —
matching the reference's precomputed-feature flow.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class VideoSequence:
    """One video's annotations. All arrays are per frame."""

    frame_paths: List[str]
    # {subject_id: dict with per-frame arrays masked by 'valid'}
    subjects: Dict[int, Dict[str, np.ndarray]]
    # each subject dict: valid (F,), czyx (F, 3) int GT center bins,
    # trans3d (F, 3), world_trans (F, 3), world_grot (F, 3),
    # pose (F, 66), betas (F, 11)
    cam_intrinsics: Optional[np.ndarray] = None

    @property
    def num_frames(self) -> int:
        return len(self.frame_paths)


class ClipDataset:
    """Samples fixed-length clips across sequences."""

    def __init__(self, sequences: Sequence[VideoSequence],
                 clip_length: int = 8, max_tracks: int = 8,
                 input_size: int = 512):
        self.sequences = [s for s in sequences
                          if s.num_frames >= clip_length]
        self.clip_length = clip_length
        self.max_tracks = max_tracks
        self.input_size = input_size

    def __len__(self):
        return sum(s.num_frames // self.clip_length for s in self.sequences)

    def _read_frames(self, seq: VideoSequence, start: int) -> np.ndarray:
        import cv2

        frames = []
        for p in seq.frame_paths[start:start + self.clip_length]:
            img = cv2.imread(p)
            if img is None:
                raise FileNotFoundError(p)
            img = cv2.resize(img[:, :, ::-1],
                             (self.input_size, self.input_size))
            frames.append(img.astype(np.float32))
        return np.stack(frames)

    def sample_clip(self, rng: np.random.RandomState
                    ) -> Dict[str, np.ndarray]:
        seq = self.sequences[rng.randint(len(self.sequences))]
        start = rng.randint(seq.num_frames - self.clip_length + 1)
        T, N = self.clip_length, self.max_tracks

        frames = self._read_frames(seq, start)
        sl = slice(start, start + T)
        out = {
            "frames": frames,
            "traj_czyx": np.zeros((N, T, 3), np.int32),
            "traj_valid": np.zeros((N, T), bool),
            "traj3d_gt": np.zeros((N, T, 3), np.float32),
            "world_trans_gt": np.zeros((N, T, 3), np.float32),
            "world_grot_gt": np.zeros((N, T, 3), np.float32),
            "pose_gt": np.zeros((N, T, 66), np.float32),
            "betas_gt": np.zeros((N, T, 11), np.float32),
        }
        for i, (sid, s) in enumerate(sorted(seq.subjects.items())[:N]):
            out["traj_valid"][i] = s["valid"][sl]
            out["traj_czyx"][i] = s["czyx"][sl]
            out["traj3d_gt"][i] = s["trans3d"][sl]
            out["world_trans_gt"][i] = s.get("world_trans", s["trans3d"])[sl]
            out["world_grot_gt"][i] = s["world_grot"][sl] \
                if "world_grot" in s else s["pose"][sl, :3]
            out["pose_gt"][i] = s["pose"][sl]
            b = s["betas"][sl]
            out["betas_gt"][i, :, :b.shape[-1]] = b
        return out


def clip_batch_iterator(ds: ClipDataset, feature_fn, flow_fn=None,
                        batch_size: int = 1, seed: int = 0,
                        ) -> Iterator[Dict[str, np.ndarray]]:
    """Assemble TRACE train batches: frozen-backbone features (+carry frame)
    + flows + GT trajectories (`trace_train_step` schema)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    while True:
        clips = [ds.sample_clip(rng) for _ in range(batch_size)]
        feats, flows = [], []
        for c in clips:
            fr = jnp.asarray(c["frames"])
            f = feature_fn(fr)                         # (T, 128, 128, 32)
            feats.append(np.concatenate(
                [np.asarray(f[:1]), np.asarray(f)], axis=0))
            if flow_fn is not None:
                prev = jnp.concatenate([fr[:1], fr[:-1]], axis=0)
                flows.append(np.asarray(flow_fn(prev, fr)))
            else:
                flows.append(np.zeros(
                    (c["frames"].shape[0], 128, 128, 2), np.float32))
        batch = {k: np.stack([c[k] for c in clips])
                 for k in clips[0] if k != "frames"}
        batch["feature_maps"] = np.stack(feats)
        batch["flows"] = np.stack(flows)
        yield batch


def from_pw3d_video(seq_dir: str, image_dir: str, split: str = "train",
                    map_size: int = 128,
                    depth_levels: int = 64) -> List[VideoSequence]:
    """Official 3DPW sequenceFiles -> VideoSequences with GT trajectories
    (camera-space SMPL roots binned onto the TRACE centermap grid)."""
    import glob
    import os.path as osp
    import pickle

    from romp_tpu.models.trace import trace_cam_anchor

    anchors = trace_cam_anchor()
    out = []
    for pkl in sorted(glob.glob(osp.join(seq_dir, split, "*.pkl"))):
        with open(pkl, "rb") as f:
            seq = pickle.load(f, encoding="latin1")
        name = seq["sequence"]
        n_frames = seq["poses"][0].shape[0]
        frame_paths = [osp.join(image_dir, name, f"image_{i:05d}.jpg")
                       for i in range(n_frames)]
        subjects = {}
        for a in range(len(seq["poses"])):
            j3d = np.asarray(seq["jointPositions"][a], np.float32
                             ).reshape(n_frames, 24, 3)
            root = j3d[:, 0]
            valid = np.asarray(seq.get(
                "campose_valid", [np.ones(n_frames)] * (a + 1))[a],
                bool)[:n_frames]
            depth = np.clip(root[:, 2], 0.3, 100.0)
            scale = 1.0 / np.tan(np.radians(25.0)) / depth
            cz = np.argmin(np.abs(scale[:, None] - anchors[None]), axis=1)
            xy = root[:, :2] / depth[:, None] / np.tan(np.radians(25.0))
            cx = np.clip(((xy[:, 0] + 1) / 2 * map_size), 0,
                         map_size - 1).astype(np.int32)
            cy = np.clip(((xy[:, 1] + 1) / 2 * map_size), 0,
                         map_size - 1).astype(np.int32)
            subjects[a] = {
                "valid": valid,
                "czyx": np.stack([cz, cy, cx], -1).astype(np.int32),
                "trans3d": root,
                "world_trans": root,
                "pose": np.asarray(seq["poses"][a], np.float32)[:, :66],
                "betas": np.tile(np.asarray(seq["betas"][a],
                                            np.float32)[:10][None],
                                 (n_frames, 1)),
            }
        out.append(VideoSequence(frame_paths, subjects))
    return out
