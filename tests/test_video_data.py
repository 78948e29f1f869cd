"""Tests for the video dataset layer: DynaCam / PennAction converters and
the dynamic-camera augmentation (VERDICT r1 #2, video half)."""
import os.path as osp

import numpy as np
import pytest

from romp_tpu.train.data.video_dataset import (
    ClipDataset, VideoSequence, _FOV_HALF_TAN, dynamic_camera_curves,
    from_dynacam_npz, from_penn_action_mats, retarget_camera_space,
    trans3d_to_czyx,
)


def _make_sequence(tmp_path, F=8, static=True, depth=4.0):
    import cv2

    paths = []
    for f in range(F):
        p = str(tmp_path / f"f{f:03d}.jpg")
        cv2.imwrite(p, np.full((64, 64, 3), 30 * (f % 8), np.uint8))
        paths.append(p)
    from romp_tpu.models.trace import trace_cam_anchor

    t = np.linspace(-0.5, 0.5, F).astype(np.float32)
    trans3d = np.stack([t * depth * _FOV_HALF_TAN,
                        np.zeros(F, np.float32),
                        np.full(F, depth, np.float32)], -1)
    subjects = {0: {
        "valid": np.ones(F, bool),
        "czyx": trans3d_to_czyx(trans3d, trace_cam_anchor()),
        "trans3d": trans3d,
        "world_trans": trans3d.copy(),
        "pose": np.zeros((F, 66), np.float32),
        "betas": np.zeros((F, 11), np.float32),
    }}
    return VideoSequence(paths, subjects, is_static_cam=static)


def test_retarget_camera_space_roundtrip():
    """Zero motion is the identity; pure pan shifts X by ox*Z*tan; zoom k
    divides depth by k (the weak-persp zoom equivalence)."""
    rng = np.random.RandomState(0)
    tr = np.abs(rng.randn(5, 3).astype(np.float32)) + [0, 0, 3.0]
    same = retarget_camera_space(tr, np.zeros(5), np.zeros(5), np.ones(5))
    np.testing.assert_allclose(same, tr, rtol=1e-6)

    panned = retarget_camera_space(tr, np.full(5, 0.2), np.zeros(5),
                                   np.ones(5))
    np.testing.assert_allclose(panned[:, 0],
                               tr[:, 0] - 0.2 * tr[:, 2] * _FOV_HALF_TAN,
                               rtol=1e-5)
    zoomed = retarget_camera_space(tr, np.zeros(5), np.zeros(5),
                                   np.full(5, 2.0))
    np.testing.assert_allclose(zoomed[:, 2], tr[:, 2] / 2.0, rtol=1e-6)
    # pure zoom magnifies the normalized image position by k:
    # x' / z' = x / (z/k) = k * (x/z)
    np.testing.assert_allclose(zoomed[:, 0] / zoomed[:, 2],
                               2.0 * tr[:, 0] / tr[:, 2], rtol=1e-5)


def test_dynamic_camera_curves_shapes_and_anchor():
    rng = np.random.RandomState(3)
    for _ in range(10):
        dx, dy, zoom = dynamic_camera_curves(8, rng)
        assert dx.shape == (8,) and dy.shape == (8,) and zoom.shape == (8,)
        assert np.isfinite(dx).all() and np.isfinite(dy).all()
        assert np.abs(dx).max() < 1.0 and (zoom > 0).all()


def test_clip_dataset_dynamic_aug_consistency(tmp_path):
    """Dynamic augmentation keeps world GT fixed, changes camera-space GT,
    and the two stay related by the synthesized motion (finite, in-range
    bins; zero-motion static clip is untouched)."""
    seq = _make_sequence(tmp_path)
    ds = ClipDataset([seq], clip_length=8, max_tracks=2, input_size=64,
                     dynamic_aug_prob=1.0, tracking_aug_prob=0.0)
    rng = np.random.RandomState(1)
    clip = ds.sample_clip(rng)
    assert clip["frames"].shape == (8, 64, 64, 3)
    # world GT untouched
    np.testing.assert_allclose(clip["world_trans_gt"][0],
                               seq.subjects[0]["world_trans"], rtol=1e-6)
    # camera GT changed but finite + in-range bins
    assert np.isfinite(clip["traj3d_gt"][0]).all()
    assert (clip["traj_czyx"][0, :, 1:] >= 0).all()
    assert (clip["traj_czyx"][0, :, 1:] < 128).all()

    # no augmentation -> camera GT equals world GT here
    ds0 = ClipDataset([seq], clip_length=8, max_tracks=2, input_size=64,
                      dynamic_aug_prob=0.0)
    clip0 = ds0.sample_clip(np.random.RandomState(1))
    np.testing.assert_allclose(clip0["traj3d_gt"][0],
                               seq.subjects[0]["trans3d"], rtol=1e-6)


def test_clip_dataset_tracking_mode_centers_subject(tmp_path):
    """Tracking augmentation keeps the followed subject near the synthetic
    camera's principal axis (normalized position ~0)."""
    seq = _make_sequence(tmp_path)
    ds = ClipDataset([seq], clip_length=8, max_tracks=2, input_size=64,
                     dynamic_aug_prob=1.0, tracking_aug_prob=1.0)
    clip = ds.sample_clip(np.random.RandomState(2))
    tr = clip["traj3d_gt"][0]
    norm_x = tr[:, 0] / tr[:, 2] / _FOV_HALF_TAN
    assert np.abs(norm_x).max() < 0.05
    # dynamic cameras are never re-augmented
    seq_dyn = _make_sequence(tmp_path, static=False)
    ds2 = ClipDataset([seq_dyn], clip_length=8, input_size=64,
                      dynamic_aug_prob=1.0)
    clip2 = ds2.sample_clip(np.random.RandomState(0))
    np.testing.assert_allclose(clip2["traj3d_gt"][0][:, 2],
                               seq_dyn.subjects[0]["trans3d"][:, 2],
                               rtol=1e-6)


def test_from_dynacam_npz(tmp_path):
    rng = np.random.RandomState(4)
    F, N = 6, 2
    # simple moving camera: identity rotation, translating in x
    extr = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    extr[:, 0, 3] = np.linspace(0, 1, F)
    annots = {
        "sequence_dict": {"seq0": list(range(F))},
        "seq0": {
            "person_id": np.arange(N),
            "camera_intrinsics": np.tile(np.eye(3, dtype=np.float32),
                                         (F, 1, 1)),
            "camera_extrinsics": extr,
            "world_trans": np.stack([
                np.tile([0.0, 0.0, 4.0], (F, 1)),
                np.tile([1.0, 0.2, 6.0], (F, 1))]).astype(np.float32),
            "world_grots": rng.randn(N, F, 3).astype(np.float32) * 0.2,
            "poses": rng.randn(N, F, 72).astype(np.float32) * 0.2,
            "betas": rng.randn(N, F, 10).astype(np.float32) * 0.5,
        },
    }
    path = str(tmp_path / "translation_train.npz")
    np.savez(path, annots=annots)
    seqs = from_dynacam_npz(path, image_root=str(tmp_path))
    assert len(seqs) == 1
    s = seqs[0]
    assert not s.is_static_cam and s.num_frames == F
    assert set(s.subjects) == {0, 1}
    # camera-space x = world x + extrinsic translation x
    np.testing.assert_allclose(s.subjects[0]["trans3d"][:, 0],
                               np.linspace(0, 1, F), atol=1e-6)
    assert s.subjects[0]["valid"].all()
    assert s.subjects[0]["pose"].shape == (F, 66)
    assert s.subjects[0]["betas"].shape == (F, 11)


def test_from_penn_action_mats(tmp_path):
    from scipy.io import savemat

    F = 5
    x = np.tile(np.linspace(100, 200, 13), (F, 1))
    y = np.tile(np.linspace(80, 400, 13), (F, 1))
    savemat(str(tmp_path / "0001.mat"), {
        "x": x, "y": y, "visibility": np.ones((F, 13)),
        "nframes": np.array([[F]]), "dimensions": np.array([[480, 640, F]]),
        "action": np.array(["tennis_serve"]), "train": np.array([[1]])})
    seqs = from_penn_action_mats(str(tmp_path))
    assert len(seqs) == 1
    s = seqs[0]
    assert s.is_static_cam and s.num_frames == F
    sub = s.subjects[0]
    assert sub["valid"].all()
    assert (sub["trans3d"][:, 2] > 0.3).all()      # plausible pseudo-depth
    assert (sub["czyx"] >= 0).all()
    assert s.frame_paths[0].endswith(osp.join("0001", "000001.jpg"))


def test_from_h36m_video(tmp_path):
    import numpy as np

    from romp_tpu.train.data.video_dataset import from_h36m_video

    rng = np.random.RandomState(0)
    F = 12
    names = ([f"S1_Walking.54138969_{i:06d}.jpg" for i in range(F)]
             + [f"S1_Eating.54138969_{i:06d}.jpg" for i in range(F)])
    S = np.zeros((2 * F, 17, 4), np.float32)
    S[:, :, :3] = rng.randn(2 * F, 17, 3)
    S[:, 0, 2] = 4.0                     # pelvis depth
    S[:, :, 3] = 1.0
    pose = rng.randn(2 * F, 72).astype(np.float32) * 0.1
    shape = rng.randn(2 * F, 10).astype(np.float32) * 0.1
    np.savez(tmp_path / "h36m.npz", imgname=np.array(names), S=S,
             pose=pose, shape=shape)
    seqs = from_h36m_video(str(tmp_path / "h36m.npz"), image_root="/img",
                           subsample=2)
    assert len(seqs) == 2
    s = seqs[0]
    assert s.num_frames == F // 2
    sub = s.subjects[0]
    assert sub["pose"].shape == (F // 2, 66)
    assert sub["betas"].shape == (F // 2, 11)
    assert sub["czyx"].dtype == np.int32
    np.testing.assert_allclose(sub["trans3d"][:, 2], 4.0)
    assert s.frame_paths[0].startswith("/img/")


def test_from_mpi_inf_3dhp_video(tmp_path):
    import numpy as np

    from romp_tpu.train.data.video_dataset import from_mpi_inf_3dhp_video

    rng = np.random.RandomState(1)
    annots = {}
    for subj in ("S1", "S8"):
        for i in range(6):
            kp3d = rng.randn(28, 3).astype(np.float32)
            kp3d[4, 2] = 3.0
            annots[f"{subj}_Seq1_V0_{i:05d}.jpg"] = {
                "kp2d": rng.rand(28, 2) * 512, "kp3d": kp3d}
    np.savez(tmp_path / "mpiinf.npz", annots=annots)
    train = from_mpi_inf_3dhp_video(str(tmp_path / "mpiinf.npz"),
                                    split="train")
    val = from_mpi_inf_3dhp_video(str(tmp_path / "mpiinf.npz"),
                                  split="val")
    assert len(train) == 1 and len(val) == 1
    np.testing.assert_allclose(train[0].subjects[0]["trans3d"][:, 2], 3.0)
    assert "S1" in train[0].frame_paths[0]
    assert "S8" in val[0].frame_paths[0]


def test_from_internet_video(tmp_path):
    import cv2
    import numpy as np

    from romp_tpu.train.data.video_dataset import from_internet_video

    for i in range(3):
        cv2.imwrite(str(tmp_path / f"f{i:04d}.jpg"),
                    np.zeros((8, 8, 3), np.uint8))
    seqs = from_internet_video(str(tmp_path))
    assert len(seqs) == 1 and seqs[0].num_frames == 3
    assert seqs[0].subjects == {}
    assert from_internet_video(str(tmp_path / "empty")) == []


def test_h36m_frame_extractor(tmp_path):
    import cv2
    import numpy as np

    from romp_tpu.tools.extract_h36m_frames import (
        extract_subject, extract_video,
    )

    vid_dir = tmp_path / "S1" / "Videos"
    vid_dir.mkdir(parents=True)
    for name in ("Walking 1.54138969.mp4", "Walking 1_ALL.55011271.mp4"):
        w = cv2.VideoWriter(str(vid_dir / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 24))
        for i in range(22):
            frame = np.full((24, 32, 3), i * 10, np.uint8)
            w.write(frame)
        w.release()

    out = tmp_path / "frames"
    out.mkdir()
    written = extract_subject("S1", str(tmp_path), str(out), every=5,
                              max_frames=3)
    # frames 5, 10, 15 of the non-_ALL video only (frame 0 skipped)
    assert len(written) == 3
    assert all("S1_Walking 1_0_" in p for p in written)
    img = cv2.imread(written[0])
    assert img is not None and img.shape == (24, 32, 3)

    # direct single-video call honors `every`
    w2 = extract_video(str(vid_dir / "Walking 1.54138969.mp4"),
                       str(out), every=10, max_frames=0)
    assert len(w2) == 2                       # frames 10 and 20


def test_tracking_crop_window_out_of_bounds_safe(tmp_path):
    """Far-off-center crop windows (|ox|,|oy| ~ 1, small zoom) must not
    produce an empty slice / cv2.resize error (ADVICE r2)."""
    import cv2

    from romp_tpu.train.data.video_dataset import ClipDataset, VideoSequence

    S = 64
    paths = []
    for t in range(4):
        p = str(tmp_path / f"f{t}.png")
        cv2.imwrite(p, np.full((S, S, 3), 128, np.uint8))
        paths.append(p)
    seq = VideoSequence(frame_paths=paths, subjects={}, is_static_cam=True)
    ds = ClipDataset([seq], clip_length=4, input_size=S)
    # corner window at extreme offset with zoom < 1 (window larger than frame)
    crops = np.array([[1.5, -1.5, 0.5]] * 4, np.float32)
    frames = ds._read_frames(seq, 0, crops)
    assert frames.shape == (4, S, S, 3)
    assert np.isfinite(frames).all()
