"""Third-party 3DPW result collectors (CRMH frame-matched / VIBE
track-matched) round-tripped through the official scorer."""
import pickle

import numpy as np
import pytest

from romp_tpu.eval.collectors import (
    collect_frame_matched, collect_track_matched, gt_anchor_centers,
    rotmat_to_axis_angle,
)
from tests.test_protocols import _make_pw3d_fixture


def test_rotmat_to_axis_angle_roundtrip():
    from romp_tpu.eval.protocols import _aa_to_quat_wxyz, _quat_to_mat

    rng = np.random.RandomState(0)
    aa = rng.randn(64, 3)
    # keep |angle| < pi: beyond it the principal axis-angle legitimately
    # wraps to the equivalent (2pi - theta, -axis) representation
    aa *= (rng.rand(64, 1) * 3.0) / np.linalg.norm(aa, axis=1, keepdims=True)
    aa = np.concatenate([aa, aa * 1e-5, np.zeros((1, 3))])  # tiny + zero
    R = np.stack([_quat_to_mat(_aa_to_quat_wxyz(a)) for a in aa])
    back = rotmat_to_axis_angle(R)
    assert np.abs(back - aa).max() < 1e-4


def test_gt_anchor_centers_carry_forward():
    # raw 3DPW layout per subject: (frames, 3, 18); hips are joints 8/11
    p2d = np.zeros((3, 3, 18), np.float32)
    p2d[:, 2] = 1.0
    p2d[0, 0, [8, 11]] = [90.0, 110.0]
    p2d[0, 1, [8, 11]] = [200.0, 200.0]
    p2d[1, 2, [8, 11]] = 0.0               # frame 1: hips unannotated
    p2d[2, 0, [8, 11]] = [300.0, 300.0]
    p2d[2, 1, [8, 11]] = [400.0, 400.0]
    c = gt_anchor_centers([p2d])
    assert c.shape == (1, 3, 2)
    assert np.allclose(c[0, 0], [100.0, 200.0])
    assert np.allclose(c[0, 1], c[0, 0])   # carried forward
    assert np.allclose(c[0, 2], [300.0, 400.0])


def _fixture_with_anchors(tmp_path):
    """Build the official fixture, add img_frame_ids, and rewrite poses2d
    in the raw (N, 3, 18) layout with well-separated per-subject hips."""
    smpl_fn = _make_pw3d_fixture(tmp_path)
    gt_path = tmp_path / "truth" / "test" / "seq0.pkl"
    gt = pickle.load(open(gt_path, "rb"), encoding="latin1")
    N = np.asarray(gt["poses"][0]).shape[0]
    gt["img_frame_ids"] = np.arange(N)
    subj_centers = np.array([[100.0, 100.0], [300.0, 300.0]], np.float32)
    p2d = np.zeros((2, N, 3, 18), np.float32)
    p2d[:, :, 2] = 1.0
    for s in range(2):
        p2d[s, :, 0, [8, 11]] = subj_centers[s, 0]
        p2d[s, :, 1, [8, 11]] = subj_centers[s, 1]
    gt["poses2d"] = list(p2d)
    pickle.dump(gt, open(gt_path, "wb"))
    return smpl_fn, gt, subj_centers, N


def _camera_frame_preds(smpl_fn, gt, N):
    """Per-subject camera-frame (pose72, betas, joints24) streams."""
    from romp_tpu.eval.protocols import pw3d_apply_camera

    preds = []
    for s, gender in enumerate(gt["genders"]):
        poses = np.asarray(gt["poses"])[s]
        betas = np.tile(np.asarray(gt["betas"][s])[None, :10], (N, 1))
        trans = np.asarray(gt["trans"])[s]
        j24, glob = smpl_fn(gender, poses, betas, trans)
        j24, _ = pw3d_apply_camera(j24, glob, np.asarray(gt["cam_poses"]))
        preds.append((poses, betas, j24))
    return preds


def test_crmh_frame_matched_collector_scores_zero(tmp_path):
    """CRMH-style per-frame dump (both people per frame, shuffled order,
    matched by hip-anchor distance) -> submission -> official score ~0."""
    from romp_tpu.eval.protocols import pw3d_evaluate

    smpl_fn, gt, subj_centers, N = _fixture_with_anchors(tmp_path)
    preds = _camera_frame_preds(smpl_fn, gt, N)

    results = {"seq0": {}}
    for f in range(N):
        order = [1, 0] if f % 2 else [0, 1]    # detections arrive shuffled
        results["seq0"][f] = {
            "bbox_centers": subj_centers[order] + 7.0,   # noisy detections
            "pose": np.stack([preds[s][0][f] for s in order]),
            "betas": np.stack([preds[s][1][f] for s in order]),
            "joints24": np.stack([preds[s][2][f] for s in order]),
        }
    collect_frame_matched(results, str(tmp_path / "truth"),
                          str(tmp_path / "submit2"))
    out = pw3d_evaluate(str(tmp_path / "submit2"), str(tmp_path / "truth"),
                        smpl_fn)
    assert out["MPJPE"] < 1.0
    assert out["MPJPE_PA"] < 1.0
    assert out["PCK"] > 99.0


def test_vibe_track_matched_collector_scores_zero(tmp_path):
    """VIBE-style per-track dump (tracks keyed in the wrong order, assigned
    to subjects by first-frame center) -> submission -> official score ~0."""
    from romp_tpu.eval.protocols import pw3d_evaluate

    smpl_fn, gt, subj_centers, N = _fixture_with_anchors(tmp_path)
    preds = _camera_frame_preds(smpl_fn, gt, N)

    tracks = {}
    for s in range(2):
        tracks[9 - s] = {                       # ids unrelated to subjects
            "frame_ids": np.arange(N),
            "bbox_centers": np.tile(subj_centers[s] + 3.0, (N, 1)),
            "pose": preds[s][0],
            "betas": preds[s][1],
            "joints24": preds[s][2],
        }
    results = {"seq0": tracks}
    collect_track_matched(results, str(tmp_path / "truth"),
                          str(tmp_path / "submit2"))
    out = pw3d_evaluate(str(tmp_path / "submit2"), str(tmp_path / "truth"),
                        smpl_fn)
    assert out["MPJPE"] < 1.0
    assert out["MPJPE_PA"] < 1.0


def test_rotmat_pose_and_verts_regressor_paths(tmp_path):
    """pose_rotmat + verts/joint_regressor encodings give the same
    submission as pose72 + joints24."""
    from romp_tpu.eval.protocols import _aa_to_quat_wxyz, _quat_to_mat

    smpl_fn, gt, subj_centers, N = _fixture_with_anchors(tmp_path)
    preds = _camera_frame_preds(smpl_fn, gt, N)

    rng = np.random.RandomState(3)
    verts = rng.randn(2, N, 120, 3).astype(np.float32)
    reg = np.zeros((120, 24), np.float32)
    reg[:24, :24] = np.eye(24)                  # joints = first 24 verts
    j24 = verts[:, :, :24]

    def build(results_rec):
        results = {"seq0": {f: results_rec(f) for f in range(N)}}
        return collect_frame_matched(
            results, str(tmp_path / "truth"), str(tmp_path / "sub_a"),
            joint_regressor=reg)

    def rec_direct(f):
        return {"bbox_centers": subj_centers,
                "pose": np.stack([preds[s][0][f] for s in range(2)]),
                "betas": np.stack([preds[s][1][f] for s in range(2)]),
                "joints24": j24[:, f]}

    def rec_encoded(f):
        rot = np.stack([
            np.stack([_quat_to_mat(_aa_to_quat_wxyz(a))
                      for a in preds[s][0][f].reshape(24, 3)])
            for s in range(2)])
        return {"bbox_centers": subj_centers, "pose_rotmat": rot,
                "betas": np.stack([preds[s][1][f] for s in range(2)]),
                "verts": verts[:, f]}

    col_a = build(rec_direct)
    col_b = build(rec_encoded)
    for a, b in zip(col_a.results["seq0"], col_b.results["seq0"]):
        assert np.abs(a - b).max() < 1e-3


def test_missing_joint_regressor_raises(tmp_path):
    _fixture_with_anchors(tmp_path)
    with pytest.raises(ValueError, match="joint_regressor"):
        collect_frame_matched(
            {"seq0": {0: {"bbox_centers": np.zeros((1, 2)),
                          "pose": np.zeros((1, 72)),
                          "betas": np.zeros((1, 10)),
                          "verts": np.zeros((1, 10, 3))}}},
            str(tmp_path / "truth"), str(tmp_path / "sub"))
