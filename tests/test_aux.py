"""Tests: eval drivers, profiling utils, socket vis server, BVH export."""
import numpy as np
import pytest

import jax.numpy as jnp


def test_match_by_center():
    from romp_tpu.eval.drivers import match_by_center

    gt = np.array([[10.0, 10], [100, 100]])
    pred = np.array([[98.0, 102], [11, 9], [500, 500]])
    pairs = dict(match_by_center(gt, pred, max_dist=20))
    assert pairs == {0: 1, 1: 0}


def test_evaluate_mesh_dataset_perfect_predictions():
    from romp_tpu.eval.drivers import evaluate_mesh_dataset

    rng = np.random.RandomState(0)
    gt_kp3d = rng.randn(2, 54, 3).astype(np.float32)
    centers = np.array([[50.0, 50], [200, 200]], np.float32)

    def run_image(image):
        return {
            "joints": gt_kp3d.copy(),
            "pj2d_org": np.tile(centers[:, None], (1, 54, 1)),
        }

    samples = [{"image": np.zeros((256, 256, 3), np.uint8),
                "gt_kp3d": gt_kp3d, "gt_centers": centers}]
    res = evaluate_mesh_dataset(run_image, samples)
    assert res["n_matched"] == 2
    assert res["mpjpe"] < 1e-3
    assert res["pampjpe"] < 1e-3
    assert res["recall"] == 1.0


def test_profiling_utils():
    from romp_tpu.utils.profiling import (
        FpsMeter, device_timer, force, init_seeds,
    )

    f = lambda x: x * 2.0
    stats = device_timer(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert stats["p50_ms"] >= 0
    assert force(jnp.ones(3)) == 3.0
    m = FpsMeter()
    for _ in range(5):
        m.tick()
    assert m.fps > 0
    key = init_seeds(0)
    assert key.shape == (2,)


def test_socket_server_roundtrip():
    from romp_tpu.vis.socket_server import ResultsClient, ResultsServer

    srv = ResultsServer(port=0)
    cli = ResultsClient(port=srv.port)
    import time

    time.sleep(0.1)  # accept loop
    results = {"smpl_thetas": np.zeros((2, 72), np.float32),
               "cam_trans": np.ones((2, 3), np.float32),
               "track_ids": np.array([1, 2])}
    sent = srv.broadcast(results, frame_id=7)
    assert sent == 1
    msg = cli.receive()
    assert msg["frame_id"] == 7
    assert len(msg["poses"]) == 2 and len(msg["poses"][0]) == 72
    np.testing.assert_allclose(msg["trans"], np.ones((2, 3)))
    cli.close()
    srv.close()


def test_bvh_export(tmp_path):
    from romp_tpu.tools.export_motion import export_bvh

    rng = np.random.RandomState(0)
    poses = rng.randn(5, 72).astype(np.float32) * 0.3
    trans = rng.randn(5, 3).astype(np.float32)
    path = str(tmp_path / "motion.bvh")
    export_bvh(poses, trans, path, frame_rate=30)
    text = open(path).read()
    assert text.startswith("HIERARCHY")
    assert "ROOT Pelvis" in text
    assert "Frames: 5" in text
    motion = text.split("MOTION")[1].strip().splitlines()[2:]
    assert len(motion) == 5
    assert len(motion[0].split()) == 3 + 24 * 3


def test_export_sequence_results(tmp_path):
    from romp_tpu.tools.export_motion import export_sequence_results

    seqs = {1: {"smpl_thetas": np.zeros((4, 72)),
                "cam_trans": np.zeros((4, 3))},
            2: {"smpl_thetas": np.zeros((3, 72))}}
    npz = str(tmp_path / "video_results.npz")
    np.savez(npz, results={}, sequence_results=seqs)
    paths = export_sequence_results(npz, str(tmp_path / "bvh"))
    assert len(paths) == 2


def test_ate_metric():
    from romp_tpu.eval.metrics import ate

    rng = np.random.RandomState(0)
    gt = np.cumsum(rng.randn(20, 3), axis=0)
    # rigid-transformed trajectory: ATE ~ 0 after alignment
    from romp_tpu.ops.rotations import axis_angle_to_matrix
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(
        rng.randn(3).astype(np.float32))))
    pred = gt @ R.T + np.array([3.0, -1.0, 2.0])
    assert ate(gt, pred) < 1e-5
    assert ate(gt, gt + rng.randn(20, 3)) > 0.5


def test_video_clip_dataset(tmp_path):
    import cv2
    from romp_tpu.train.data.video_dataset import ClipDataset, VideoSequence

    rng = np.random.RandomState(0)
    paths = []
    for i in range(10):
        p = str(tmp_path / f"f{i:03d}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (64, 64, 3), np.uint8))
        paths.append(p)
    F = 10
    subjects = {0: {
        "valid": np.ones(F, bool),
        "czyx": rng.randint(0, 64, (F, 3)).astype(np.int32),
        "trans3d": rng.randn(F, 3).astype(np.float32),
        "pose": rng.randn(F, 66).astype(np.float32),
        "betas": rng.randn(F, 10).astype(np.float32),
    }}
    ds = ClipDataset([VideoSequence(paths, subjects)], clip_length=4,
                     max_tracks=2, input_size=64)
    assert len(ds) == 2
    clip = ds.sample_clip(np.random.RandomState(1))
    assert clip["frames"].shape == (4, 64, 64, 3)
    assert clip["traj_valid"][0].all() and not clip["traj_valid"][1].any()
    assert clip["betas_gt"].shape == (2, 4, 11)


def test_camera_parameter_helpers():
    from romp_tpu.train.data.camera_parameters import (
        ROMP_FOCAL_512, focal_to_fov, fov_to_focal, intrinsics_matrix,
    )

    assert abs(fov_to_focal(60.0, 512.0) - ROMP_FOCAL_512) < 1.0
    assert abs(focal_to_fov(fov_to_focal(50.0, 512.0), 512.0) - 50.0) < 1e-6
    K = intrinsics_matrix([500.0, 510.0], [256.0, 256.0])
    assert K[0, 0] == 500.0 and K[1, 2] == 256.0
