"""TensorBoard event-file writer + Blender addon client (bpy-stubbed)."""
import glob
import os.path as osp

import numpy as np


def test_tensorboard_scalars_roundtrip(tmp_path):
    from romp_tpu.utils.tensorboard import SummaryWriter, read_events

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.5, 10)
    w.add_scalars({"loss/a": 2.0, "loss/b": 3.0}, 20)
    w.close()
    events = list(read_events(w.path))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 10
    np.testing.assert_allclose(events[1]["scalars"]["loss/total"], 1.5)
    assert events[2]["step"] == 20
    np.testing.assert_allclose(events[2]["scalars"]["loss/a"], 2.0)
    np.testing.assert_allclose(events[2]["scalars"]["loss/b"], 3.0)


def test_tensorboard_image_grid_roundtrip(tmp_path):
    from romp_tpu.utils.tensorboard import SummaryWriter, read_events

    w = SummaryWriter(str(tmp_path))
    imgs = np.zeros((3, 8, 8, 3), np.uint8)
    imgs[0] = 255
    w.add_image_grid("eval/worst", imgs, 5, ncol=2)
    w.close()
    (_, ev) = list(read_events(w.path))
    (tag, png) = ev["images"][0]
    assert tag == "eval/worst" and png[:8] == b"\x89PNG\r\n\x1a\n"
    # grid is 2 rows x 2 cols of 8x8 -> 16 x 16
    import cv2

    img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (16, 16, 3)
    assert img[:8, :8].min() == 255 and img[8:, 8:].max() == 0


def test_crc32c_known_vectors():
    """CRC32C (Castagnoli) test vectors from RFC 3720."""
    from romp_tpu.utils.tensorboard import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_trainer_writes_tensorboard(tmp_path):
    import jax

    from romp_tpu.config import Config
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel
    from romp_tpu.train.train_step import make_synthetic_batch
    from romp_tpu.train.trainer import Trainer
    from romp_tpu.utils.tensorboard import read_events

    cfg = Config()
    cfg.model.input_size = 64
    cfg.train.compute_dtype = "float32"
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_every = 1
    cfg.train.test_interval = 0
    cfg.mesh.n_devices = 1

    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    trainer = Trainer(cfg, smpl)

    def batches():
        key = jax.random.PRNGKey(0)
        while True:
            key, sub = jax.random.split(key)
            yield make_synthetic_batch(sub, batch_size=2, num_person=2,
                                       input_size=64)

    trainer.fit(batches(), max_steps=2)
    files = glob.glob(osp.join(cfg.train.checkpoint_dir, "tb",
                               "events.out.tfevents.*"))
    assert files
    steps = [e["step"] for e in read_events(files[0]) if e["scalars"]]
    assert steps  # at least one scalar record
    ev = [e for e in read_events(files[0]) if e["scalars"]][-1]
    assert "total" in ev["scalars"]
    assert np.isfinite(ev["scalars"]["total"])


# ------------------------------------------------------------- blender ----

class _StubBone:
    def __init__(self):
        self.rotation_quaternion = (1.0, 0.0, 0.0, 0.0)
        self.location = (0.0, 0.0, 0.0)


class _StubArmature:
    def __init__(self):
        from romp_tpu.vis.blender_addon import SMPL_BONES

        class Pose:
            bones = {n: _StubBone() for n in SMPL_BONES}

        self.pose = Pose()


def test_retarget_identity_pose():
    from romp_tpu.vis.blender_addon import (
        _PELVIS_FIX, retarget_pose,
    )

    quats, loc = retarget_pose(np.zeros(72), np.zeros(3))
    np.testing.assert_allclose(quats["L_Knee"], [1, 0, 0, 0])
    np.testing.assert_allclose(quats["Pelvis"], _PELVIS_FIX)
    np.testing.assert_allclose(loc, 0.0)
    # trans: lateral x and depth z are dropped, height y maps to Blender Y
    _, loc2 = retarget_pose(np.zeros(72), np.array([0.5, 0.2, 3.0]))
    np.testing.assert_allclose(loc2, [20.0, 0.0, 0.0])


def test_quat_math_against_rotation_composition():
    from romp_tpu.ops.rotations import axis_angle_to_matrix
    from romp_tpu.vis.blender_addon import axis_angle_to_quat, quat_mul

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a, b = rng.randn(3) * 0.7, rng.randn(3) * 0.7
    qa, qb = axis_angle_to_quat(a), axis_angle_to_quat(b)
    q = quat_mul(qa, qb)
    # quaternion -> matrix must equal matrix product
    w, x, y, z = q
    R_q = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    Ra = np.asarray(axis_angle_to_matrix(jnp.asarray(a[None]))[0])
    Rb = np.asarray(axis_angle_to_matrix(jnp.asarray(b[None]))[0])
    np.testing.assert_allclose(R_q, Ra @ Rb, atol=1e-6)


def test_addon_consumes_socket_stream():
    """End to end: ResultsServer.broadcast -> ResultsClient ->
    apply_frame_to_armature on a bpy-stubbed armature."""
    from romp_tpu.vis.blender_addon import apply_frame_to_armature
    from romp_tpu.vis.socket_server import ResultsClient, ResultsServer

    server = ResultsServer(port=0)
    try:
        client = ResultsClient(port=server.port)
        import time

        deadline = time.time() + 5.0
        while server.broadcast({}) == 0:      # wait for accept
            assert time.time() < deadline
            time.sleep(0.01)

        thetas = np.zeros((2, 72))
        thetas[0, 3:6] = [0.3, 0.0, 0.0]      # L_Hip bend, person 0
        results = {"smpl_thetas": thetas,
                   "smpl_betas": np.zeros((2, 10)),
                   "cam_trans": np.array([[0.0, 0.4, 3.0],
                                          [1.0, 0.0, 5.0]]),
                   "track_ids": np.array([7, 9])}
        assert server.broadcast(results, frame_id=3) == 1
        client.receive()                       # the empty probe frame
        payload = client.receive()
        assert payload["frame_id"] == 3

        arm = _StubArmature()
        assert apply_frame_to_armature(arm, payload)
        q = np.asarray(arm.pose.bones["L_Hip"].rotation_quaternion)
        np.testing.assert_allclose(q, [np.cos(0.15), np.sin(0.15), 0, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(arm.pose.bones["Pelvis"].location,
                                   [40.0, 0.0, 0.0])
        # track selection
        arm2 = _StubArmature()
        assert apply_frame_to_armature(arm2, payload, track_id=9)
        np.testing.assert_allclose(
            arm2.pose.bones["L_Hip"].rotation_quaternion, [1, 0, 0, 0])
        assert not apply_frame_to_armature(arm2, payload, track_id=42)
        client.close()
    finally:
        server.close()
