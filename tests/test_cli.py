"""CLI smoke tests: full romp tool flow on a synthetic image (random weights)."""
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_romp_cli_image_mode(tmp_path):
    from romp_tpu.cli.romp import ROMP, romp_settings

    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(0)
    cv2.imwrite(img_path, rng.randint(0, 255, (300, 400, 3), np.uint8))

    out_dir = str(tmp_path / "out")
    settings = romp_settings([
        "-m", "image", "-i", img_path, "-o", out_dir,
        "--model_path", str(tmp_path / "missing.pkl"),   # random init
        "--smpl_path", str(tmp_path / "missing.pth"),    # synthetic assets
        "--center_thresh", "-1000",                       # force detections
        "--render_mesh", "--compute_dtype", "float32",
        "--max_person", "4",
    ])
    model = ROMP(settings)
    res = model(cv2.imread(img_path))
    assert res is not None
    assert "smpl_thetas" in res and res["smpl_thetas"].shape[-1] == 72
    assert "verts" in res and res["verts"].shape[-2:] == (6890, 3)
    assert "pj2d_org" in res
    assert "rendered_image" in res
    assert res["rendered_image"].shape[0] == 300

    from romp_tpu.utils.io import ResultSaver

    saver = ResultSaver(mode="image", save_path=out_dir)
    saver(res, img_path)
    assert osp.exists(osp.join(out_dir, "in.png"))
    assert osp.exists(osp.join(out_dir, "in.npz"))
    loaded = np.load(osp.join(out_dir, "in.npz"), allow_pickle=True)
    assert "smpl_betas" in loaded["results"][()]


@pytest.mark.slow
def test_temporal_optimizer_video_flow(tmp_path):
    """TemporalOptimizer over a fake 3-frame stream of device outputs."""
    from romp_tpu.pipeline.video import TemporalOptimizer, collect_sequence_results

    rng = np.random.RandomState(1)
    opt = TemporalOptimizer(det_thresh=0.1)
    frames = []
    base_cam = np.array([[1.0, 0.0, 0.0], [0.8, 0.3, 0.3]], np.float32)
    for f in range(3):
        cams = base_cam + rng.randn(2, 3).astype(np.float32) * 0.01
        out = {
            "cam": cams.copy(),
            "cam_trans": np.concatenate(
                [cams[:, 2:0:-1], 1.0 / cams[:, :1]], 1),
            "center_confs": np.array([0.9, 0.8], np.float32),
            "smpl_thetas": rng.randn(2, 72).astype(np.float32) * 0.2,
            "smpl_betas": rng.randn(2, 10).astype(np.float32),
        }
        frames.append(opt(out))
    assert all(fr is not None for fr in frames)
    assert all(len(fr["track_ids"]) == 2 for fr in frames)
    assert (frames[0]["track_ids"].tolist()
            == frames[1]["track_ids"].tolist()
            == frames[2]["track_ids"].tolist())
    seqs = collect_sequence_results(frames)
    assert len(seqs) == 2
    for tid, seq in seqs.items():
        assert seq["frame_id"] == [0, 1, 2]


def test_webcam_mode_with_fake_stream(tmp_path):
    """Webcam loop smoke test: a synthetic frame stream stands in for the
    camera (no capture device in this environment); the loop must consume
    frames, call the model, and terminate on stream end / max_frames."""
    import numpy as np

    from romp_tpu.cli.runner import run_tool

    class FakeStream:
        def __init__(self, n):
            self.n = n
            self.stopped = False

        def start(self):
            return self

        def read(self):
            if self.n == 0:
                self.stopped = True
                return None
            self.n -= 1
            return np.zeros((48, 64, 3), np.uint8)

        def stop(self):
            self.stopped = True

    calls = []

    def model(frame):
        calls.append(frame.shape)
        return None

    class S:
        mode = "webcam"
        show = False
        webcam_id = 0
        stream_factory = staticmethod(lambda: FakeStream(5))
        max_frames = None

    assert run_tool(model, S()) == 0
    assert len(calls) == 5                      # consumed all frames

    class S2(S):
        stream_factory = staticmethod(lambda: FakeStream(100))
        max_frames = 3

    calls.clear()
    assert run_tool(model, S2()) == 0
    assert len(calls) == 3                      # bounded by max_frames


def test_webcam_socket_stream(tmp_path):
    """`--socket_stream`: the mode loop broadcasts every frame's results to
    a connected TCP client (the Blender live-mocap flow,
    scripts/webcam_blender.sh)."""
    import threading

    from romp_tpu.cli.runner import run_tool
    from romp_tpu.vis.socket_server import ResultsClient, ResultsServer

    # grab a free port by binding a throwaway server first
    probe = ResultsServer(port=0)
    port = probe.port
    probe.close()

    class FakeStream:
        def __init__(self, n):
            self.n = n
            self.stopped = False

        def start(self):
            return self

        def read(self):
            if self.n == 0:
                self.stopped = True
                return None
            self.n -= 1
            return np.zeros((48, 64, 3), np.uint8)

        def stop(self):
            self.stopped = True

    import time

    def model(frame):
        return {"smpl_thetas": np.zeros((2, 72), np.float32),
                "smpl_betas": np.zeros((2, 10), np.float32),
                "cam_trans": np.ones((2, 3), np.float32),
                "track_ids": np.array([3, 7], np.int32)}

    connected = threading.Event()

    class Deferred(FakeStream):
        """Holds the first frame until the consumer has connected (a fixed
        sleep loses the race on a loaded 1-core box)."""

        def __init__(self):
            super().__init__(4)
            self._waited = False

        def read(self):
            if not self._waited:
                connected.wait(timeout=15)
                time.sleep(0.25)      # let the accept thread register it
                self._waited = True
            return super().read()

    class S:
        mode = "webcam"
        show = False
        webcam_id = 0
        stream_factory = staticmethod(lambda: Deferred())
        max_frames = None
        socket_stream = True
        socket_port = port

    received = []

    def consume():
        cli = None
        for _ in range(50):           # retry until run_tool's server is up
            try:
                cli = ResultsClient(port=port, timeout=10.0)
                break
            except OSError:
                time.sleep(0.05)
        assert cli is not None, "server never came up"
        connected.set()
        while True:
            msg = cli.receive()
            if msg is None:
                break
            received.append(msg)
        cli.close()

    t2 = threading.Thread(target=lambda: run_tool(model, S()))
    t = threading.Thread(target=consume)
    t2.start()
    t.start()
    t2.join(30)
    t.join(30)
    assert len(received) == 4
    assert received[0]["poses"] == [[0.0] * 72, [0.0] * 72]
    assert received[0]["track_ids"] == [3, 7]
    assert [m["frame_id"] for m in received] == [0, 1, 2, 3]


def test_export_motion_cli(tmp_path):
    """`python -m romp_tpu.tools.export_motion`: video_results.npz -> BVH
    per track (reference: tools/convert2fbx.py CLI)."""
    from romp_tpu.tools.export_motion import main

    seqs = {1: {"smpl_thetas": np.zeros((5, 72), np.float32),
                "cam_trans": np.zeros((5, 3), np.float32)},
            2: {"smpl_thetas": np.zeros((3, 72), np.float32)}}
    npz = str(tmp_path / "video_results.npz")
    np.savez_compressed(npz, sequence_results=seqs)
    out = str(tmp_path / "bvh")
    assert main(["-i", npz, "-o", out, "--frame_rate", "24"]) == 0
    assert osp.exists(osp.join(out, "track_1.bvh"))
    assert osp.exists(osp.join(out, "track_2.bvh"))
    text = open(osp.join(out, "track_1.bvh")).read()
    assert "HIERARCHY" in text and "Frames: 5" in text
