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
