"""Tests for the ByteTrack-3D tracker, OneEuro smoothing, and renderer."""
import numpy as np

from romp_tpu.tracker.bytetrack3d import ByteTracker3D, assign
from romp_tpu.tracker.oneeuro import (
    OneEuroFilter, create_filter_bank, smooth_results,
)
from romp_tpu.vis.renderer import Sim3DR, setup_renderer
from romp_tpu.vis.compositor import rotate_view_weak_perspective


def test_assign_gating():
    cost = np.array([[1.0, 50.0], [50.0, 2.0]])
    m, ur, uc = assign(cost, thresh=10.0)
    assert sorted(map(tuple, m)) == [(0, 0), (1, 1)]
    cost = np.array([[100.0]])
    m, ur, uc = assign(cost, thresh=10.0)
    assert len(m) == 0 and list(ur) == [0] and list(uc) == [0]


def test_tracker_consistent_ids_across_frames():
    tr = ByteTracker3D(det_thresh=0.3, match_thresh=50.0)
    p1 = np.array([[10.0, 10, 5, 2], [100.0, 100, 20, 4]])
    p2 = p1 + np.array([[1.0, 1, 0, 0], [-1.0, 2, 0.5, 0]])
    scores = np.array([0.9, 0.8])

    ids1, inds1 = tr.update(p1, scores)
    assert sorted(ids1) == [1, 2]
    ids2, inds2 = tr.update(p2, scores)
    assert sorted(ids2) == [1, 2]
    # identity follows spatial proximity
    m1 = dict(zip(inds1, ids1))
    m2 = dict(zip(inds2, ids2))
    assert m1[0] == m2[0] and m1[1] == m2[1]


def test_tracker_handles_disappearance_and_low_conf():
    tr = ByteTracker3D(det_thresh=0.3, low_conf_det_thresh=0.05,
                       match_thresh=50.0, track_buffer=5)
    p = np.array([[10.0, 10, 5, 2]])
    ids, _ = tr.update(p, np.array([0.9]))
    ids, _ = tr.update(p, np.array([0.9]))
    assert ids == [1]
    # low-confidence detection still associates to the existing track
    ids, _ = tr.update(p + 0.5, np.array([0.1]))
    assert ids == [1]
    # disappearance: no detections -> no output, track kept as lost
    ids, _ = tr.update(np.zeros((0, 4)), np.zeros((0,)))
    assert ids == []
    ids, _ = tr.update(p + 1.0, np.array([0.9]))
    assert ids == [1]  # re-found, same identity


def test_tracker_new_person_gets_new_id():
    tr = ByteTracker3D(det_thresh=0.3, match_thresh=20.0)
    ids, _ = tr.update(np.array([[0.0, 0, 0, 1]]), np.array([0.9]))
    ids, _ = tr.update(
        np.array([[0.0, 0, 0, 1], [500.0, 500, 50, 2]]),
        np.array([0.9, 0.9]))
    ids, _ = tr.update(
        np.array([[0.0, 0, 0, 1], [500.0, 500, 50, 2]]),
        np.array([0.9, 0.9]))
    assert sorted(ids) == [1, 2]


def test_oneeuro_smooths_noise():
    rng = np.random.RandomState(0)
    f = OneEuroFilter(mincutoff=1.0, beta=0.0)
    signal = np.sin(np.linspace(0, 2 * np.pi, 120))
    noisy = signal + rng.randn(120) * 0.2
    out = np.array([f.process(np.array([v]))[0] for v in noisy])
    assert np.abs(out[30:] - signal[30:]).mean() < \
        np.abs(noisy[30:] - signal[30:]).mean()


def test_smooth_results_shapes():
    bank = create_filter_bank(3.0)
    th = np.random.RandomState(1).randn(72).astype(np.float32) * 0.3
    be = np.random.RandomState(2).randn(10).astype(np.float32)
    cam = np.array([1.0, 0.1, -0.1], np.float32)
    for _ in range(3):
        th2, be2, cam2 = smooth_results(bank, th, be, cam)
    assert th2.shape == (72,) and be2.shape == (10,) and cam2.shape == (3,)
    assert np.isfinite(th2).all()


def test_renderer_native_builds_and_draws():
    r = setup_renderer("sim3dr")
    img = np.zeros((64, 64, 3), np.uint8)
    verts = np.array([[[10, 10, 1], [50, 10, 1], [30, 50, 1]]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    out = r.render(verts, faces, img)
    assert out.shape == img.shape
    assert out[25, 30].sum() > 0      # inside the triangle: painted
    assert out[5, 5].sum() == 0       # outside: untouched


def test_renderer_depth_test():
    r = Sim3DR(alpha=1.0)
    img = np.zeros((64, 64, 3), np.uint8)
    # two overlapping triangles; the z=5 one must win over z=1
    verts = np.array([
        [[0, 0, 1], [63, 0, 1], [32, 63, 1]],
        [[0, 0, 5], [63, 0, 5], [32, 63, 5]],
    ], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    colors = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    out = r.render(verts, faces, img, colors)
    px = out[10, 32].astype(float)
    assert px[1] > px[0], "nearer (green) triangle should win depth test"


def test_native_and_numpy_rasterizers_agree():
    rn = Sim3DR(alpha=1.0)
    if rn._lib is None:
        import pytest
        pytest.skip("native rasterizer unavailable")
    rf = Sim3DR(alpha=1.0)
    rf._lib = None
    img = np.zeros((48, 48, 3), np.uint8)
    rng = np.random.RandomState(3)
    verts = np.concatenate([rng.rand(1, 12, 2) * 48, rng.rand(1, 12, 1)], -1
                           ).astype(np.float32)
    faces = rng.randint(0, 12, (8, 3)).astype(np.int32)
    a = rn.render(verts, faces, img)
    b = rf.render(verts, faces, img)
    agree = (np.abs(a.astype(int) - b.astype(int)) <= 2).mean()
    assert agree > 0.97, f"rasterizers agree on only {agree:.3f} of pixels"


def test_rotate_view_fits_viewport():
    rng = np.random.RandomState(4)
    verts = rng.randn(2, 100, 3).astype(np.float32) + np.array([0, 0, 5])
    v = rotate_view_weak_perspective(verts, rx=90, ry=0, img_shape=(256, 256))
    assert v[..., 0].min() >= 0 and v[..., 0].max() <= 256
    assert v[..., 1].min() >= 0 and v[..., 1].max() <= 256
