"""MOT metric sanity: perfect tracking scores 1.0; known degradations."""
import numpy as np

from romp_tpu.eval.mot_metrics import (
    clear_mot, evaluate_tracking, hota, id_f1,
)


def _make_tracks(T=10, n=2, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    gt, pred = {}, {}
    base = np.array([[0.0, 0.0, 3.0], [2.0, 0.0, 5.0]])[:n]
    for f in range(T):
        pos = base + np.array([0.05, 0.0, 0.0]) * f
        gt[f] = (np.arange(1, n + 1), pos.copy())
        pred[f] = (np.arange(1, n + 1) + 10,
                   pos + rng.randn(n, 3) * noise)
    return gt, pred


def test_perfect_tracking_scores_one():
    gt, pred = _make_tracks()
    out = evaluate_tracking(gt, pred)
    assert out["mota"] == 1.0
    assert out["idf1"] == 1.0
    assert out["hota"] > 0.99
    assert out["idsw"] == 0


def test_id_switch_hurts_idf1_but_not_detection():
    gt, pred = _make_tracks()
    # swap predicted ids at frame 5 onwards
    for f in range(5, 10):
        ids, pos = pred[f]
        pred[f] = (ids[::-1].copy(), pos)
    out = evaluate_tracking(gt, pred)
    assert out["mota"] < 1.0           # idsw penalized
    assert out["idsw"] == 2
    assert out["idf1"] == 0.5          # half the frames matched per id
    assert out["deta"] > 0.99          # detection untouched
    assert out["assa"] < 0.6


def test_missed_detections_lower_mota():
    gt, pred = _make_tracks()
    for f in range(4):
        ids, pos = pred[f]
        pred[f] = (ids[:1], pos[:1])   # drop person 2 in 4 frames
    out = clear_mot(gt, pred)
    assert out["fn"] == 4
    np.testing.assert_allclose(out["mota"], 1.0 - 4 / 20)


def test_false_positives_penalized():
    gt, pred = _make_tracks(n=1)
    for f in pred:
        ids, pos = pred[f]
        pred[f] = (np.array([11, 99]),
                   np.concatenate([pos, pos + 50.0]))
    out = clear_mot(gt, pred)
    assert out["fp"] == 10
    idm = id_f1(gt, pred)
    assert idm["idfp"] == 10


def test_hota_alpha_sensitivity_to_noise():
    gt, clean = _make_tracks(noise=0.0)
    _, noisy = _make_tracks(noise=0.3, seed=1)
    h_clean = hota(gt, clean)["hota"]
    h_noisy = hota(gt, noisy)["hota"]
    assert h_clean > h_noisy


def test_track_bbox_iou_hand_computed():
    from romp_tpu.eval.mot_metrics import track_bbox_iou

    # identical 2-frame tracks -> 1.0
    t = {0: np.array([0, 0, 4, 4.0]), 1: np.array([1, 1, 4, 4.0])}
    assert track_bbox_iou(t, t) == 1.0
    # dt misses frame 1: intersect=16, union=16+16 -> 0.5
    d = {0: np.array([0, 0, 4, 4.0])}
    np.testing.assert_allclose(track_bbox_iou(d, t), 16 / 32)
    # spatial half-overlap single frame
    d2 = {0: np.array([2, 0, 4, 4.0])}
    g2 = {0: np.array([0, 0, 4, 4.0])}
    np.testing.assert_allclose(track_bbox_iou(d2, g2), 8 / 24)


def test_track_map_perfect_and_partial():
    from romp_tpu.eval.mot_metrics import track_map

    gt = {1: {f: np.array([0, 0, 50, 50.0]) for f in range(5)},
          2: {f: np.array([100, 100, 50, 50.0]) for f in range(20)}}
    # perfect detections
    seq_perfect = {"gt_tracks": gt, "dt_tracks": dict(gt),
                   "dt_scores": {1: 0.9, 2: 0.8}}
    out = track_map([seq_perfect])
    np.testing.assert_allclose(out["TrackAP"], 1.0)
    # time subsets: track 1 has 5 frames (time_m), track 2 has 20 (time_l)
    np.testing.assert_allclose(out["TrackAP_time_m"], 1.0)
    np.testing.assert_allclose(out["TrackAP_time_l"], 1.0)

    # one track missed entirely -> AP = 51/101 (COCO interpolation)
    seq_half = {"gt_tracks": gt, "dt_tracks": {1: gt[1]},
                "dt_scores": {1: 0.9}}
    out2 = track_map([seq_half])
    np.testing.assert_allclose(out2["TrackAP"], 51 / 101, rtol=1e-9)
