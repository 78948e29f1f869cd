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
