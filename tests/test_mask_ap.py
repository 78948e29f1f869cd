"""Tests for the crowdpose-api port: RLE mask ops + OKS keypoint AP."""
import numpy as np

from romp_tpu.eval.mask_rle import (
    area, decode, encode, iou_boxes, iou_masks, merge, to_bbox,
    toCompressed, frUncompressed,
)
from romp_tpu.eval.keypoint_ap import (
    CROWDPOSE_SIGMAS, crowdpose_keypoint_eval, evaluate_ap, oks_iou,
)


def _rect_mask(H, W, y0, x0, h, w):
    m = np.zeros((H, W), np.uint8)
    m[y0:y0 + h, x0:x0 + w] = 1
    return m


def test_rle_roundtrip_area_bbox():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(13, 17) > 0.6).astype(np.uint8)
        r = encode(m)
        np.testing.assert_array_equal(decode(r), m)
        assert area(r) == int(m.sum())
    m = _rect_mask(20, 30, 4, 6, 5, 10)
    np.testing.assert_allclose(to_bbox(encode(m)), [6, 4, 10, 5])
    # empty / full masks
    np.testing.assert_array_equal(decode(encode(np.zeros((4, 4), np.uint8))),
                                  np.zeros((4, 4)))
    np.testing.assert_array_equal(decode(encode(np.ones((4, 4), np.uint8))),
                                  np.ones((4, 4)))


def test_rle_compressed_codec_roundtrip():
    rng = np.random.RandomState(1)
    m = (rng.rand(25, 25) > 0.5).astype(np.uint8)
    r = encode(m)
    comp = toCompressed(r)
    assert isinstance(comp["counts"], bytes)
    back = frUncompressed(comp)
    np.testing.assert_array_equal(decode(back), m)


def test_mask_iou_hand_computed():
    a = encode(_rect_mask(10, 10, 0, 0, 4, 4))   # 16 px
    b = encode(_rect_mask(10, 10, 2, 2, 4, 4))   # overlap 2x2 = 4
    ious = iou_masks([a], [b], [0])
    np.testing.assert_allclose(ious[0, 0], 4 / (16 + 16 - 4), rtol=1e-9)
    # crowd GT: denominator is dt area only
    ious_c = iou_masks([a], [b], [1])
    np.testing.assert_allclose(ious_c[0, 0], 4 / 16, rtol=1e-9)
    u = merge([a, b])
    assert area(u) == 16 + 16 - 4
    i = merge([a, b], intersect=True)
    assert area(i) == 4


def test_bbox_iou_crowd():
    dt = np.array([[0, 0, 4, 4]])
    gt = np.array([[2, 2, 4, 4]])
    np.testing.assert_allclose(iou_boxes(dt, gt, [0])[0, 0], 4 / 28)
    np.testing.assert_allclose(iou_boxes(dt, gt, [1])[0, 0], 4 / 16)


def test_oks_perfect_match_is_one():
    rng = np.random.RandomState(2)
    g = np.concatenate([rng.rand(14, 2) * 100, np.ones((14, 1)) * 2], -1)
    ious = oks_iou(g[None], np.array([900.0]), g[None, :, :],
                   CROWDPOSE_SIGMAS)
    np.testing.assert_allclose(ious[0, 0], 1.0, atol=1e-9)


def test_evaluate_ap_hand_computed():
    """1 image, 2 GT; det A matches one GT perfectly, det B matches nothing:
    precision envelope = [1.0 up to recall 0.5, 0 after] -> AP = 51/101."""
    per_image = [{
        "ious": np.array([[1.0, 0.0], [0.0, 0.0]]),
        "dt_scores": np.array([0.9, 0.8]),
        "gt_ignore": np.zeros(2, bool),
    }]
    r = evaluate_ap(per_image)
    np.testing.assert_allclose(r["AP"], 51 / 101, rtol=1e-9)
    np.testing.assert_allclose(r["AP50"], 51 / 101, rtol=1e-9)
    np.testing.assert_allclose(r["AR"], 0.5, rtol=1e-9)

    # both matched -> AP = 1
    per_image2 = [{
        "ious": np.eye(2),
        "dt_scores": np.array([0.9, 0.8]),
        "gt_ignore": np.zeros(2, bool),
    }]
    np.testing.assert_allclose(evaluate_ap(per_image2)["AP"], 1.0)


def test_crowdpose_protocol_end_to_end():
    rng = np.random.RandomState(3)
    kp = np.concatenate([rng.rand(14, 2) * 200, np.full((14, 1), 2.0)], -1)
    gt_doc = {
        "images": [{"id": 1, "crowdIndex": 0.05},
                   {"id": 2, "crowdIndex": 0.9}],
        "annotations": [
            {"image_id": 1, "keypoints": kp.flatten().tolist(),
             "bbox": [0, 0, 200, 200], "area": 40000},
            {"image_id": 2, "keypoints": kp.flatten().tolist(),
             "bbox": [0, 0, 200, 200], "area": 40000},
        ],
    }
    dts = [
        {"image_id": 1, "keypoints": kp.flatten().tolist(), "score": 0.9},
        {"image_id": 2, "keypoints": (kp + 500).flatten().tolist(),
         "score": 0.8},  # way off
    ]
    out = crowdpose_keypoint_eval(gt_doc, dts)
    np.testing.assert_allclose(out["AP_easy"], 1.0)        # perfect match
    assert out["AP_hard"] < 0.01                           # missed
    assert 0.0 < out["AP"] < 1.0


def test_crowdpose_eval_counts_fps_on_gtless_images():
    """Detections on images with NO GT annotations must pool as false
    positives (ADVICE r2: previously silently dropped)."""
    rng = np.random.RandomState(4)
    kp = np.concatenate([rng.rand(14, 2) * 200, np.full((14, 1), 2.0)], -1)
    gt_doc = {
        "images": [{"id": 1, "crowdIndex": 0.05},
                   {"id": 2, "crowdIndex": 0.05}],
        "annotations": [
            {"image_id": 1, "keypoints": kp.flatten().tolist(),
             "bbox": [0, 0, 200, 200], "area": 40000},
        ],
    }
    dt_clean = [
        {"image_id": 1, "keypoints": kp.flatten().tolist(), "score": 0.9},
    ]
    # a HIGHER-scored stray detection on the GT-less image 2
    dt_stray = dt_clean + [
        {"image_id": 2, "keypoints": kp.flatten().tolist(), "score": 0.95},
    ]
    clean = crowdpose_keypoint_eval(gt_doc, dt_clean)
    stray = crowdpose_keypoint_eval(gt_doc, dt_stray)
    np.testing.assert_allclose(clean["AP"], 1.0)
    assert stray["AP"] < clean["AP"]  # FP ahead of the TP depresses AP
