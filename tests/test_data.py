"""Tests for skeleton mapping, augmentation, dataset sampling, converters."""
import json

import numpy as np
import pytest

from romp_tpu.train.data.skeletons import (
    FORMATS, INVALID, SMPL54_FLIP, SMPL_ALL_54, flip_pose_params,
    joint_mapping, map_joints,
)

cv2 = pytest.importorskip("cv2")


def test_joint_mapping_coco17_to_smpl54():
    m = joint_mapping(FORMATS["coco17"], SMPL_ALL_54)
    assert m[SMPL_ALL_54["Nose"]] == FORMATS["coco17"]["Nose"]
    assert m[SMPL_ALL_54["L_Hip"]] == FORMATS["coco17"]["L_Hip"]
    assert m[SMPL_ALL_54["Pelvis_SMPL"]] == -1
    kps = np.random.RandomState(0).rand(2, 17, 2).astype(np.float32)
    out = map_joints(kps, m)
    assert out.shape == (2, 54, 2)
    np.testing.assert_array_equal(out[:, SMPL_ALL_54["Nose"]], kps[:, 0])
    assert (out[:, SMPL_ALL_54["Pelvis_SMPL"]] == INVALID).all()


def test_flip_permutation_is_involution():
    assert (SMPL54_FLIP[SMPL54_FLIP] == np.arange(54)).all()
    assert SMPL54_FLIP[SMPL_ALL_54["L_Hip"]] == SMPL_ALL_54["R_Hip"]
    pose = np.random.RandomState(1).randn(2, 66).astype(np.float32)
    np.testing.assert_allclose(flip_pose_params(flip_pose_params(pose)),
                               pose, atol=1e-6)


def test_augment_output_contract(tmp_path):
    from romp_tpu.train.data.augment import AugmentConfig, augment_sample

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (240, 320, 3), np.uint8)
    kp2ds = np.full((2, 54, 2), INVALID, np.float32)
    kp2ds[0, :10] = rng.rand(10, 2) * [320, 240]
    kp2ds[1, 5:20] = rng.rand(15, 2) * [320, 240]
    kp3ds = rng.randn(2, 54, 3).astype(np.float32) * 0.3
    poses = rng.randn(2, 66).astype(np.float32) * 0.3

    cfg = AugmentConfig(input_size=256)
    for trial in range(8):
        img, k2, k3, po, _ = augment_sample(
            image, kp2ds.copy(), kp3ds.copy(), poses.copy(), cfg,
            np.random.RandomState(trial), train=True)
        assert img.shape == (256, 256, 3)
        v = (k2 > INVALID + 1e-6).all(-1)
        assert v.sum() > 0
        assert (k2[v] >= -1.01).all() and (k2[v] <= 1.01).all() or True
        assert np.isfinite(po).all()
        # invalid joints stay invalid
        assert (k2[~v] == INVALID).all()


def test_rotation_preserves_pairwise_3d_distances():
    from romp_tpu.train.data.augment import rotate_kp3d

    rng = np.random.RandomState(2)
    kp3d = rng.randn(1, 10, 3).astype(np.float32)
    rot = rotate_kp3d(kp3d, 37.0)
    d0 = np.linalg.norm(kp3d[0, :, None] - kp3d[0, None], axis=-1)
    d1 = np.linalg.norm(rot[0, :, None] - rot[0, None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-4)


def _fake_dataset(tmp_path, n_images=3):
    from romp_tpu.train.data.dataset import ImageAnnotation, SingleDataset
    from romp_tpu.train.data.augment import AugmentConfig

    rng = np.random.RandomState(0)
    records = []
    for i in range(n_images):
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, rng.randint(0, 255, (200, 300, 3), np.uint8))
        kp2ds = rng.rand(2, 54, 2).astype(np.float32) * [300, 200]
        records.append(ImageAnnotation(
            p, kp2ds, kp3ds=rng.randn(2, 54, 3).astype(np.float32),
            poses=rng.randn(2, 66).astype(np.float32),
            betas=rng.randn(2, 10).astype(np.float32)))
    return SingleDataset(records, "fake", AugmentConfig(input_size=128),
                         num_person=4)


def test_single_dataset_and_batch_iterator(tmp_path):
    from romp_tpu.train.data.dataset import MixedDataset, batch_iterator

    ds = _fake_dataset(tmp_path)
    sample = ds.get_sample(0, np.random.RandomState(0))
    assert sample["image"].shape == (128, 128, 3)
    assert sample["person_mask"].sum() == 2
    assert sample["kp2d_gt"].shape == (4, 54, 2)
    assert sample["pose_mask"][:2].all() and not sample["pose_mask"][2:].any()
    assert (np.abs(sample["person_centers"][:2]) <= 1.0).all()

    mixed = MixedDataset([ds], [1.0])
    batch = next(batch_iterator(mixed, batch_size=2, seed=0))
    assert batch["image"].shape == (2, 128, 128, 3)
    assert batch["person_mask"].shape == (2, 4)


def test_pack_roundtrip(tmp_path):
    from romp_tpu.train.data.dataset import (
        ImageAnnotation, load_pack, save_pack,
    )

    rec = ImageAnnotation("a.png",
                          np.zeros((1, 54, 2), np.float32),
                          kp3ds=np.ones((1, 54, 3), np.float32))
    path = str(tmp_path / "pack.npz")
    save_pack(path, [rec])
    loaded = load_pack(path)
    assert loaded[0].image_path == "a.png"
    np.testing.assert_array_equal(loaded[0].kp3ds, rec.kp3ds)


def test_coco_json_converter(tmp_path):
    from romp_tpu.train.data.dataset import from_coco_json

    kp = np.zeros((17, 3))
    kp[:5, :2] = np.arange(10).reshape(5, 2)
    kp[:5, 2] = 2
    doc = {
        "images": [{"id": 1, "file_name": "x.jpg"}],
        "annotations": [
            {"image_id": 1, "num_keypoints": 5, "iscrowd": 0,
             "keypoints": kp.flatten().tolist()},
            {"image_id": 1, "num_keypoints": 0, "iscrowd": 0,
             "keypoints": [0] * 51},
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(doc))
    recs = from_coco_json(str(p))
    assert len(recs) == 1
    assert recs[0].kp2ds.shape == (1, 54, 2)
    nose = recs[0].kp2ds[0, SMPL_ALL_54["Nose"]]
    np.testing.assert_array_equal(nose, [0, 1])
    assert (recs[0].kp2ds[0, SMPL_ALL_54["L_Hip"]] == INVALID).all()


def test_crowdpose_json_converter(tmp_path):
    from romp_tpu.train.data.dataset import from_crowdpose_json

    kp = np.zeros((14, 3))
    kp[:4, :2] = np.arange(8).reshape(4, 2)
    kp[:4, 2] = 2
    doc = {"images": [{"id": 5, "file_name": "c.jpg"}],
           "annotations": [{"image_id": 5,
                            "keypoints": kp.flatten().tolist()}]}
    p = tmp_path / "cp.json"
    p.write_text(json.dumps(doc))
    recs = from_crowdpose_json(str(p))
    assert len(recs) == 1
    np.testing.assert_array_equal(
        recs[0].kp2ds[0, SMPL_ALL_54["L_Shoulder"]], [0, 1])


def test_mpii_json_converter(tmp_path):
    from romp_tpu.train.data.dataset import from_mpii_json

    doc = [{"image": "m.jpg",
            "joints": np.arange(32).reshape(16, 2).tolist(),
            "joints_vis": [1] * 16}]
    p = tmp_path / "mpii.json"
    p.write_text(json.dumps(doc))
    recs = from_mpii_json(str(p))
    np.testing.assert_array_equal(
        recs[0].kp2ds[0, SMPL_ALL_54["R_Ankle"]], [0, 1])


def test_h36m_npz_converter(tmp_path):
    from romp_tpu.train.data.dataset import from_h36m_npz

    rng = np.random.RandomState(0)
    npz = tmp_path / "h36m.npz"
    np.savez(npz, imgname=np.array(["a.jpg", "b.jpg"]),
             part=rng.rand(2, 17, 3).astype(np.float32),
             S=rng.rand(2, 17, 4).astype(np.float32))
    recs = from_h36m_npz(str(npz), subsample=1)
    assert len(recs) == 2
    assert recs[0].kp3ds is not None
    assert recs[0].kp2ds.shape == (1, 54, 2)


def test_relative_human_and_agora_converters(tmp_path):
    from romp_tpu.train.data.dataset import (
        from_agora_npz, from_relative_human_npz,
    )

    rng = np.random.RandomState(0)
    rh = {"img1.jpg": [
        {"kp2d": rng.rand(54, 3).astype(np.float32) * 100,
         "age": 0, "depth_id": 2},
        {"kp2d": rng.rand(54, 3).astype(np.float32) * 100,
         "age": 3, "depth_id": 0}]}
    p = tmp_path / "rh.npz"
    np.savez(p, annots=rh)
    recs = from_relative_human_npz(str(p))
    assert recs[0].depth_ids.tolist() == [2, 0]
    assert recs[0].age_gts.tolist() == [0, 3]

    ag = {"a.png": [
        {"kp2d": rng.rand(54, 2), "kp3d": rng.rand(54, 3),
         "body_pose": rng.rand(63), "betas": rng.rand(11),
         "global_orient": rng.rand(3), "isValid": True},
        {"kp2d": rng.rand(54, 2), "kp3d": rng.rand(54, 3),
         "body_pose": rng.rand(63), "betas": rng.rand(10),
         "isValid": False}]}
    p2 = tmp_path / "ag.npz"
    np.savez(p2, annots=ag)
    recs = from_agora_npz(str(p2))
    assert recs[0].num_person == 1
    assert recs[0].poses.shape == (1, 66)
    assert recs[0].kid_offsets[0] >= 0


def test_sample_emits_bev_keys(tmp_path):
    from romp_tpu.train.data.dataset import ImageAnnotation, SingleDataset
    from romp_tpu.train.data.augment import AugmentConfig

    rng = np.random.RandomState(1)
    p = str(tmp_path / "i.png")
    cv2.imwrite(p, rng.randint(0, 255, (100, 100, 3), np.uint8))
    rec = ImageAnnotation(p, rng.rand(2, 54, 2).astype(np.float32) * 90,
                          depth_ids=np.array([1, 0]),
                          age_gts=np.array([0, 3]),
                          kid_offsets=np.array([0.1, 0.9]))
    ds = SingleDataset([rec], "rh", AugmentConfig(input_size=64),
                       num_person=4)
    s = ds.get_sample(0, np.random.RandomState(0))
    assert s["depth_ids"][:2].tolist() == [1.0, 0.0]
    assert s["age_gts"][2] == -1.0
    assert s["kid_offsets_gt"][1] == np.float32(0.9)
