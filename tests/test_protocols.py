"""Official-protocol eval drivers on synthetic reference-format fixtures."""
import os.path as osp
import pickle

import numpy as np
import pytest


# ------------------------------------------------------------------ 3DPW --

def _make_pw3d_fixture(tmp_path, jitter=0.0, rot_jitter=0.0):
    """Write official-layout GT + prediction pkls using the synthetic SMPL
    as the GT body model; predictions = GT (+ optional jitter)."""
    import jax.numpy as jnp

    from romp_tpu.eval.protocols import make_gt_smpl_fn, pw3d_apply_camera
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    rng = np.random.RandomState(0)
    model = SmplModel.from_assets(synthetic_assets(seed=0))
    models = {"f": model, "m": model, "n": model}
    smpl_fn = make_gt_smpl_fn(models)

    N, P = 6, 2
    poses = rng.randn(P, N, 72).astype(np.float32) * 0.1
    betas = rng.randn(P, 10).astype(np.float32) * 0.3
    trans = rng.randn(P, N, 3).astype(np.float32)
    cam = np.tile(np.eye(4, dtype=np.float32)[None], (N, 1, 1))
    th = 0.3
    cam[:, :3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                               [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    cam[:, :3, 3] = [0.1, -0.2, 4.0]
    poses2d = np.ones((P, N, 18, 3), np.float32)
    poses2d[:, -1] = 0.0                      # last frame invalid (no 2D)
    campose_valid = np.ones((P, N), np.float32)
    campose_valid[:, 0] = 0.0                 # first frame invalid campose

    gt = {"genders": ["f", "m"], "poses2d": list(poses2d),
          "campose_valid": list(campose_valid), "poses": poses,
          "betas": list(betas), "trans": trans, "cam_poses": cam}

    jps, rots = [], []
    for i in range(P):
        j24, glob = smpl_fn(gt["genders"][i], poses[i],
                            np.tile(betas[i][None], (N, 1)), trans[i])
        j24, glob = pw3d_apply_camera(j24, glob, cam)
        jps.append(j24)
        rots.append(glob)
    from romp_tpu.eval.protocols import PW3D_OR_JOINTS
    pred = {
        "jointPositions": np.stack(jps).reshape(P, N, 72) + jitter,
        "orientations": np.stack(rots)[:, :, PW3D_OR_JOINTS],
    }
    if rot_jitter:
        from romp_tpu.ops.rotations import axis_angle_to_matrix
        aa = np.zeros((1, 3), np.float32)
        aa[0, 0] = rot_jitter
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))[0]
        pred["orientations"] = np.einsum(
            "ij,pnkjl->pnkil", R, pred["orientations"])

    for split in ("train", "validation", "test"):
        (tmp_path / "truth" / split).mkdir(parents=True, exist_ok=True)
        (tmp_path / "submit" / split).mkdir(parents=True, exist_ok=True)
    with open(tmp_path / "truth" / "test" / "seq0.pkl", "wb") as f:
        pickle.dump(gt, f)
    with open(tmp_path / "submit" / "test" / "seq0.pkl", "wb") as f:
        pickle.dump(pred, f)
    return smpl_fn


def test_pw3d_perfect_predictions_score_zero(tmp_path):
    from romp_tpu.eval.protocols import pw3d_evaluate

    smpl_fn = _make_pw3d_fixture(tmp_path)
    out = pw3d_evaluate(str(tmp_path / "submit"), str(tmp_path / "truth"),
                        smpl_fn)
    assert out["MPJPE"] < 1e-3 and out["MPJPE_PA"] < 1e-3
    assert out["PCK"] == 100.0
    assert out["AUC"] > 0.99
    assert out["MPJAE"] < 1e-2 and out["MPJAE_PA"] < 1e-2


def test_pw3d_jitter_and_rotation_error_measured(tmp_path):
    from romp_tpu.eval.protocols import pw3d_evaluate

    # constant 10cm x-offset on every joint: removed by root alignment
    smpl_fn = _make_pw3d_fixture(tmp_path, jitter=0.1, rot_jitter=0.2)
    out = pw3d_evaluate(str(tmp_path / "submit"), str(tmp_path / "truth"),
                        smpl_fn)
    assert out["MPJPE"] < 1e-3            # uniform offset cancels
    # 0.2 rad global premultiplied rotation -> 0.2 rad on every joint
    np.testing.assert_allclose(out["MPJAE"], np.degrees(0.2), atol=0.05)


def test_pw3d_valid_frame_selection():
    from romp_tpu.eval.protocols import pw3d_valid_indices

    poses2d = np.ones((5, 18, 3))
    poses2d[2] = 0.0
    campose_valid = np.array([0, 1, 1, 1, 1.0])
    np.testing.assert_array_equal(
        pw3d_valid_indices(poses2d, campose_valid), [1, 3, 4])


def test_similarity_align_recovers_srt():
    from romp_tpu.eval.protocols import similarity_align_batch

    rng = np.random.RandomState(3)
    gt = rng.randn(4, 24, 3)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    pred = 0.5 * gt @ R.T + np.array([1.0, -2.0, 3.0])
    aligned, _ = similarity_align_batch(pred, gt)
    np.testing.assert_allclose(aligned, gt, atol=1e-8)
    # all-zero fallback: gt centroid
    z = np.zeros_like(gt[:1])
    a0, R0 = similarity_align_batch(z, gt[:1])
    np.testing.assert_allclose(a0[0], np.tile(gt[:1].mean(1), (24, 1)))
    np.testing.assert_allclose(R0[0], np.eye(3))


# -------------------------------------------------------- Relative Human --

def _rh_fixture():
    """2 images x 2-3 persons in the official annots/results layouts."""
    rng = np.random.RandomState(1)
    annots, results = {}, {}
    for n, img in enumerate(["img_a.jpg", "1234567.jpg"]):
        per = []
        res = []
        for i in range(3):
            kp = np.zeros((14, 3))
            kp[:, 0] = rng.rand(14) * 50 + 200 * i
            kp[:, 1] = rng.rand(14) * 100
            kp[:, 2] = 1.0
            per.append({"bbox": [200 * i, 0, 50, 100], "kp2d": kp,
                        "depth_id": i, "age": i % 4})
            res.append({"kp2ds": kp[:, :2].copy(),
                        "trans": np.array([0.0, 0.0, 1.0 + i])})
        annots[img] = per
        results[img] = res
    return annots, results


def test_rh_perfect_predictions():
    from romp_tpu.eval.protocols import rh_evaluate

    annots, results = _rh_fixture()
    out = rh_evaluate(results, annots)
    assert out["f1"] == 1.0 and out["precision"] == 1.0
    assert out["mPCKh"] == 1.0
    # depths strictly increasing with depth_id -> all cd/fd pairs correct
    assert out["PCRD_0.2"] == 1.0
    for age in ("adult", "teen", "kid"):
        assert out[f"PCRD_0.2_{age}"] == 1.0


def test_rh_missed_person_accounting():
    from romp_tpu.eval.protocols import rh_evaluate

    annots, results = _rh_fixture()
    # drop the last person from every image's predictions
    results = {k: v[:2] for k, v in results.items()}
    out = rh_evaluate(results, annots)
    # reference accounting quirk (evaluation.py:90-99): tp is computed as
    # n_predictions - n_misses (4 preds, 2 missed GTs -> tp = 2), so
    # recall = 2 / (2 + 2) = 0.5, not the naive 4/6.
    assert out["recall"] == 0.5
    assert out["precision"] == 1.0
    # 2 images x 1 pair (persons 0, 1 with depth 1 vs 2 -> cd correct);
    # 2 missed persons x 0.3 fine in the denominator
    np.testing.assert_allclose(out["PCRD_0.2"], 2 / (2 + 2 * 0.3))


def test_rh_19joint_mapping_roundtrip():
    from romp_tpu.eval.protocols import (
        BK_19, CROWDPOSE_14, joint_mapping,
    )

    m = joint_mapping(BK_19, CROWDPOSE_14)
    assert m[CROWDPOSE_14["L_Shoulder"]] == BK_19["L_Shoulder"]
    assert m[CROWDPOSE_14["Neck_LSP"]] == -1      # BK has no LSP neck


def test_rh_npz_roundtrip(tmp_path):
    from romp_tpu.eval.protocols import (
        rh_evaluate, rh_load, rh_load_results, rh_save_results,
    )

    annots, results = _rh_fixture()
    np.savez(tmp_path / "val_annots.npz", annots=annots)
    rh_save_results(str(tmp_path / "val_results.npz"), results)
    out = rh_evaluate(rh_load_results(str(tmp_path / "val_results.npz")),
                      rh_load(str(tmp_path / "val_annots.npz")))
    assert out["f1"] == 1.0


# ---------------------------------------------------------------- MuPoTS --

def test_mupots_match_2d_hungarian_with_limit():
    from romp_tpu.eval.protocols import mupots_match_2d

    gt = np.zeros((2, 2, 17))
    gt[1] += 50.0
    pred = np.zeros((3, 2, 17))
    pred[0] += 50.5          # near gt 1
    pred[1] += 0.5           # near gt 0
    pred[2] += 1000.0        # garbage
    m = mupots_match_2d(gt, pred, thresh=100.0)
    np.testing.assert_array_equal(m, [1, 0])
    # over the cost limit -> unmatched
    m2 = mupots_match_2d(gt, pred[2:], thresh=100.0)
    np.testing.assert_array_equal(m2, [-1, -1])


def test_mupots_match_3d_procrustes_invariant():
    from romp_tpu.eval.protocols import mupots_match_3d

    rng = np.random.RandomState(5)
    g1 = rng.randn(3, 17) * 100
    g2 = rng.randn(3, 17) * 100
    th = 0.4
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    # predictions are rotated/scaled/translated copies -> Procrustes exact
    p1 = 1.3 * R @ g1 + np.array([[10.], [20.], [30.]])
    p2 = 0.8 * R @ g2 + 5.0
    m = mupots_match_3d([g1, g2], [p2, p1])
    assert m == [1, 0]
    # a prediction matching nothing within threshold
    m2 = mupots_match_3d([g1], [g1 + rng.randn(3, 17) * 500], threshold=50)
    assert m2 == [-1]


def test_mupots_bone_length_norm():
    from romp_tpu.eval.protocols import norm_by_bone_length

    gt = np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0]]).T   # (3, 3 joints)
    pred = np.array([[0.0, 0, 0], [2, 0, 0], [2, 3, 0]]).T
    # traversal: joint1 from joint0, joint2 from joint1
    out = norm_by_bone_length(pred, gt, parents=[0, 1], traversal=[1, 2])
    np.testing.assert_allclose(out[:, 1], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(out[:, 2], [1, 1, 0], atol=1e-12)


def test_mupots_pck_groups():
    from romp_tpu.eval.protocols import MUPOTS_ALL_JOINTS, mupots_pck

    # all errors 100mm -> PCK@150 = 1; all errors 180 -> PCK = 0
    errs_good = [np.full(17, 100.0) for _ in range(4)]
    errs_bad = [np.full(17, 180.0) for _ in range(4)]
    curves, pcks, aucs = mupots_pck([errs_good, errs_bad])
    assert pcks[0][-1] == 1.0 and pcks[1][-1] == 0.0
    assert len(curves[0]) == 9 and len(curves[0][0]) == 40
    # AUC for 100mm errors: thresholds 105..195 of 0..195 pass -> 19/40
    np.testing.assert_allclose(aucs[0][0], 19 / 40)
    assert len(MUPOTS_ALL_JOINTS) == 14


def test_pw3d_collector_roundtrip_scores_zero(tmp_path):
    """Full collect -> write -> official-evaluate loop on the fixture:
    feeding the GT back through the collector must score ~zero."""
    import pickle

    from romp_tpu.eval.protocols import (
        Pw3dSubmissionCollector, make_gt_smpl_fn, pw3d_evaluate,
    )
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    smpl_fn = _make_pw3d_fixture(tmp_path)
    # add img_frame_ids to the GT (the collector reads the official field)
    gt_path = tmp_path / "truth" / "test" / "seq0.pkl"
    gt = pickle.load(open(gt_path, "rb"), encoding="latin1")
    N = np.asarray(gt["poses"][0]).shape[0]
    gt["img_frame_ids"] = np.arange(N)
    pickle.dump(gt, open(gt_path, "wb"))

    from romp_tpu.eval.protocols import pw3d_apply_camera

    col = Pw3dSubmissionCollector(str(tmp_path / "truth"))
    assert col.layout["seq0"] == ("test", 2, N)
    for s, gender in enumerate(gt["genders"]):
        poses = np.asarray(gt["poses"])[s]
        betas = np.tile(np.asarray(gt["betas"][s])[None, :10], (N, 1))
        trans = np.asarray(gt["trans"])[s]
        j24, glob = smpl_fn(gender, poses, betas, trans)
        cams = np.asarray(gt["cam_poses"])
        j24, _ = pw3d_apply_camera(j24, glob, cams)
        # leave frame 2 missing -> exercised fill_empty
        for f in range(N):
            if f == 2:
                continue
            col.add("seq0", f, s, poses[f], betas[f], j24[f])
    col.write(str(tmp_path / "submit2"))

    out = pw3d_evaluate(str(tmp_path / "submit2"), str(tmp_path / "truth"),
                        smpl_fn)
    # frame 2 was filled from frame 1 -> small but bounded error; all other
    # frames exact. Orientation error: the collector writes MODEL-frame
    # global rotations while GT is camera-frame — identity camera here.
    assert out["MPJPE"] < 30.0
    assert out["MPJPE_PA"] < 30.0
    # 3 of 4 scored frames exact, 1 neighbour-filled with an uncorrelated
    # random pose -> PCK ~ 75% + a few filled joints inside 50mm
    assert out["PCK"] > 70.0


def test_pw3d_global_orientations_chain():
    from romp_tpu.eval.protocols import (
        PW3D_OR_JOINTS, pw3d_global_orientations,
    )

    # root-only rotation propagates to every selected joint
    pose = np.zeros(72)
    pose[:3] = [0, 0, np.pi / 2]
    rots = pw3d_global_orientations(pose)
    assert rots.shape == (9, 3, 3)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    for r in rots:
        np.testing.assert_allclose(r, expected, atol=1e-12)
    # L_Hip (joint 1) local rotation affects L_Hip + L_Knee entries only
    pose2 = np.zeros(72)
    pose2[3:6] = [0.3, 0, 0]
    rots2 = pw3d_global_orientations(pose2)
    sel = list(PW3D_OR_JOINTS)
    for i, j in enumerate(sel):
        if j in (1, 4):                     # L_Hip and its child L_Knee
            assert not np.allclose(rots2[i], np.eye(3))
        else:
            np.testing.assert_allclose(rots2[i], np.eye(3), atol=1e-12)


def test_mupots_evaluate_end_to_end():
    from romp_tpu.eval.protocols import mupots_evaluate

    rng = np.random.RandomState(0)
    F, P = 4, 2
    gt, preds = {}, {}
    for seq in ("TS1", "TS2"):
        kp3d = rng.randn(F, P, 17, 3) * 300
        kp2d = kp3d[..., :2] / 5.0 + 500
        gt[seq] = {"kp2ds": kp2d, "kp3ds": kp3d,
                   "valid": np.ones((F, P), bool)}
        frames = []
        for f in range(F):
            order = [1, 0]                     # shuffled detections
            frames.append({"kp2ds": kp2d[f][order],
                           "kp3ds": kp3d[f][order]})
        preds[seq] = frames
    out = mupots_evaluate(gt, preds)
    np.testing.assert_allclose(out["PCK"], 100.0)
    np.testing.assert_allclose(out["PCK_TS1"], 100.0)
    assert out["AUC"] > 95.0

    # degrade one sequence: 200mm offset on every joint of TS2 -> PCK@150
    # fails there, passes on TS1
    preds2 = {s: [{"kp2ds": fr["kp2ds"],
                   "kp3ds": fr["kp3ds"] + (200.0 if s == "TS2" else 0.0)
                   * np.array([1.0, 0, 0])}
                  for fr in frames_] for s, frames_ in preds.items()}
    out2 = mupots_evaluate(gt, preds2)
    np.testing.assert_allclose(out2["PCK_TS1"], 100.0)
    # offset is removed at the root... shift is GLOBAL so root-relative
    # cancels it; instead knock out detections entirely in TS2
    preds3 = dict(preds)
    preds3["TS2"] = [{"kp2ds": np.zeros((0, 17, 2)),
                      "kp3ds": np.zeros((0, 17, 3))} for _ in range(F)]
    out3 = mupots_evaluate(gt, preds3)
    np.testing.assert_allclose(out3["PCK_TS2"], 0.0)
    np.testing.assert_allclose(out3["PCK_TS1"], 100.0)
    np.testing.assert_allclose(out3["PCK"], 50.0)


def test_agora_submission_writer(tmp_path):
    import pickle

    from romp_tpu.eval.protocols import (
        AGORA_DEFAULT_K, agora_refine_translation, agora_save_predictions,
    )

    rng = np.random.RandomState(0)
    # translation recovery: project known joints with a known translation
    K = AGORA_DEFAULT_K
    t_true = np.array([[0.4, -0.2, 6.0], [-1.0, 0.5, 9.0]], np.float32)
    j3 = rng.randn(2, 24, 3).astype(np.float32) * 0.4
    cam = j3 + t_true[:, None]
    pj = cam[..., :2] / cam[..., 2:] * K[0, 0] + K[:2, 2]
    rec = agora_refine_translation(j3, pj, np.zeros((2, 3)), K)
    np.testing.assert_allclose(rec, t_true, atol=1e-2)

    outputs = {
        "smpl_thetas": rng.randn(2, 72).astype(np.float32),
        "smpl_betas": rng.randn(2, 11).astype(np.float32),
        "cam_trans": t_true,
        "joints": np.concatenate([j3 + t_true[:, None],
                                  np.zeros((2, 47, 3), np.float32)], 1),
        "pj2d_org": np.concatenate([pj, np.zeros((2, 47, 2))], 1),
    }
    files = agora_save_predictions(outputs, "/x/agora_img_001.png",
                                   str(tmp_path), cam_K=K)
    assert len(files) == 2
    assert files[0].endswith("agora_img_001_personId_0.pkl")
    d = pickle.load(open(files[0], "rb"))
    assert d["params"]["global_orient"].shape == (1, 1, 3)
    assert d["params"]["body_pose"].shape == (1, 23, 3)
    assert d["params"]["betas"].shape == (1, 11)
    assert d["num_betas"] == 11 and d["kid_flag"]
    assert d["joints"].shape == (24, 2)
    np.testing.assert_allclose(d["joints"], (pj[0] + 1) * 3.0, atol=1e-4)


def test_pw3d_apply_camera_is_rigid_transform():
    """pw3d_apply_camera must compute R @ x + t (world->camera), NOT the
    transposed rotation with dropped translation (ADVICE r2, high). Checked
    against a known rigid transform rather than round-tripping the helper."""
    from romp_tpu.eval.protocols import pw3d_apply_camera

    rng = np.random.RandomState(7)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    t = np.array([0.3, -1.2, 4.0])
    cam = np.tile(np.eye(4)[None], (2, 1, 1))
    cam[:, :3, :3] = R
    cam[:, :3, 3] = t
    joints = rng.randn(2, 24, 3)
    rots = np.tile(np.eye(3)[None, None], (2, 24, 1, 1))
    jc, rc = pw3d_apply_camera(joints, rots, cam)
    np.testing.assert_allclose(
        jc, np.einsum("ij,nkj->nki", R, joints) + t, atol=1e-12)
    np.testing.assert_allclose(rc, np.tile(R[None, None], (2, 24, 1, 1)),
                               atol=1e-12)


# ------------------------------------------------------------ CMU-Panoptic --

def _make_cmu_fixture(seed=0, n_imgs=3, n_person=2):
    rng = np.random.RandomState(seed)
    infos = []
    for i in range(n_imgs):
        kpts2d = np.zeros((n_person, 24, 3))
        kpts2d[..., :2] = rng.rand(n_person, 24, 2) * 700 + 50
        kpts2d[..., 2] = 1.0
        kpts3d = np.zeros((n_person, 24, 4))
        kpts3d[..., :3] = rng.randn(n_person, 24, 3) * 0.3
        kpts3d[..., 3] = 1.0
        infos.append({
            "filename": f"hdImgs/haggling_cam00-{i:08d}.png",
            "width": 832, "height": 512,
            "kpts2d": kpts2d, "kpts3d": kpts3d,
        })
    return infos


def _cmu_preds_from_annots(annots, jitter=0.0, seed=1):
    """Exact (or jittered) predictions in the H36M-17 layout the driver
    consumes."""
    from romp_tpu.eval.protocols import (
        CMU_PRED_H36M17_TO_J14, CMU_PRED_ROOT,
    )

    rng = np.random.RandomState(seed)
    results = {}
    for name, (kp2d, kp3d) in annots.items():
        N = len(kp2d)
        pj2d = np.zeros((N, 17, 2))
        j3d = np.zeros((N, 17, 3))
        pj2d[:, CMU_PRED_H36M17_TO_J14] = kp2d
        # driver subtracts pred joint 14; GT is already root(13)-subtracted
        j3d[:, CMU_PRED_H36M17_TO_J14] = kp3d - kp3d[:, [13]]
        j3d[:, CMU_PRED_ROOT] = 0.0
        if jitter:
            j3d = j3d + rng.randn(*j3d.shape) * jitter
        results[name] = [pj2d, j3d]
    return results


def test_cmu_panoptic_protocol_roundtrip():
    from romp_tpu.eval.protocols import (
        cmu_panoptic_convert_gts, cmu_panoptic_evaluate,
    )

    infos = _make_cmu_fixture()
    annots = cmu_panoptic_convert_gts(infos)
    assert len(annots) == 3
    name0 = next(iter(annots))
    assert "haggling" in name0
    kp2d, kp3d = annots[name0]
    assert kp2d.shape[1:] == (14, 2) and kp3d.shape[1:] == (14, 3)

    # GT root subtraction happens inside evaluate; feed exact preds
    exact = cmu_panoptic_evaluate(annots, _cmu_preds_from_annots(annots))
    assert exact["MPJPE"] < 1.5  # mm; the (0,.06,.03) offset is in both
    assert "MPJPE_haggling" in exact

    jit = cmu_panoptic_evaluate(
        annots, _cmu_preds_from_annots(annots, jitter=0.05))
    assert jit["MPJPE"] > exact["MPJPE"]

    # missing image -> 150 mm punishment per GT person
    missing = cmu_panoptic_evaluate(annots, {})
    np.testing.assert_allclose(missing["MPJPE"], 150.0)


def test_cmu_convert_visibility_gate():
    """Persons with <=5 in-frame joints are dropped (reference
    determine_visible_person)."""
    from romp_tpu.eval.protocols import cmu_panoptic_convert_gts

    infos = _make_cmu_fixture(n_imgs=1, n_person=2)
    # push person 1's 2D joints out of frame
    infos[0]["kpts2d"][1, :, 0] = -50.0
    annots = cmu_panoptic_convert_gts(infos)
    kp2d, kp3d = next(iter(annots.values()))
    assert len(kp2d) == 1


# ----------------------------------------------------------------- DynaCam --

def _rot_z(th):
    return np.array([[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])


def test_evaluate_ate_ape_alignment_invariance():
    from romp_tpu.eval.protocols import _aa_to_quat_wxyz, evaluate_ate_ape

    rng = np.random.RandomState(0)
    T = 12
    pos = np.cumsum(rng.randn(T, 3) * 0.1, axis=0)
    quat = np.stack([_aa_to_quat_wxyz(np.array([0.0, 0.0, 0.1 * t]))
                     for t in range(T)])
    ref = np.concatenate([pos, quat], 1)
    # est = similarity-transformed ref -> alignment nulls it
    R = _rot_z(0.8)
    pos_e = 1.7 * (R @ pos.T).T + np.array([2.0, -1.0, 0.5])
    quat_e = []
    for q in quat:
        from romp_tpu.eval.protocols import _quat_to_mat
        Rq = R @ _quat_to_mat(q)
        w = np.clip((np.trace(Rq) - 1) / 2, -1, 1)
        ang = np.arccos(w)
        ax = np.array([Rq[2, 1] - Rq[1, 2], Rq[0, 2] - Rq[2, 0],
                       Rq[1, 0] - Rq[0, 1]]) / (2 * np.sin(ang))
        quat_e.append(_aa_to_quat_wxyz(ax * ang))
    est = np.concatenate([pos_e, np.stack(quat_e)], 1)
    ate_s, ape_s = evaluate_ate_ape(est, ref, align=True)
    assert ate_s < 1e-6
    assert ape_s < 1e-6
    # unaligned is large
    ate_u, _ = evaluate_ate_ape(est, ref, align=False)
    assert ate_u > 0.5


def test_dynacam_protocol_roundtrip():
    from romp_tpu.eval.protocols import dynacam_evaluate

    rng = np.random.RandomState(3)
    F = 10
    trans = np.cumsum(rng.randn(F, 3) * 0.2, axis=0)
    grots = np.stack([[0.0, 0.0, 0.05 * t] for t in range(F)])
    ext = np.tile(np.eye(4)[None], (F, 1, 1))
    annots = {"seq_a": {
        "frame_ids": np.arange(F),
        "world_trans": trans[None],
        "world_grots": grots[None],
        "camera_extrinsics": ext,
    }}
    frame2ind = {i: i for i in range(F)}
    preds = {"seq_a": [frame2ind, None, trans.copy(), grots.copy()]}
    out = dynacam_evaluate(annots, preds)
    assert out["ate"]["seq_a"] < 1e-6
    assert out["ape"]["seq_a"] < 1e-6

    # missing sequence -> punishment
    out2 = dynacam_evaluate(annots, {"seq_a": None})
    assert out2["ate"]["seq_a"] == 2.0 and out2["ape"]["seq_a"] == 4.0

    # frame2ind gap -> nearest-frame fallback used, still finite
    sparse = {i: i for i in range(0, F, 2)}
    idx = np.arange(0, F, 2)
    preds3 = {"seq_a": [
        {i: k for k, i in enumerate(idx)}, None, trans[idx], grots[idx]]}
    out3 = dynacam_evaluate(annots, preds3)
    assert np.isfinite(out3["ate"]["seq_a"])
