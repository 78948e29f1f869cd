"""Parity tests for center parsing, projection ops and the full ROMP pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.ops.centermap import parse_centermap2d, sample_maps_at
from romp_tpu.ops.projection import estimate_translation_lstsq
from romp_tpu.pipeline.romp_pipeline import (
    RompConfig, romp_inference, unpack_params,
)
from romp_tpu.smpl.assets import synthetic_assets, to_reference_pth_dict
from romp_tpu.smpl.body_model import SmplModel
from romp_tpu.utils.checkpoint import convert_torch_state_dict
from tests._oracle import ref_model, ref_romp_post_parser, ref_utils

torch = pytest.importorskip("torch")


def test_parse_centermap_matches_reference():
    pp = ref_romp_post_parser()
    rng = np.random.RandomState(0)
    cm = rng.rand(2, 1, 64, 64).astype(np.float32)
    thresh = 0.999

    parser = pp.CenterMap(conf_thresh=thresh)
    rb_ids, rinds, ryxs, rscores = parser.parse_centermap(torch.from_numpy(cm))

    det = parse_centermap2d(jnp.asarray(cm[:, 0]), max_person=64,
                            conf_thresh=thresh)
    mask = np.asarray(det.mask)
    assert mask.sum() == len(rb_ids) > 0
    ours_b, ours_k = np.nonzero(mask)
    np.testing.assert_array_equal(ours_b, rb_ids.numpy())
    np.testing.assert_array_equal(
        np.asarray(det.flat_inds)[mask], rinds.numpy())
    np.testing.assert_array_equal(np.asarray(det.yx)[mask], ryxs.numpy())
    np.testing.assert_allclose(
        np.asarray(det.scores)[mask], rscores.numpy(), rtol=1e-6)


def test_sample_maps_matches_reference_gather():
    pp = ref_romp_post_parser()
    rng = np.random.RandomState(1)
    maps = rng.randn(2, 145, 64, 64).astype(np.float32)  # torch NCHW
    batch_ids = torch.tensor([0, 0, 1])
    flat_inds = torch.tensor([5, 4095, 123])
    ref = pp.parameter_sampling(torch.from_numpy(maps), batch_ids, flat_inds)

    ours = sample_maps_at(jnp.asarray(maps.transpose(0, 2, 3, 1)),
                          jnp.asarray([[5, 4095], [123, 0]]))
    np.testing.assert_allclose(np.asarray(ours[0, 0]), ref[0].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours[0, 1]), ref[1].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours[1, 0]), ref[2].numpy(), atol=1e-6)


def test_unpack_params_matches_reference():
    pp = ref_romp_post_parser()
    rng = np.random.RandomState(2)
    raw = rng.randn(5, 145).astype(np.float32)
    ref = pp.pack_params_dict(torch.from_numpy(raw))
    ours = unpack_params(jnp.asarray(raw), cam_scale_base=1.0)
    np.testing.assert_allclose(
        np.asarray(ours["smpl_thetas"]), ref["smpl_thetas"].numpy(), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(ours["smpl_betas"]), ref["smpl_betas"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours["cam"]), ref["cam"].numpy(), atol=1e-6)


def test_estimate_translation_matches_reference_lstsq():
    utils = ref_utils()
    rng = np.random.RandomState(3)
    B, N = 6, 24
    j3d = rng.randn(B, N, 3).astype(np.float32)
    j3d[..., 2] += 5.0
    pj2d = rng.rand(B, N, 2).astype(np.float32) * 512.0
    ours = estimate_translation_lstsq(
        jnp.asarray(j3d), jnp.asarray(pj2d), jnp.ones((B, N)),
        focal_length=443.4, img_size=512.0)
    for i in range(B):
        ref = utils.estimate_translation_np(
            j3d[i], pj2d[i], np.ones(N, np.float32),
            focal_length=443.4, img_size=np.array([512.0, 512.0]))
        np.testing.assert_allclose(np.asarray(ours[i]), ref, rtol=2e-4,
                                   atol=2e-4)


def test_estimate_translation_invalid_when_few_points():
    B, N = 2, 24
    j3d = np.random.randn(B, N, 3).astype(np.float32)
    pj2d = np.random.rand(B, N, 2).astype(np.float32) * 512.0
    w = np.zeros((B, N), np.float32)
    w[1, :10] = 1.0
    out = np.asarray(estimate_translation_lstsq(
        jnp.asarray(j3d), jnp.asarray(pj2d), jnp.asarray(w)))
    np.testing.assert_allclose(out[0], [-1.0, -1.0, -1.0])
    assert not np.allclose(out[1], [-1.0, -1.0, -1.0])


@pytest.mark.slow
def test_compact_slots_keeps_valid_people():
    """fetch_slots compaction: top-(validity, conf) slots survive with all
    tensors consistently reordered; invalid slots are dropped first."""
    from romp_tpu.pipeline.romp_pipeline import compact_slots

    rng = np.random.RandomState(3)
    B, K, n = 2, 8, 3
    mask = np.zeros((B, K), bool)
    mask[0, [1, 6]] = True           # 2 valid people in image 0
    mask[1, [0, 2, 4, 7]] = True     # 4 valid in image 1 (one dropped)
    confs = rng.rand(B, K).astype(np.float32)
    verts = rng.randn(B, K, 10, 3).astype(np.float32)
    out = {"mask": jnp.asarray(mask), "center_confs": jnp.asarray(confs),
           "verts": jnp.asarray(verts)}
    res = jax.jit(lambda o: compact_slots(o, n))(out)
    res = {k: np.asarray(v) for k, v in res.items()}
    assert res["mask"].shape == (B, n)
    # image 0: both valid slots kept, ordered by conf desc, then invalids
    v0 = sorted([1, 6], key=lambda k: -confs[0, k])
    assert res["mask"][0].tolist() == [True, True, False]
    np.testing.assert_array_equal(res["verts"][0, :2], verts[0, v0])
    np.testing.assert_array_equal(res["center_confs"][0, :2], confs[0, v0])
    # image 1: top-3 most confident of the 4 valid
    v1 = sorted([0, 2, 4, 7], key=lambda k: -confs[1, k])[:3]
    assert res["mask"][1].all()
    np.testing.assert_array_equal(res["verts"][1], verts[1, v1])


def test_romp_pipeline_end_to_end_parity(tmp_path):
    """Full pipeline vs the reference flow (net -> parse -> SMPL -> proj)."""
    torch.manual_seed(0)
    ref_net = ref_model().ROMPv1().eval()
    pp = ref_romp_post_parser()
    smpl_mod = ref_romp_post_parser().__dict__  # noqa: F841

    assets = synthetic_assets(seed=0)
    pth = tmp_path / "SMPL_SYNTH.pth"
    torch.save(to_reference_pth_dict(assets), str(pth))

    rng = np.random.RandomState(0)
    image = rng.rand(1, 512, 512, 3).astype(np.float32) * 255.0

    # --- reference flow (main.py:106-160) ---
    with torch.no_grad():
        ref_center, ref_params = ref_net(torch.from_numpy(image))
        ref_params[:, 0] = torch.pow(1.1, ref_params[:, 0])
        thresh = float(np.quantile(ref_center.numpy(), 0.9997))
        parser = pp.CenterMap(conf_thresh=thresh)
        parsed = pp.parsing_outputs(ref_center, ref_params, parser)
        ref_smpl_parser = pp.SMPL_parser(str(pth))
        parsed = ref_smpl_parser(parsed, root_align=False)
        ref_utils_mod = ref_utils()
        pj3d = ref_utils_mod.batch_orth_proj(
            parsed["joints"], parsed["cam"], mode="2d")

    n_ref = parsed["smpl_thetas"].shape[0]
    assert n_ref >= 1

    # --- ours ---
    params = {k: jnp.asarray(v) for k, v in
              convert_torch_state_dict(ref_net.state_dict()).items()}
    smpl = SmplModel.from_assets(assets)
    cfg = RompConfig(max_person=16, conf_thresh=thresh, calc_smpl=True)
    out = jax.jit(lambda p, im: romp_inference(p, smpl, im, cfg))(
        params, jnp.asarray(image))

    mask = np.asarray(out["mask"])[0]
    assert mask.sum() == n_ref
    np.testing.assert_allclose(
        np.asarray(out["smpl_thetas"])[0][mask],
        parsed["smpl_thetas"].numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["smpl_betas"])[0][mask],
        parsed["smpl_betas"].numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["cam"])[0][mask], parsed["cam"].numpy(), atol=1e-3)
    max_vert_err = np.abs(
        np.asarray(out["verts"])[0][mask] - parsed["verts"].numpy()).max()
    assert max_vert_err < 1e-3, f"MPVE vs reference flow: {max_vert_err}"
    np.testing.assert_allclose(
        np.asarray(out["pj2d"])[0][mask], pj3d[:, :, :2].numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["centers"])[0][mask],
        parsed["center_preds"].numpy().astype(np.float32), atol=0)
