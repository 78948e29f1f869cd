"""Crowd (long-image) mode: window planning + merge logic + e2e smoke."""
import numpy as np
import pytest

from romp_tpu.pipeline.crowd import (
    convert_crop_cam_to_full_image, exclude_boundary_mask,
    get_image_split_plan, np_remove_outliers, np_suppress_duplicates,
    padding_image_overlap,
)


def test_split_plan_covers_panorama():
    img = np.zeros((200, 1000, 3), np.uint8)
    pad, info, pad_len = padding_image_overlap(img, overlap_ratio=0.46)
    assert pad.shape[1] == 1000 + 2 * pad_len
    boxes = get_image_split_plan(pad, overlap_ratio=0.46)
    assert (boxes[:, 1] - boxes[:, 0] == pad.shape[0]).all()  # square crops
    assert boxes[0, 0] == 0
    assert boxes[-1, 1] == pad.shape[1]                       # right-aligned
    # consecutive windows overlap
    assert (boxes[1:, 0] < boxes[:-1, 1]).all()


def test_boundary_exclusion_and_cam_remap():
    cam_x = np.array([-0.9, 0.0, 0.9])
    keep_left = exclude_boundary_mask(cam_x, 0.2, "left")
    assert keep_left.tolist() == [True, True, False]
    keep_right = exclude_boundary_mask(cam_x, 0.2, "right")
    assert keep_right.tolist() == [False, True, True]

    cam = np.array([[1.0, 0.1, 0.0]])
    box = np.array([0, 200, 0, 200], np.float32)
    out = convert_crop_cam_to_full_image(cam.copy(), box, (200, 1000))
    # scale shrinks by crop/full ratio; x shifts toward the crop center
    assert out[0, 0] == pytest.approx(0.2)
    assert out[0, 2] == pytest.approx(0.0 * 0.2 + 100 / 500 - 1)


def test_np_pruning_twins():
    # NOTE reference quirk: with normalized-coordinate pj2d and the default
    # nms_thresh (16-20 scaled by image size), ALL unit-scale pairs fall
    # under the duplicate threshold — the torch reference keeps only the
    # highest-priority member (verified directly against
    # `bev/post_parser.py:167`). Our twin matches that behavior; pairs
    # survive only when separated by >> thresh * scale.
    pj2d = np.random.RandomState(0).randn(3, 54, 2).astype(np.float32)
    pj2d[1] = pj2d[0] + 1e-5
    pj2d[2] += 1000.0  # far beyond any duplicate threshold
    scales = np.array([1.0, 0.5, 1.2], np.float32)
    confs = np.array([0.9, 0.5, 0.8], np.float32)
    keep = np_suppress_duplicates(pj2d, scales, confs, 512.0, 16.0)
    assert keep.tolist() == [True, False, True]

    trans = np.random.RandomState(1).randn(5, 3).astype(np.float32)
    trans[2] = [90, 90, 90]
    sc = np.ones(5, np.float32)
    sc[2] = 0.05
    keep = np_remove_outliers(trans, sc, 3.0, 0.5)
    assert not keep[2] and keep.sum() == 4


@pytest.mark.slow
def test_crowd_mode_end_to_end():
    """Synthetic 2.5:1 panorama through the full BEV crowd flow."""
    import types

    import jax

    from romp_tpu.models.bev import init_bev_params
    from romp_tpu.pipeline.bev_pipeline import BevConfig, BevPipeline
    from romp_tpu.pipeline.crowd import process_long_image
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    params = init_bev_params(jax.random.PRNGKey(0))
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = BevConfig(max_person=4, conf_thresh=-1e9)
    pipe = BevPipeline(params, adult, baby, cfg)
    settings = types.SimpleNamespace(
        overlap_ratio=0.46, nms_thresh=1e-9,  # aggressive pruning exercised
        relative_scale_thresh=1e9, input_size=512)

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (200, 520, 3), np.uint8)
    out = process_long_image(pipe, image, settings)
    if out is not None:  # random weights may prune everything
        assert out["cam"].ndim == 2
        assert "pad_info" in out
        assert np.isfinite(out["cam_trans"]).all()


def test_np_merge_twins_match_device_versions():
    """The numpy twins used by the crowd merge (host-only math) must match
    the jitted originals."""
    import numpy as np
    import jax.numpy as jnp

    from romp_tpu.ops.projection import perspective_projection
    from romp_tpu.pipeline.bev_pipeline import bev_cam_to_trans
    from romp_tpu.pipeline.crowd import (
        np_bev_cam_to_trans, np_perspective_projection,
    )

    rng = np.random.RandomState(0)
    cam = rng.rand(7, 3).astype(np.float32) * 2 - 0.5
    np.testing.assert_allclose(
        np_bev_cam_to_trans(cam),
        np.asarray(bev_cam_to_trans(jnp.asarray(cam))), rtol=1e-5, atol=1e-6)

    pts = rng.randn(7, 24, 3).astype(np.float32)
    trans = np_bev_cam_to_trans(cam)
    np.testing.assert_allclose(
        np_perspective_projection(pts, trans, img_size=512.0),
        np.asarray(perspective_projection(jnp.asarray(pts),
                                          jnp.asarray(trans),
                                          img_size=512.0)),
        rtol=1e-4, atol=1e-5)
