"""BEV network + pipeline parity vs the torch reference (`simple_romp/bev`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.models.bev import (
    bev_forward_maps, bev_regress_params, cam3dmap_anchor, coord_maps_3d_halfz,
)
from romp_tpu.models.layers import ParamStore
from romp_tpu.ops.centermap import parse_centermap3d
from romp_tpu.pipeline.bev_pipeline import (
    BevConfig, bev_cam_to_trans, bev_inference, suppress_duplicates,
    remove_outliers, unpack_bev_params,
)
from romp_tpu.smpl.assets import synthetic_assets
from romp_tpu.smpl.body_model import SmplModel
from romp_tpu.utils.checkpoint import convert_torch_state_dict
from tests._oracle import ref_bev_model, ref_bev_post_parser

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_and_params():
    ref_mod = ref_bev_model()
    torch.manual_seed(0)
    model = ref_mod.BEVv1(center_thresh=0.1).eval()
    sd = {k: v for k, v in model.state_dict().items() if k != "coordmap_3d"}
    params = {k: jnp.asarray(v)
              for k, v in convert_torch_state_dict(sd).items()}
    return ref_mod, model, params


@pytest.mark.slow
def test_bev_full_parity(ref_and_params):
    ref_mod, model, params = ref_and_params
    rng = np.random.RandomState(0)
    image = rng.rand(1, 512, 512, 3).astype(np.float32) * 255.0

    # Reference maps.
    with torch.no_grad():
        x = model.backbone(torch.from_numpy(image))
        r_c3d, r_cam3d, r_cfv = model.coarse2fine_localization(x)

    anchors = jnp.asarray(cam3dmap_anchor())
    coord3d = jnp.asarray(coord_maps_3d_halfz(128, np.asarray(anchors)))
    store = ParamStore(params)
    maps = jax.jit(lambda im: bev_forward_maps(store, im, anchors, coord3d))(
        jnp.asarray(image))

    np.testing.assert_allclose(
        np.asarray(maps.center_maps_fv)[..., 0], r_cfv.numpy()[:, 0],
        atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(maps.center_maps_3d), r_c3d.numpy(), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(maps.cam_maps_3d),
        r_cam3d.numpy().transpose(0, 2, 3, 4, 1), atol=3e-3)

    # Full forward with a threshold that fires on random weights.
    thresh = float(np.quantile(r_c3d.numpy(), 0.99999))
    model.centermap_parser.conf_thresh = thresh
    with torch.no_grad():
        ref_out = model(torch.from_numpy(image))
    assert ref_out is not None
    n_ref = len(ref_out["params_pred"])

    det = parse_centermap3d(maps.center_maps_3d, 16, thresh)
    params_pred = bev_regress_params(store, maps, det, anchors)
    mask = np.asarray(det.mask)[0]
    assert mask.sum() == n_ref
    np.testing.assert_array_equal(
        np.asarray(det.zyx)[0][mask], ref_out["pred_czyxs"].numpy())
    np.testing.assert_allclose(
        np.asarray(det.scores)[0][mask], ref_out["center_confs"].numpy(),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(params_pred)[0][mask], ref_out["params_pred"].numpy(),
        atol=2e-3)

    # Param unpack + cam trans parity.
    pp = ref_bev_post_parser()
    ref_packed = pp.pack_params_dict(ref_out["params_pred"])
    ours = unpack_bev_params(jnp.asarray(params_pred)[0][mask])
    np.testing.assert_allclose(
        np.asarray(ours["smpl_thetas"]), ref_packed["smpl_thetas"].numpy(),
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours["smpl_betas"]), ref_packed["smpl_betas"].numpy(),
        atol=1e-4)
    ref_trans = pp.denormalize_cam_params_to_trans(ref_packed["cam"])
    np.testing.assert_allclose(
        np.asarray(bev_cam_to_trans(ours["cam"])), ref_trans.numpy(),
        atol=1e-4)


def test_perspective_projection_matches_reference():
    pp = ref_bev_post_parser()
    rng = np.random.RandomState(1)
    pts = rng.randn(3, 54, 3).astype(np.float32)
    trans = np.abs(rng.randn(3, 3)).astype(np.float32) + np.array(
        [0, 0, 3], np.float32)
    ref = pp.perspective_projection(
        torch.from_numpy(pts), translation=torch.from_numpy(trans),
        focal_length=443.4, normalize=True).numpy()
    from romp_tpu.ops.projection import perspective_projection
    ours = np.asarray(perspective_projection(
        jnp.asarray(pts), jnp.asarray(trans), img_size=512.0))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_suppress_duplicates_matches_reference():
    pp = ref_bev_post_parser()
    rng = np.random.RandomState(2)
    K = 6
    pj2d = rng.randn(K, 54, 2).astype(np.float32) * 0.5
    pj2d[1] = pj2d[0] + 1e-4   # duplicate pair (0, 1)
    cams = np.abs(rng.rand(K, 3)).astype(np.float32) + 0.3
    cams[1, 0] = cams[0, 0] - 0.2  # person 1 smaller scale -> removed

    outputs = {
        "params_pred": torch.from_numpy(np.zeros((K, 146), np.float32)),
        "pj2d": torch.from_numpy(pj2d.copy()),
        "cam": torch.from_numpy(cams.copy()),
        "center_confs": torch.from_numpy(np.ones(K, np.float32)),
    }
    ref_out = pp.suppressing_redundant_prediction_via_projection(
        outputs, (512, 512, 3), thresh=16)
    kept_ref = ref_out["pj2d"].shape[0]

    mask = suppress_duplicates(
        jnp.asarray(pj2d), jnp.asarray(cams[:, 0]),
        jnp.ones(K, bool), jnp.asarray(512.0), 16.0)
    assert int(np.asarray(mask).sum()) == kept_ref
    assert not bool(np.asarray(mask)[1])


def test_remove_outliers_matches_reference():
    pp = ref_bev_post_parser()
    rng = np.random.RandomState(3)
    K = 8
    trans = rng.randn(K, 3).astype(np.float32)
    trans[5] = [50.0, 50.0, 80.0]  # far outlier
    cams = np.abs(rng.rand(K, 3)).astype(np.float32) + 0.5
    cams[5, 0] = 0.1  # small scale

    outputs = {
        "params_pred": torch.zeros(K, 146),
        "cam_trans": torch.from_numpy(trans.copy()),
        "cam": torch.from_numpy(cams.copy()),
    }
    ref_out = pp.remove_outlier(outputs, relative_scale_thresh=3)
    kept_ref = ref_out["cam_trans"].shape[0]

    mask = remove_outliers(jnp.asarray(trans), jnp.asarray(cams[:, 0]),
                           jnp.ones(K, bool), 3.0, 0.25)
    assert int(np.asarray(mask).sum()) == kept_ref == K - 1
    assert not bool(np.asarray(mask)[5])


@pytest.mark.slow
def test_bev_pipeline_end_to_end(ref_and_params):
    """Smoke + invariants on the full jitted BEV pipeline with SMPL+A."""
    _, _, params = ref_and_params
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = BevConfig(max_person=8, conf_thresh=-1e9)  # accept everything
    rng = np.random.RandomState(4)
    image = rng.rand(1, 512, 512, 3).astype(np.float32) * 255.0
    out = jax.jit(lambda p, im: bev_inference(p, adult, baby, im, cfg))(
        params, jnp.asarray(image))
    assert out["verts"].shape == (1, 8, 6890, 3)
    assert out["joints"].shape == (1, 8, 71, 3)
    assert out["pj2d"].shape == (1, 8, 71, 2)
    assert np.isfinite(np.asarray(out["verts"])).all()
    assert np.asarray(out["cam_trans"])[..., 2].min() > 0  # depths positive


def test_basic_block_3d_banded_matches_direct():
    """The z-banded 2D-conv formulation of basic_block_3d equals the direct
    conv3d formulation on the SAME stored weights — inference and train mode
    (train also checks the recorded BatchNorm3d batch statistics)."""
    from romp_tpu.models.layers import (
        basic_block_3d, batch_norm, bn_relu, conv3d,
    )

    rng = np.random.RandomState(3)
    for C, D, H, W in ((1, 16, 12, 12), (3, 8, 10, 10)):
        x = jnp.asarray(rng.rand(2, D, H, W, C).astype(np.float32) - 0.3)
        init = ParamStore(rng=jax.random.PRNGKey(0))
        basic_block_3d(init, "blk", x, C)
        params = init.params
        # shapes/names unchanged: checkpoints convert exactly as before
        assert params["blk.conv1.weight"].shape == (3, 3, 3, C, C)

        def direct(st):
            out = conv3d(st, "blk.conv1", x, C, 3, 1)
            out = bn_relu(st, "blk.bn1", out)
            out = conv3d(st, "blk.conv2", out, C, 3, 1)
            return batch_norm(st, "blk.bn2", out) + x

        for train in (False, True):
            st_b = ParamStore(params, train=train)
            st_d = ParamStore(params, train=train)
            y_b = np.asarray(basic_block_3d(st_b, "blk", x, C))
            y_d = np.asarray(direct(st_d))
            np.testing.assert_allclose(y_b, y_d, atol=2e-5)
            assert set(st_b.stats_updates) == set(st_d.stats_updates)
            for k in st_d.stats_updates:
                np.testing.assert_allclose(
                    np.asarray(st_b.stats_updates[k]),
                    np.asarray(st_d.stats_updates[k]), atol=2e-5)
