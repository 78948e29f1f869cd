"""TRACE head parity vs the torch reference (`simple_romp/trace2/models`).

The reference's deformable conv is CUDA-only, so it is stubbed for module
loading (our XLA implementation is property-tested in test_deform_conv.py);
numeric parity is checked on every other subgraph by calling the reference
methods directly with shared inputs.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import ParamStore
from romp_tpu.models import trace as trace_mod
from romp_tpu.models.trace import (
    conv_gru, init_trace_params, temporal_encoder, trace_cam_anchor,
    trace_forward_maps, trace_regress_trajectory, trace_regress_trans,
)
from romp_tpu.utils.checkpoint import convert_torch_state_dict
from tests._oracle import REF, ref_package

torch = pytest.importorskip("torch")


def _load_ref_trace_model():
    # Stub CUDA deform conv and host-tracking/vis imports.
    if "reftrace2.models.deform_conv" not in sys.modules:
        stub = types.ModuleType("reftrace2.models.deform_conv")

        class DeformConv(torch.nn.Module):
            def __init__(self, in_ch, out_ch, ks, stride=1, padding=1,
                         dilation=1, deformable_groups=1):
                super().__init__()
                self.weight = torch.nn.Parameter(
                    torch.zeros(out_ch, in_ch, *ks))

            def forward(self, x, offsets):  # pragma: no cover
                raise NotImplementedError

        stub.DeformConv = DeformConv
        sys.modules["reftrace2.models.deform_conv"] = stub

        tt = types.ModuleType("reftrace2.models.TempTracker")
        tt.perform_tracking = None
        tt.prepare_complete_trajectory_features_withmemory = None
        tt.infilling_cams_of_low_quality_dets = None
        sys.modules["reftrace2.models.TempTracker"] = tt

        vm = types.ModuleType("reftrace2.utils.visualize_maps")
        for name in ("convert_heatmap", "flow2img", "plot3DHeatmap",
                     "convert_motionmap3D2motionline"):
            setattr(vm, name, None)
        sys.modules["reftrace2.utils.visualize_maps"] = vm

    for alias, sub in (("reftrace2", "simple_romp/trace2"),
                       ("reftrace2.models", "simple_romp/trace2/models"),
                       ("reftrace2.utils", "simple_romp/trace2/utils")):
        if alias not in sys.modules:
            pkg = types.ModuleType(alias)
            pkg.__path__ = [f"{REF}/{sub}"]
            sys.modules[alias] = pkg
    import importlib

    return importlib.import_module("reftrace2.models.model")


@pytest.fixture(scope="module")
def ref_head():
    mod = _load_ref_trace_model()
    torch.manual_seed(0)
    return mod, mod.TRACE_head(None, temp_clip_length=8).eval()


def test_trace_cam_anchor_matches_reference(ref_head):
    mod, _ = ref_head
    np.testing.assert_allclose(trace_cam_anchor(),
                               mod.get_cam3dmap_anchor(50, 128), atol=1e-6)


@pytest.mark.slow
def test_trace_param_coverage(ref_head):
    _, head = ref_head
    sd = {k: v for k, v in head.state_dict().items() if k != "coordmap_3d"}
    conv = convert_torch_state_dict(sd)
    ours = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
    from romp_tpu.utils.checkpoint import check_params_match

    check_params_match(conv, ours)


def test_conv_gru_parity(ref_head):
    mod, head = ref_head
    import importlib

    bm = importlib.import_module("reftrace2.models.basic_modules")
    torch.manual_seed(1)
    ref_gru = bm.ConvGRU(input_dim=8, hidden_dim=8, kernel_size=3,
                         num_layers=2).eval()
    sd = {f"temp_model.{k}": v for k, v in ref_gru.state_dict().items()}
    params = {k: jnp.asarray(v)
              for k, v in convert_torch_state_dict(sd).items()}

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 16, 16).astype(np.float32)  # (B, T, C, H, W)
    with torch.no_grad():
        ref_out, ref_hidden = ref_gru(torch.from_numpy(x))

    store = ParamStore(params)
    out, hidden = conv_gru(store, "temp_model",
                           jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                           None, num_layers=2, hidden_dim=8)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 1, 4, 2, 3), ref_out.numpy(), atol=2e-5)
    for ours_h, ref_h in zip(hidden, ref_hidden):
        np.testing.assert_allclose(
            np.asarray(ours_h).transpose(0, 3, 1, 2), ref_h.numpy(),
            atol=2e-5)
    # carried-state call parity
    with torch.no_grad():
        ref_out2, _ = ref_gru(torch.from_numpy(x), hidden_state=ref_hidden)
    out2, _ = conv_gru(store, "temp_model",
                       jnp.asarray(x.transpose(0, 1, 3, 4, 2)), hidden,
                       num_layers=2, hidden_dim=8)
    np.testing.assert_allclose(
        np.asarray(out2).transpose(0, 1, 4, 2, 3), ref_out2.numpy(),
        atol=2e-5)


def test_temporal_encoder_parity(ref_head):
    import importlib

    bm = importlib.import_module("reftrace2.models.basic_modules")
    torch.manual_seed(2)
    ref_enc = bm.TemporalEncoder(input_size=16, out_size=[6, 6],
                                 hidden_size=32).eval()
    sd = {f"temp_globalrot_regressor.{k}": v
          for k, v in ref_enc.state_dict().items()}
    params = {k: jnp.asarray(v)
              for k, v in convert_torch_state_dict(sd).items()}
    rng = np.random.RandomState(3)
    x = rng.randn(4, 5, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_enc(torch.from_numpy(x))
    ours = temporal_encoder(ParamStore(params), "temp_globalrot_regressor",
                            jnp.asarray(x), (6, 6), hidden_size=32)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=1e-5)


@pytest.mark.slow
def test_trace_localization_maps_parity(ref_head):
    """coarse2fine_localization + motion heads + regressors parity, feeding
    both with identical fused feature maps (bypassing deform conv)."""
    _, head = ref_head
    sd = {k: v for k, v in head.state_dict().items() if k != "coordmap_3d"}
    params = {k: jnp.asarray(v)
              for k, v in convert_torch_state_dict(sd).items()}
    store = ParamStore(params)

    rng = np.random.RandomState(4)
    T = 2
    feats = rng.randn(T, 32, 128, 128).astype(np.float32) * 0.5
    flows = rng.randn(T, 2, 128, 128).astype(np.float32)

    with torch.no_grad():
        tf = torch.from_numpy(feats)
        r_c3d, r_cfv, r_cam3d = head.coarse2fine_localization(tf)
        combined = torch.cat([torch.from_numpy(flows), tf], 1)
        r_mesh = head.param_head(combined)
        r_m3d, r_mfv = head.motion_regression(combined)
        r_motion_feats = head.cam_motion_head[:-2](combined)
        r_cam_motion = head.cam_motion_head[-2:](r_motion_feats)
        r_cam_rot = head.cam_rot_head(r_motion_feats)

    # ours: run the post-GRU part by reusing trace_forward_maps internals —
    # feed fused features directly via the private map heads
    from romp_tpu.models.trace import _bv_branch, _head, DEPTH_LEVELS
    from romp_tpu.models.layers import basic_block_3d, basic_block_conv_ds, conv2d
    from romp_tpu.models.trace import coord_maps_3d_zeroz

    fj = jnp.asarray(feats.transpose(0, 2, 3, 1))
    maps_fv = _head(store, "det_head", fj, 7, block_num=1)
    center_fv, cam_offset, local_res = (maps_fv[..., :1], maps_fv[..., 1:4],
                                        maps_fv[..., 4:7])
    bv = _bv_branch(store, "bv_pre_layers", "bv_out_layers", fj,
                    [center_fv, cam_offset, local_res], DEPTH_LEVELS * 3)
    c3d = center_fv[:, None, :, :, 0] * bv[:, :DEPTH_LEVELS][:, :, None, :]
    c3d = basic_block_3d(store, "center_map_refiner2.0", c3d[..., None],
                         1)[..., 0]
    np.testing.assert_allclose(np.asarray(c3d), r_c3d.numpy(), atol=3e-3)

    cam3d = jnp.asarray(coord_maps_3d_zeroz(128, 64)) + cam_offset[:, None]
    cam3d = cam3d.at[..., 0].add(bv[:, DEPTH_LEVELS:2 * DEPTH_LEVELS][:, :, None, :])
    cam3d = basic_block_3d(store, "cam_map_refiner.0", cam3d, 3)
    np.testing.assert_allclose(
        np.asarray(cam3d), r_cam3d.numpy().transpose(0, 2, 3, 4, 1),
        atol=3e-3)

    cj = jnp.asarray(np.concatenate([flows, feats], 1).transpose(0, 2, 3, 1))
    mesh = _head(store, "param_head", cj, None, block_num=2)
    np.testing.assert_allclose(
        np.asarray(mesh), r_mesh.numpy().transpose(0, 2, 3, 1), atol=2e-3)

    motion_fv = _head(store, "motion_head", cj, 3, block_num=2)
    mbv = _bv_branch(store, "bv_motion_pre_layers", "bv_motion_out_layers",
                     cj, [motion_fv], DEPTH_LEVELS)
    m3d = motion_fv[:, None] + mbv[:, :, None, :, None]
    m3d = basic_block_3d(store, "motion_map_refiner.0", m3d, 3)
    np.testing.assert_allclose(
        np.asarray(m3d), r_m3d.numpy().transpose(0, 2, 3, 4, 1), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(motion_fv), r_mfv.numpy().transpose(0, 2, 3, 1),
        atol=2e-3)

    cm = cj
    for b in range(5):
        cm = basic_block_conv_ds(store, f"cam_motion_head.{b}.0", cm, 128)
    cm5 = basic_block_conv_ds(store, "cam_motion_head.5.0", cm, 128)
    cam_motion = conv2d(store, "cam_motion_head.6", cm5, 3, 1, 1, padding=0,
                        bias=True)
    cam_rot = conv2d(
        store, "cam_rot_head.1",
        basic_block_conv_ds(store, "cam_rot_head.0", cm, 128), 6, 1, 1,
        padding=0, bias=True)
    np.testing.assert_allclose(
        np.asarray(cam_motion), r_cam_motion.numpy().transpose(0, 2, 3, 1),
        atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(cam_rot), r_cam_rot.numpy().transpose(0, 2, 3, 1),
        atol=2e-3)

    # trajectory regressors
    tfeat = rng.randn(3, T, 128).astype(np.float32)
    with torch.no_grad():
        r_params = head.separate_regression(torch.from_numpy(tfeat), None)
        r_cams = head.temp_trans_regressor(
            torch.cat([torch.zeros(3, T, 3), torch.from_numpy(tfeat)], -1),
            None)
    ours_params = trace_regress_trajectory(store, jnp.asarray(tfeat))
    np.testing.assert_allclose(
        np.asarray(ours_params).reshape(-1, 159), r_params.numpy(),
        atol=1e-4)
    ours_cams = trace_regress_trans(store, jnp.zeros((3, T, 3)),
                                    jnp.asarray(tfeat))
    np.testing.assert_allclose(np.asarray(ours_cams), r_cams.numpy(),
                               atol=1e-4)
