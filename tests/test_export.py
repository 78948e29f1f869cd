"""StableHLO export round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_stablehlo_export_roundtrip(tmp_path):
    from romp_tpu.tools.export_stablehlo import export_romp, load_exported

    out = str(tmp_path / "romp.stablehlo")
    export_romp(str(tmp_path / "missing.npz"), out, batch=1,
                max_person=2)
    exported = load_exported(out)
    images = jnp.zeros((1, 512, 512, 3), jnp.float32)
    res = exported.call(images)
    # exported fn returns the full output dict as a pytree
    leaves = jax.tree_util.tree_leaves(res)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_stablehlo_export_bev_roundtrip(tmp_path):
    from romp_tpu.tools.export_stablehlo import export_bev, load_exported

    out = str(tmp_path / "bev.stablehlo")
    export_bev(str(tmp_path / "missing.npz"), out, batch=1, max_person=2,
               input_size=64)
    exported = load_exported(out)
    res = exported.call(jnp.zeros((1, 64, 64, 3), jnp.float32))
    leaves = jax.tree_util.tree_leaves(res)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


# ----------------------------------------------------------- DeepMimic --

def _standing_joints():
    """A plausible standing SMPL-24 skeleton (camera coords, y DOWN)."""
    j = np.zeros((24, 3), np.float32)
    j[0] = [0, 0, 0]          # pelvis
    j[1] = [0.1, 0.05, 0]     # l hip
    j[2] = [-0.1, 0.05, 0]    # r hip
    j[3] = [0, -0.1, 0]       # spine1
    j[4] = [0.1, 0.5, 0]      # l knee
    j[5] = [-0.1, 0.5, 0]     # r knee
    j[6] = [0, -0.2, 0]       # spine2
    j[7] = [0.1, 0.95, 0]     # l ankle
    j[8] = [-0.1, 0.95, 0]    # r ankle
    j[9] = [0, -0.3, 0]       # spine3
    j[10] = [0.1, 1.0, 0.1]   # l foot
    j[11] = [-0.1, 1.0, 0.1]  # r foot
    j[12] = [0, -0.45, 0]     # neck
    j[13] = [0.08, -0.4, 0]   # l collar
    j[14] = [-0.08, -0.4, 0]  # r collar
    j[15] = [0, -0.6, 0]      # head
    j[16] = [0.2, -0.4, 0]    # l shoulder
    j[17] = [-0.2, -0.4, 0]   # r shoulder
    j[18] = [0.45, -0.4, 0]   # l elbow
    j[19] = [-0.45, -0.4, 0]  # r elbow
    j[20] = [0.7, -0.4, 0]    # l wrist
    j[21] = [-0.7, -0.4, 0]   # r wrist
    j[22] = [0.75, -0.4, 0]
    j[23] = [-0.75, -0.4, 0]
    return j


def test_deepmimic_export_frames(tmp_path):
    import json

    from romp_tpu.tools.export_deepmimic import (
        FRAME_DOF, main, smpl_joints_to_deepmimic,
    )

    T = 3
    joints = np.stack([_standing_joints() + [0.01 * t, 0, 0]
                       for t in range(T)])
    doc = smpl_joints_to_deepmimic(joints, fps=10.0)
    frames = np.asarray(doc["Frames"])
    assert frames.shape == (T, FRAME_DOF)
    assert doc["Loop"] == "none"
    np.testing.assert_allclose(frames[:, 0], 0.1)       # durations
    # 44-dof layout: dur[0], root pos[1:4], then quats/angles:
    # root[4:8] chest[8:12] neck[12:16] rhip[16:20] rknee[20] rankle[21:25]
    # rshoulder[25:29] relbow[29] lhip[30:34] lknee[34] lankle[35:39]
    # lshoulder[39:43] lelbow[43]
    for q0 in (4, 8, 12, 16, 21, 25, 30, 35, 39):
        norms = np.linalg.norm(frames[:, q0:q0 + 4], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    # standing pose: knees/elbows nearly straight (angle dofs ~ 0)
    for a0 in (20, 29, 34, 43):
        assert np.abs(frames[:, a0]).max() < 0.35
    assert np.isfinite(frames).all()

    # CLI round-trip
    npz = tmp_path / "motion.npz"
    np.savez(npz, joints=joints)
    out = tmp_path / "motion.json"
    assert main([str(npz), str(out), "--fps", "10"]) == 0
    loaded = json.load(open(out))
    assert len(loaded["Frames"]) == T
