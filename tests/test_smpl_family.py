"""SMPL-family extras: SMPL-X / FLAME / MANO generic LBS + packers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("kind", ["smplx", "flame", "mano"])
def test_family_forward_shapes_and_rigidity(kind):
    from romp_tpu.smpl.family import (
        FamilyModel, family_forward, synthetic_family_assets,
    )
    from romp_tpu.ops.rotations import axis_angle_to_matrix

    assets = synthetic_family_assets(kind, seed=0)
    model = FamilyModel.from_assets(assets)
    B, J = 2, model.num_joints
    rng = np.random.RandomState(1)
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    pose = jnp.asarray(rng.randn(B, J * 3).astype(np.float32) * 0.2)
    verts, joints = family_forward(model, betas, pose)
    assert verts.shape == (B, assets.v_template.shape[0], 3)
    assert joints.shape == (B, J, 3)
    assert np.isfinite(np.asarray(verts)).all()

    # global-rotation equivariance: rotating only the ROOT by R maps the
    # whole mesh through R (about the root joint)
    aa = np.zeros((B, J * 3), np.float32)
    aa[:, 1] = 0.7
    v_rot, j_rot = family_forward(model, betas, jnp.asarray(aa))
    v_id, j_id = family_forward(model, betas, jnp.zeros_like(pose))
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa[:1, :3])))[0]
    root = np.asarray(j_id[:, :1])
    np.testing.assert_allclose(
        np.asarray(v_rot), (np.asarray(v_id) - root) @ R.T + root,
        atol=1e-4)


def test_flame_landmarks_barycentric():
    from romp_tpu.smpl.family import (
        FamilyModel, family_forward, synthetic_family_assets,
        vertices_to_landmarks,
    )

    assets = synthetic_family_assets("flame", seed=0)
    model = FamilyModel.from_assets(assets)
    verts, _ = family_forward(
        model, jnp.zeros((1, 10)), jnp.zeros((1, model.num_joints * 3)))
    lmk = vertices_to_landmarks(verts, model.faces, model.lmk_faces_idx,
                                model.lmk_bary_coords)
    assert lmk.shape == (1, 51, 3)
    # hand-check landmark 0 against its triangle's barycentric combo
    tri = np.asarray(model.faces)[int(assets.lmk_faces_idx[0])]
    expect = (np.asarray(verts)[0, tri]
              * assets.lmk_bary_coords[0][:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(lmk)[0, 0], expect, atol=1e-6)


def test_mano_pca_pose_space():
    from romp_tpu.smpl.family import (
        FamilyModel, mano_pose_from_pca, synthetic_family_assets,
    )

    model = FamilyModel.from_assets(synthetic_family_assets("mano", seed=0))
    go = jnp.asarray(np.random.RandomState(0).randn(2, 3).astype(np.float32))
    coeffs = jnp.asarray(np.random.RandomState(1).randn(2, 6)
                         .astype(np.float32))
    pose = mano_pose_from_pca(model, go, coeffs)
    assert pose.shape == (2, 48)
    np.testing.assert_allclose(np.asarray(pose[:, :3]), np.asarray(go))
    expect = (np.asarray(model.hands_mean)
              + np.asarray(coeffs) @ np.asarray(model.hands_components)[:6])
    np.testing.assert_allclose(np.asarray(pose[:, 3:]), expect, atol=1e-6)
    # zero coefficients -> mean pose
    p0 = mano_pose_from_pca(model, go, jnp.zeros((2, 6)))
    np.testing.assert_allclose(np.asarray(p0[:, 3:]),
                               np.tile(np.asarray(model.hands_mean), (2, 1)),
                               atol=1e-6)


def test_packers_official_layouts(tmp_path):
    """Packers consume synthetic files in the OFFICIAL layouts: smplx npz
    with (V, 3, 400) shapedirs, mano pkl with PCA, flame pkl."""
    import pickle

    from romp_tpu.smpl.family import (
        FamilyModel, family_forward, pack_official_flame,
        pack_official_mano, pack_official_smplx,
    )

    rng = np.random.RandomState(0)

    def official(V, J, shape_space, n_expr):
        kin = np.zeros((2, J), np.int64)
        kin[0, 0] = 2 ** 32 - 1
        for j in range(1, J):
            kin[0, j] = rng.randint(0, j)
        return {
            "v_template": rng.randn(V, 3).astype(np.float64),
            "shapedirs": rng.randn(V, 3, shape_space + n_expr),
            "posedirs": rng.randn(V, 3, (J - 1) * 9),
            "J_regressor": rng.rand(J, V),
            "kintree_table": kin,
            "weights": rng.rand(V, J),
            "f": rng.randint(0, V, (2 * V, 3)),
        }

    # SMPL-X npz
    d = official(101, 55, 300, 100)
    d["lmk_faces_idx"] = rng.randint(0, len(d["f"]), 51)
    d["lmk_bary_coords"] = rng.rand(51, 3)
    np.savez(tmp_path / "smplx.npz", **d)
    a = pack_official_smplx(str(tmp_path / "smplx.npz"), num_betas=10,
                            num_expression=10)
    assert a.shapedirs.shape == (101, 3, 20)
    assert a.posedirs.shape == (54 * 9, 101 * 3)
    assert a.parents[0] == -1 and a.num_joints == 55
    m = FamilyModel.from_assets(a)
    v, j = family_forward(m, jnp.zeros((1, 20)), jnp.zeros((1, 165)))
    assert v.shape == (1, 101, 3)

    # MANO pkl with PCA
    d2 = official(78, 16, 10, 0)
    d2["hands_components"] = rng.randn(45, 45)
    d2["hands_mean"] = rng.randn(45)
    with open(tmp_path / "mano.pkl", "wb") as f:
        pickle.dump(d2, f)
    a2 = pack_official_mano(str(tmp_path / "mano.pkl"))
    assert a2.hands_components.shape == (45, 45)
    assert a2.shapedirs.shape == (78, 3, 10)

    # FLAME pkl
    d3 = official(103, 5, 300, 100)
    with open(tmp_path / "flame.pkl", "wb") as f:
        pickle.dump(d3, f)
    a3 = pack_official_flame(str(tmp_path / "flame.pkl"), num_betas=20,
                             num_expression=10)
    assert a3.shapedirs.shape == (103, 3, 30)
    assert a3.num_joints == 5


def test_family_assets_roundtrip(tmp_path):
    from romp_tpu.smpl.family import FamilyAssets, synthetic_family_assets

    a = synthetic_family_assets("mano", seed=3)
    a.save(str(tmp_path / "mano_assets.npz"))
    b = FamilyAssets.load(str(tmp_path / "mano_assets.npz"))
    np.testing.assert_array_equal(a.v_template, b.v_template)
    np.testing.assert_array_equal(a.hands_mean, b.hands_mean)
