"""SMPL body model parity vs the torch reference (`simple_romp/romp/smpl.py`).

Synthetic assets (real kinematic tree, realistic magnitudes) drive both
implementations; outputs must agree far below the 1mm MPVE budget.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.smpl.assets import synthetic_assets, to_reference_pth_dict
from romp_tpu.smpl.body_model import SmplModel, smpl_forward, smpla_forward
from tests._oracle import ref_smpl

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def assets():
    return synthetic_assets(seed=0)


@pytest.fixture(scope="module")
def ref_smpl_model(assets, tmp_path_factory):
    path = tmp_path_factory.mktemp("smpl") / "SMPL_SYNTH.pth"
    torch.save(to_reference_pth_dict(assets), str(path))
    return ref_smpl().SMPL(str(path))


def _random_inputs(seed, batch=4, num_betas=10):
    rng = np.random.RandomState(seed)
    betas = rng.randn(batch, num_betas).astype(np.float32)
    pose = (rng.randn(batch, 72) * 0.4).astype(np.float32)
    pose[0] = 0.0  # rest pose
    return betas, pose


def test_smpl_forward_matches_reference(assets, ref_smpl_model):
    betas, pose = _random_inputs(7)
    model = SmplModel.from_assets(assets)
    verts, joints = jax.jit(lambda b, p: smpl_forward(model, b, p))(
        jnp.asarray(betas), jnp.asarray(pose))
    ref_v, ref_j, _ = ref_smpl_model(
        torch.from_numpy(betas), torch.from_numpy(pose))

    mpve = np.abs(np.asarray(verts) - ref_v.numpy()).max()
    assert mpve < 1e-4, f"max vertex deviation {mpve}"
    np.testing.assert_allclose(
        np.asarray(joints), ref_j.numpy(), atol=1e-4)


def test_smpl_root_align_matches_reference(assets, ref_smpl_model):
    betas, pose = _random_inputs(8)
    model = SmplModel.from_assets(assets)
    verts, joints = smpl_forward(
        model, jnp.asarray(betas), jnp.asarray(pose), root_align=True)
    ref_v, ref_j, _ = ref_smpl_model(
        torch.from_numpy(betas), torch.from_numpy(pose), root_align=True)
    np.testing.assert_allclose(np.asarray(verts), ref_v.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), ref_j.numpy(), atol=1e-4)


def test_smpl_forward_is_differentiable(assets):
    model = SmplModel.from_assets(assets)
    betas, pose = _random_inputs(9, batch=2)

    def loss(b, p):
        v, j = smpl_forward(model, b, p)
        return jnp.sum(v ** 2) + jnp.sum(j ** 2)

    g_b, g_p = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(betas), jnp.asarray(pose))
    assert np.isfinite(np.asarray(g_b)).all()
    assert np.isfinite(np.asarray(g_p)).all()
    assert float(jnp.abs(g_p).max()) > 0


def test_smpla_selects_baby_branch(assets):
    adult_assets = synthetic_assets(seed=0, num_betas=11)
    baby_assets = synthetic_assets(seed=1, num_betas=10)
    adult = SmplModel.from_assets(adult_assets)
    baby = SmplModel.from_assets(baby_assets)
    rng = np.random.RandomState(11)
    betas = rng.randn(4, 11).astype(np.float32)
    betas[:2, 10] = 1.0   # babies
    betas[2:, 10] = 0.0   # adults
    pose = (rng.randn(4, 72) * 0.3).astype(np.float32)

    v, j = smpla_forward(adult, baby, jnp.asarray(betas), jnp.asarray(pose))
    v_baby, _ = smpl_forward(baby, jnp.asarray(betas[:, :10]), jnp.asarray(pose),
                             root_align=True)
    v_adult, _ = smpl_forward(adult, jnp.asarray(betas), jnp.asarray(pose),
                              root_align=True)
    np.testing.assert_allclose(np.asarray(v[:2]), np.asarray(v_baby[:2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v[2:]), np.asarray(v_adult[2:]), atol=1e-6)
