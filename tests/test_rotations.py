"""Rotation op parity vs the torch reference implementations."""
import numpy as np
import pytest

import jax.numpy as jnp

from romp_tpu.ops import rotations as rots
from tests._oracle import ref_smpl, ref_utils

torch = pytest.importorskip("torch")


def test_axis_angle_to_matrix_matches_reference():
    smpl = ref_smpl()
    rng = np.random.RandomState(0)
    aa = rng.randn(64, 3).astype(np.float32) * 2.0
    aa[0] = 0.0  # degenerate: zero rotation
    aa[1] = [np.pi, 0, 0]
    ours = np.asarray(rots.axis_angle_to_matrix(jnp.asarray(aa)))
    ref = smpl.batch_rodrigues(torch.from_numpy(aa)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rot6d_to_matrix_matches_reference():
    utils = ref_utils()
    rng = np.random.RandomState(1)
    x = rng.randn(128, 6).astype(np.float32)
    ours = np.asarray(rots.rot6d_to_matrix(jnp.asarray(x)))
    ref = utils.rot6d_to_rotmat(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)
    # Result is a valid rotation: R R^T = I, det = +1
    rrt = np.einsum("nij,nkj->nik", ours, ours)
    np.testing.assert_allclose(rrt, np.tile(np.eye(3), (128, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(ours), 1.0, atol=1e-5)


def test_matrix_to_axis_angle_matches_reference():
    utils = ref_utils()
    rng = np.random.RandomState(2)
    aa = rng.randn(256, 3).astype(np.float32)
    aa[0] = 0.0
    R = np.asarray(rots.axis_angle_to_matrix(jnp.asarray(aa)))
    ours = np.asarray(rots.matrix_to_axis_angle(jnp.asarray(R)))
    ref = utils.rotation_matrix_to_angle_axis(torch.from_numpy(R)).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_rot6d_to_axis_angle_roundtrip_and_parity():
    utils = ref_utils()
    rng = np.random.RandomState(3)
    x = rng.randn(32, 21 * 6).astype(np.float32)
    ours = np.asarray(rots.rot6d_to_axis_angle(jnp.asarray(x)))
    ref = utils.rot6D_to_angular(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)
    # Round trip through matrix preserves the rotation.
    R1 = np.asarray(rots.rot6d_to_matrix(jnp.asarray(x.reshape(-1, 6))))
    R2 = np.asarray(rots.axis_angle_to_matrix(jnp.asarray(ours.reshape(-1, 3))))
    np.testing.assert_allclose(R1, R2, atol=1e-4)


def test_matrix_to_rot6d_inverse():
    rng = np.random.RandomState(4)
    aa = rng.randn(64, 3).astype(np.float32)
    R = rots.axis_angle_to_matrix(jnp.asarray(aa))
    six = rots.matrix_to_rot6d(R)
    R2 = rots.rot6d_to_matrix(six)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_quaternion_roundtrip():
    rng = np.random.RandomState(5)
    aa = rng.randn(64, 3).astype(np.float32)
    R = rots.axis_angle_to_matrix(jnp.asarray(aa))
    q = rots.matrix_to_quaternion(R)
    R2 = rots.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
