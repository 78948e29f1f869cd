"""LM PnP solver: recovers synthetic camera poses."""
import numpy as np

import jax
import jax.numpy as jnp

from romp_tpu.ops.pnp import estimate_camera_pnp, lm_pnp
from romp_tpu.ops.rotations import axis_angle_to_matrix


def _synthetic_case(rng, B=3, N=24, focal=548.0, img=512.0):
    pts3d = rng.randn(B, N, 3).astype(np.float32) * 0.4
    aa_gt = (rng.randn(B, 3) * 0.2).astype(np.float32)
    t_gt = np.stack([rng.uniform(-0.5, 0.5, B), rng.uniform(-0.5, 0.5, B),
                     rng.uniform(4, 7, B)], -1).astype(np.float32)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa_gt)))
    p = np.einsum("bij,bnj->bni", R, pts3d) + t_gt[:, None]
    pts2d = p[..., :2] / p[..., 2:3] * focal + img / 2.0
    return pts3d, pts2d.astype(np.float32), aa_gt, t_gt


def test_lm_pnp_recovers_pose():
    rng = np.random.RandomState(0)
    pts3d, pts2d, aa_gt, t_gt = _synthetic_case(rng)
    res = jax.jit(lambda a, b, w: estimate_camera_pnp(a, b, w, iters=20))(
        jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.ones(pts3d.shape[:2]))
    np.testing.assert_allclose(np.asarray(res.translation), t_gt, atol=0.05)
    np.testing.assert_allclose(np.asarray(res.rotation_aa), aa_gt, atol=0.05)
    assert float(res.cost.max()) < 1.0


def test_lm_pnp_weighted_outlier_rejection():
    rng = np.random.RandomState(1)
    pts3d, pts2d, aa_gt, t_gt = _synthetic_case(rng, B=1)
    pts2d_bad = pts2d.copy()
    pts2d_bad[0, :4] += 200.0  # gross outliers
    w = np.ones(pts3d.shape[:2], np.float32)
    w[0, :4] = 0.0
    res = estimate_camera_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d_bad),
                              jnp.asarray(w), iters=20)
    np.testing.assert_allclose(np.asarray(res.translation), t_gt, atol=0.05)


def test_lm_pnp_4dof_keeps_rotation_axes_frozen():
    rng = np.random.RandomState(2)
    pts3d, pts2d, aa_gt, t_gt = _synthetic_case(rng, B=2)
    res = lm_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d),
                 jnp.ones(pts3d.shape[:2]), 548.0,
                 jnp.asarray([256.0, 256.0]), dof=4, iters=15)
    aa = np.asarray(res.rotation_aa)
    assert np.allclose(aa[:, 0], 0.0) and np.allclose(aa[:, 2], 0.0)


def test_lm_pnp_differentiable():
    rng = np.random.RandomState(3)
    pts3d, pts2d, _, _ = _synthetic_case(rng, B=1)

    def loss(p3):
        res = estimate_camera_pnp(p3, jnp.asarray(pts2d),
                                  jnp.ones(p3.shape[:2]), iters=3)
        return jnp.sum(res.translation ** 2)

    g = jax.grad(loss)(jnp.asarray(pts3d))
    assert np.isfinite(np.asarray(g)).all()
