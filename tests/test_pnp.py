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


def test_mvt_and_yaw_logprob_against_scipy():
    """Proposal log-pdfs vs scipy oracles (multivariate t and the wrapped
    normal computed by direct summation)."""
    import scipy.stats as st

    from romp_tpu.ops.epropnp_mc import (
        _UNIFORM_MIX, _mvt_logprob, _yaw_logprob,
    )

    rng = np.random.RandomState(0)
    mode = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    A = rng.randn(2, 3, 3).astype(np.float32) * 0.3
    cov = A @ A.transpose(0, 2, 1) + np.eye(3)[None] * 0.5
    tril = jnp.asarray(np.linalg.cholesky(cov))
    x = jnp.asarray(rng.randn(5, 2, 3).astype(np.float32))
    ours = np.asarray(_mvt_logprob(x, mode, tril))
    for b in range(2):
        ref = st.multivariate_t(np.asarray(mode)[b], cov[b], df=3
                                ).logpdf(np.asarray(x)[:, b])
        np.testing.assert_allclose(ours[:, b], ref, rtol=1e-4)

    ymode = jnp.asarray([0.5, -2.0])
    ysig = jnp.asarray([0.4, 0.8])
    ys = jnp.asarray(rng.uniform(-np.pi, np.pi, (7, 2)).astype(np.float32))
    ours_y = np.asarray(_yaw_logprob(ys, ymode, ysig))
    for b in range(2):
        wn = 0.0
        for k in range(-6, 7):
            wn += st.norm(float(ymode[b]), float(ysig[b])).pdf(
                np.asarray(ys)[:, b] + 2 * np.pi * k)
        ref = np.log((1 - _UNIFORM_MIX) * wn + _UNIFORM_MIX / (2 * np.pi))
        np.testing.assert_allclose(ours_y[:, b], ref, rtol=1e-4)


def test_monte_carlo_pnp_posterior_concentrates_on_truth():
    """Synthetic 4DoF problem: the weighted sample mean must recover the
    true pose (EProPnP MC layer sanity, epropnp.py:88)."""
    import jax

    from romp_tpu.ops.epropnp_mc import monte_carlo_pnp
    from romp_tpu.ops.rotations import axis_angle_to_matrix

    rng = np.random.RandomState(1)
    B, N = 2, 24
    pts3d = rng.randn(B, N, 3).astype(np.float32) * 0.4
    yaw_true = np.array([0.3, -0.5], np.float32)
    t_true = np.array([[0.2, -0.1, 4.0], [-0.3, 0.2, 5.0]], np.float32)
    f, c = 500.0, jnp.asarray([256.0, 256.0])
    aa = np.zeros((B, 3), np.float32)
    aa[:, 1] = yaw_true
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t_true[:, None]
    pts2d = cam[..., :2] / cam[..., 2:] * f + np.asarray(c)

    res = monte_carlo_pnp(jax.random.PRNGKey(0), jnp.asarray(pts3d),
                          jnp.asarray(pts2d), jnp.ones((B, N)), f, c,
                          mc_samples=256, num_iter=4)
    # LM mode close to truth
    np.testing.assert_allclose(np.asarray(res.pose_opt[:, :3]), t_true,
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(res.pose_opt[:, 3]), yaw_true,
                               atol=0.05)
    # importance weights must CONCENTRATE the cloud onto the posterior:
    # with exact correspondences the posterior is near-delta at truth, so
    # the weighted spread must collapse far below the proposal spread (the
    # weighted MEAN carries one-nearest-sample MC error, so it is only
    # loosely bounded — it can legitimately sit farther from truth than the
    # raw proposal mean, which is centered on the LM mode).
    w = np.asarray(jax.nn.softmax(res.sample_logweights, axis=0))
    samples = np.asarray(res.pose_samples)
    mean = (w[..., None] * samples).sum(0)
    err_w = np.linalg.norm(mean - np.concatenate(
        [t_true, yaw_true[:, None]], -1), axis=-1)
    assert (err_w < 0.5).all()
    var_w = (w[..., None] * (samples - mean) ** 2).sum(0).sum(-1)
    var_raw = samples.var(axis=0).sum(-1)
    assert (var_w < 0.25 * var_raw).all(), (var_w, var_raw)
    np.testing.assert_allclose(mean[:, 3], yaw_true, atol=0.2)
    assert np.isfinite(np.asarray(res.sample_logweights)).all()


def test_monte_carlo_pose_loss_prefers_good_fit():
    import jax

    from romp_tpu.ops.epropnp_mc import monte_carlo_pose_loss

    lw = jnp.asarray(np.random.RandomState(0).randn(64, 2))
    good = monte_carlo_pose_loss(lw, None, None, jnp.asarray([0.1, 0.1]))
    bad = monte_carlo_pose_loss(lw, None, None, jnp.asarray([50.0, 50.0]))
    assert float(bad) > float(good)
