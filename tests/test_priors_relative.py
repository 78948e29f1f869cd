"""Tests for GMM pose prior, angle prior, and relative (depth/age) losses."""
import numpy as np
import pytest

import jax.numpy as jnp

from romp_tpu.train.priors import (
    GmmPrior, angle_prior, gmm_prior_loss, gmm_prior_nll,
)
from romp_tpu.train.loss_merger import clamp_loss, merge_losses
from romp_tpu.train.relative_losses import (
    age_group_loss, kid_offset_loss, relative_depth_loss,
)

torch = pytest.importorskip("torch")


def test_gmm_prior_matches_reference_formula():
    """Oracle: the reference merged_log_likelihood math re-run in torch
    (`prior_loss.py:232-246`) with the same synthetic GMM."""
    prior = GmmPrior.synthetic(num_gaussians=4, seed=0)
    rng = np.random.RandomState(1)
    pose = rng.randn(6, 69).astype(np.float32) * 0.3

    means = torch.from_numpy(np.asarray(prior.means))
    precs = torch.from_numpy(np.asarray(prior.precisions))
    nll_w = torch.from_numpy(np.asarray(prior.nll_weights))
    p = torch.from_numpy(pose)
    diff = p.unsqueeze(1) - means
    prod = torch.einsum("mij,bmj->bmi", precs, diff)
    quad = (prod * diff).sum(-1)
    ref = (0.5 * quad - torch.log(nll_w[None])).min(dim=1).values

    ours = gmm_prior_nll(prior, jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)


def test_gmm_prior_prefers_mean_pose():
    prior = GmmPrior.synthetic(seed=0)
    near = np.asarray(prior.means)[0:1]
    far = near + 5.0
    nll_near = float(gmm_prior_nll(prior, jnp.asarray(near))[0])
    nll_far = float(gmm_prior_nll(prior, jnp.asarray(far))[0])
    assert nll_near < nll_far
    # thresholded loss: small NLL is zeroed
    w = jnp.ones(1)
    assert float(gmm_prior_loss(prior, jnp.asarray(near), w)) == 0.0


def test_angle_prior_penalizes_hyperextension():
    pose = np.zeros((2, 72), np.float32)
    pose[1, 55] = 2.0  # bent-backwards elbow
    ap = np.asarray(angle_prior(jnp.asarray(pose)))
    assert ap[1] > ap[0]


def test_relative_depth_loss_ordering():
    # person 0 annotated closer (layer 0) than person 1 (layer 1)
    ids = jnp.asarray([[0, 1, -1]])
    mask = jnp.asarray([[True, True, True]])
    good = jnp.asarray([[1.0, 3.0, 9.9]])   # correct order, margin ok
    bad = jnp.asarray([[3.0, 1.0, 9.9]])    # inverted
    l_good = float(relative_depth_loss(good, ids, mask))
    l_bad = float(relative_depth_loss(bad, ids, mask))
    assert l_good == 0.0
    assert l_bad > 1.0
    # equal layers pull depths together
    ids_eq = jnp.asarray([[0, 0, -1]])
    l_eq = float(relative_depth_loss(jnp.asarray([[1.0, 2.0, 0.0]]),
                                     ids_eq, mask))
    np.testing.assert_allclose(l_eq, 1.0, rtol=1e-5)


def test_age_and_kid_offset_losses():
    mask = jnp.asarray([[True, True, True, True]])
    ages = jnp.asarray([[0, 3, 1, -1]])
    offsets = jnp.asarray([[0.1, 0.9, 0.6, 0.5]])
    # adult(0..0.25) ok, baby(0.75..1) ok, teen(0.25..0.5) violated by 0.1
    loss = float(age_group_loss(offsets, ages, mask))
    np.testing.assert_allclose(loss, (0.1 ** 2) / 3, rtol=1e-4)

    gt_off = jnp.asarray([[0.2, -1.0, 0.6, -1.0]])
    ko = float(kid_offset_loss(offsets, gt_off, mask))
    np.testing.assert_allclose(ko, ((0.1 - 0.2) ** 2) / 2, rtol=1e-4)


def test_clamp_loss_preserves_gradient_direction():
    """Reference semantics (`learnable_loss.py:53-56`): an exploding loss is
    rescaled to loss_thresh but keeps a (scaled-down) gradient — not a hard
    min that would zero the gradient."""
    import jax

    assert float(clamp_loss(jnp.asarray(5.0), 1000.0)) == 5.0
    assert abs(float(clamp_loss(jnp.asarray(1e9), 1000.0)) - 1000.0) < 1e-3
    # NaN losses are dropped (contribute 0), matching :52
    assert float(clamp_loss(jnp.asarray(float("nan")), 1000.0)) == 0.0

    g_small = jax.grad(lambda x: clamp_loss(x ** 2, 1000.0))(jnp.asarray(2.0))
    g_big = jax.grad(lambda x: clamp_loss(x ** 2, 1000.0))(jnp.asarray(1e4))
    np.testing.assert_allclose(float(g_small), 4.0, rtol=1e-5)
    assert float(g_big) > 0.0  # direction kept, magnitude scaled


def test_merge_losses_groups_and_warmup():
    d = {"centermap": jnp.asarray(2.0), "mpjpe": jnp.asarray(3.0),
         "prior": jnp.asarray(1.0), "rdepth": jnp.asarray(0.5),
         "custom": jnp.asarray(0.25)}
    total, m = merge_losses(d)
    np.testing.assert_allclose(float(total), 6.75, rtol=1e-6)
    np.testing.assert_allclose(float(m["task_det"]), 2.0)
    np.testing.assert_allclose(float(m["task_reg"]), 4.0)
    np.testing.assert_allclose(float(m["task_rel"]), 0.5)
    np.testing.assert_allclose(float(m["task_others"]), 0.25)

    # det-only warmup (`learnable_loss.py:45-47`): only detection losses
    # train; the 3D centermap is scaled by 1/1000
    d3 = {**d, "centermap3d": jnp.asarray(500.0)}
    total_w, m_w = merge_losses(d3, new_training=True)
    np.testing.assert_allclose(float(total_w), 2.0 + 0.5, rtol=1e-6)
    assert float(m_w["task_reg"]) > 0  # still reported for logging
