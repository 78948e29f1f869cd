"""EProPnP Monte-Carlo pose-distribution layer — JAX AMIS on the LM core.

Parity target: `trace/lib/epropnp/epropnp.py:36` (EProPnPBase
.monte_carlo_forward) and the 4DoF specialization (`:199` EProPnP4DoF):
adaptive multiple importance sampling (AMIS) over the pose posterior
p(y) ∝ exp(-cost(y)) defined by weighted 2D-3D correspondences. Each
iteration draws pose samples from the current proposal, evaluates the
reprojection cost, computes balance-heuristic mixture log-weights over ALL
iterations' proposals, and refits the proposal from the weighted samples.

TPU-native deltas (documented, not semantic):
- fixed num_iter/iter_samples, everything fixed-shape under jit;
- the yaw proposal is a wrapped-normal + uniform mixture instead of the
  reference's von-Mises + uniform (`epropnp.py:206`): AMIS is correct for
  any proposal family with matching sampler/log_prob, and the wrapped
  normal samples with pure `jax.random.normal` (no rejection loop);
- translation proposal is the same multivariate Student-t (df=3).

Pose parameterization (4DoF): [tx, ty, tz, yaw] with yaw the rotation
about the y axis (`epropnp.py:202`).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from romp_tpu.ops.pnp import lm_pnp, _residuals

_DF = 3.0          # Student-t degrees of freedom (epropnp.py:205)
_UNIFORM_MIX = 0.25  # uniform share of the yaw proposal (epropnp.py:206)


class MCPnPResult(NamedTuple):
    pose_opt: jax.Array              # (B, 4) LM solution [t(3), yaw]
    pose_samples: jax.Array          # (S, B, 4)
    sample_logweights: jax.Array     # (S, B) importance log-weights
    cost_opt: jax.Array              # (B,)


# ------------------------------ proposal distributions (sampler + logpdf) --

def _mvt_sample(key, mode, cov_tril, shape):
    """Multivariate Student-t(df=3): mode (B, 3), cov_tril (B, 3, 3)."""
    kz, kg = jax.random.split(key)
    z = jax.random.normal(kz, shape + mode.shape)          # (..., B, 3)
    g = jax.random.gamma(kg, _DF / 2.0, shape + mode.shape[:-1]) \
        / (_DF / 2.0)                                       # chi2/df
    scale = jnp.sqrt(1.0 / jnp.maximum(g, 1e-12))[..., None]
    return mode + jnp.einsum("bij,...bj->...bi", cov_tril, z) * scale


def _mvt_logprob(x, mode, cov_tril):
    """log pdf of multivariate t (df=3, dim=3). x: (..., B, 3)."""
    d = 3.0
    diff = x - mode
    tril_b = jnp.broadcast_to(cov_tril, diff.shape[:-1] + (3, 3))
    sol = jax.scipy.linalg.solve_triangular(
        tril_b, diff[..., None], lower=True)[..., 0]
    maha = jnp.sum(sol ** 2, axis=-1)
    logdet = jnp.sum(jnp.log(jnp.abs(
        jnp.diagonal(cov_tril, axis1=-2, axis2=-1))), -1)
    const = (math.lgamma((_DF + d) / 2.0) - math.lgamma(_DF / 2.0)
             - 0.5 * d * math.log(_DF * math.pi))
    return (const - logdet
            - 0.5 * (_DF + d) * jnp.log1p(maha / _DF))


def _yaw_sample(key, mode, sigma, shape):
    """Wrapped-normal + uniform mix over (-pi, pi]. mode/sigma: (B,)."""
    ku, kn, kc = jax.random.split(key, 3)
    norm = mode + sigma * jax.random.normal(kn, shape + mode.shape)
    norm = jnp.mod(norm + math.pi, 2.0 * math.pi) - math.pi
    unif = jax.random.uniform(ku, shape + mode.shape,
                              minval=-math.pi, maxval=math.pi)
    pick_u = jax.random.uniform(kc, shape + mode.shape) < _UNIFORM_MIX
    return jnp.where(pick_u, unif, norm)


def _yaw_logprob(x, mode, sigma):
    """log pdf of the wrapped-normal(+uniform) yaw proposal; wrap sum over
    k in [-2, 2] is exact to ~1e-8 for sigma < 1.5."""
    ks = jnp.arange(-2, 3, dtype=x.dtype) * (2.0 * math.pi)
    d = x[..., None] - mode[..., None] + ks
    log_norm = jax.scipy.special.logsumexp(
        -0.5 * (d / sigma[..., None]) ** 2
        - jnp.log(sigma[..., None] * math.sqrt(2.0 * math.pi)), axis=-1)
    log_unif = jnp.full_like(x, -math.log(2.0 * math.pi))
    return jnp.logaddexp(log_norm + math.log(1.0 - _UNIFORM_MIX),
                         log_unif + math.log(_UNIFORM_MIX))


def _pose_cost(pose, pts3d, pts2d, w, focal, center):
    """Weighted squared reprojection cost of 4DoF poses.

    pose: (..., B, 4); returns (..., B). The reference wraps this in an
    adaptive Huber (`cost_fun`); squared error is its quadratic regime.
    """
    yaw = pose[..., 3]
    aa = jnp.stack([jnp.zeros_like(yaw), yaw, jnp.zeros_like(yaw)], -1)
    params = jnp.concatenate([aa, pose[..., :3]], -1)
    flat = params.reshape(-1, 6)
    rep = lambda a: jnp.broadcast_to(
        a, pose.shape[:-2] + a.shape).reshape(-1, *a.shape[1:])
    r = _residuals(flat, rep(pts3d), rep(pts2d), rep(w), focal, center)
    return 0.5 * jnp.sum(r ** 2, -1).reshape(pose.shape[:-1])


def _weighted_refit(samples, logweights):
    """MLE-ish proposal refit from weighted samples
    (`epropnp.py:238` estimate_params).

    samples: (S, B, 4); logweights: (S, B). Returns mode (B,3), cov_tril
    (B,3,3), yaw_mode (B,), yaw_sigma (B,).
    """
    w = jax.nn.softmax(logweights, axis=0)[..., None]        # (S, B, 1)
    t = samples[..., :3]
    mean = jnp.sum(w * t, axis=0)
    diff = t - mean
    cov = jnp.einsum("sbi,sbj,sb->bij", diff, diff, w[..., 0])
    cov = cov + jnp.eye(3) * 1e-6
    tril = jnp.linalg.cholesky(cov)
    yaw = samples[..., 3]
    c = jnp.sum(w[..., 0] * jnp.cos(yaw), axis=0)
    s = jnp.sum(w[..., 0] * jnp.sin(yaw), axis=0)
    yaw_mode = jnp.arctan2(s, c)
    r = jnp.clip(jnp.sqrt(c ** 2 + s ** 2), 1e-6, 1.0 - 1e-6)
    yaw_sigma = jnp.sqrt(-2.0 * jnp.log(r))                  # wrapped-normal
    return mean, tril, yaw_mode, jnp.clip(yaw_sigma, 0.02, 2.0)


def monte_carlo_pnp(key: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
                    weights: jax.Array, focal: float, center: jax.Array,
                    mc_samples: int = 128, num_iter: int = 4,
                    lm_iters: int = 10) -> MCPnPResult:
    """AMIS sampling of the 4DoF pose posterior (epropnp.py:88
    monte_carlo_forward). pts3d: (B, N, 3); pts2d: (B, N, 2) px;
    weights: (B, N). Returns the LM mode + weighted pose samples.
    """
    assert mc_samples % num_iter == 0
    S = mc_samples // num_iter
    B = pts3d.shape[0]

    sol = lm_pnp(pts3d, pts2d, weights, focal, center, iters=lm_iters,
                 dof=4)
    yaw0 = sol.rotation_aa[:, 1]
    pose_opt = jnp.concatenate([sol.translation, yaw0[:, None]], -1)

    # initial proposal from the LM solution (initial_fit, epropnp.py:216):
    # a diagonal covariance scaled like cholesky_wrapper's [1, 1, 4] prior.
    cost_fn = lambda p: _pose_cost(p, pts3d, pts2d, weights, focal, center)
    depth = jnp.maximum(sol.translation[:, 2], 0.5)
    diag0 = 0.05 * depth[:, None] * jnp.asarray([1.0, 1.0, 4.0])  # (B, 3)
    tril0 = jnp.eye(3)[None] * diag0[:, None, :]
    modes = [sol.translation]
    trils = [tril0]
    yaw_modes = [yaw0]
    yaw_sigmas = [jnp.full((B,), 0.3)]

    all_samples = []          # per-iter (S, B, 4)
    all_costs = []            # per-iter (S, B)
    for i in range(num_iter):
        key, ks = jax.random.split(key)
        t_s = _mvt_sample(ks, modes[i], trils[i], (S,))
        key, ky = jax.random.split(key)
        y_s = _yaw_sample(ky, yaw_modes[i], yaw_sigmas[i], (S,))
        samples_i = jnp.concatenate([t_s, y_s[..., None]], -1)
        all_samples.append(samples_i)
        all_costs.append(cost_fn(samples_i))

        if i == num_iter - 1:
            break
        # balance-heuristic mixture weights over proposals 0..i for refit
        samp = jnp.stack(all_samples)                  # (i+1, S, B, 4)
        lp = []
        for j in range(i + 1):
            lp.append(_mvt_logprob(samp[..., :3], modes[j], trils[j])
                      + _yaw_logprob(samp[..., 3], yaw_modes[j],
                                     yaw_sigmas[j]))
        mix = jax.scipy.special.logsumexp(jnp.stack(lp), axis=0) \
            - math.log(i + 1)                          # (i+1, S, B)
        lw = (-jnp.stack(all_costs) - mix).reshape(-1, B)
        m, tr, ym, ysig = _weighted_refit(samp.reshape(-1, B, 4), lw)
        modes.append(m)
        trils.append(tr)
        yaw_modes.append(ym)
        yaw_sigmas.append(ysig)

    samp = jnp.stack(all_samples)                      # (num_iter, S, B, 4)
    lp = []
    for j in range(num_iter):
        lp.append(_mvt_logprob(samp[..., :3], modes[j], trils[j])
                  + _yaw_logprob(samp[..., 3], yaw_modes[j], yaw_sigmas[j]))
    mix = jax.scipy.special.logsumexp(jnp.stack(lp), axis=0) \
        - math.log(num_iter)
    logweights = (-jnp.stack(all_costs) - mix).reshape(mc_samples, B)
    return MCPnPResult(pose_opt, samp.reshape(mc_samples, B, 4),
                       logweights, sol.cost)


def monte_carlo_pose_loss(logweights: jax.Array, pose_samples: jax.Array,
                          pose_gt: jax.Array, cost_gt: jax.Array
                          ) -> jax.Array:
    """The EProPnP Monte-Carlo pose NLL (KL surrogate): cost(y_gt) +
    log of the self-normalized partition estimate
    (`trace/lib/epropnp/monte_carlo_pose_loss.py`). logweights: (S, B)."""
    log_z = jax.scipy.special.logsumexp(logweights, axis=0) \
        - math.log(logweights.shape[0])
    return jnp.mean(cost_gt + log_z)
