"""Pose priors: GMM max-mixture prior + SMPLify angle prior.

Parity: `romp/lib/loss_funcs/prior_loss.py:160-260` (MaxMixturePrior over
69-dim body pose, merged min-over-components NLL with sqrdet-normalized
weights) and `:114` (exponential bend prior on knees/elbows).

The GMM parameters ship with the reference as gmm_08.pkl; load from that
pickle or from a packed npz; a moment-matched synthetic GMM is provided for
tests and for training-from-scratch when the asset is absent.
"""
from __future__ import annotations

import dataclasses
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

POSE_DIM = 69


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GmmPrior:
    means: jax.Array        # (K, 69)
    precisions: jax.Array   # (K, 69, 69)
    nll_weights: jax.Array  # (K,)

    def tree_flatten(self):
        return (self.means, self.precisions, self.nll_weights), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def from_gmm_arrays(means: np.ndarray, covs: np.ndarray,
                        weights: np.ndarray) -> "GmmPrior":
        precisions = np.stack([np.linalg.inv(c) for c in covs])
        sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
        const = (2 * np.pi) ** (POSE_DIM / 2.0)
        nll_w = weights / (const * (sqrdets / sqrdets.min()))
        return GmmPrior(jnp.asarray(means, jnp.float32),
                        jnp.asarray(precisions, jnp.float32),
                        jnp.asarray(nll_w, jnp.float32))

    @staticmethod
    def load(path: str) -> "GmmPrior":
        if path.endswith(".npz"):
            d = np.load(path)
            return GmmPrior.from_gmm_arrays(d["means"], d["covars"],
                                            d["weights"])
        with open(path, "rb") as f:
            gmm = pickle.load(f, encoding="latin1")
        if not isinstance(gmm, dict):
            gmm = {"means": gmm.means_, "covars": gmm.covars_,
                   "weights": gmm.weights_}
        return GmmPrior.from_gmm_arrays(
            np.asarray(gmm["means"]), np.asarray(gmm["covars"]),
            np.asarray(gmm["weights"]))

    @staticmethod
    def synthetic(num_gaussians: int = 8, seed: int = 0) -> "GmmPrior":
        rng = np.random.RandomState(seed)
        means = rng.randn(num_gaussians, POSE_DIM).astype(np.float32) * 0.2
        covs = []
        for _ in range(num_gaussians):
            a = rng.randn(POSE_DIM, POSE_DIM) * 0.05
            covs.append(a @ a.T + np.eye(POSE_DIM) * 0.3)
        weights = rng.dirichlet(np.ones(num_gaussians))
        return GmmPrior.from_gmm_arrays(means, np.stack(covs), weights)


def gmm_prior_nll(prior: GmmPrior, body_pose: jax.Array) -> jax.Array:
    """Merged max-mixture NLL (`prior_loss.py:232-246`).

    body_pose: (N, <=69) axis-angle body pose (no global orient). Returns
    (N,) min-over-components negative log likelihood.
    """
    d = body_pose.shape[-1]
    diff = body_pose[:, None, :] - prior.means[None, :, :d]
    prec = prior.precisions[:, :d, :d]
    quad = jnp.einsum("nkj,kji,nki->nk", diff, prec, diff)
    ll = 0.5 * quad - jnp.log(prior.nll_weights)[None]
    return jnp.min(ll, axis=1)


def gmm_prior_loss(prior: GmmPrior, body_pose: jax.Array,
                   person_w: jax.Array,
                   valuable_thresh: float = 5.0) -> jax.Array:
    """The reference divides by 100 and zeroes values below 5
    (`calc_loss.py:152-157`)."""
    nll = gmm_prior_nll(prior, body_pose) / 100.0
    nll = jnp.where(nll < valuable_thresh, 0.0, nll)
    return jnp.sum(nll * person_w) / (jnp.sum(person_w) + 1e-6)


def angle_prior(pose: jax.Array) -> jax.Array:
    """SMPLify bend prior (`prior_loss.py:114-120`): penalize hyperextended
    knees/elbows via exp of signed rotation components, squared.

    pose: (N, 72|66) full axis-angle. Returns (N,).
    """
    # components 55, 58 (elbows z), 12, 15 (knees x) with signs +,-,-,-
    comps = jnp.stack([pose[:, 55], -pose[:, 58], -pose[:, 12],
                       -pose[:, 15]], axis=-1)
    return jnp.sum(jnp.exp(comps) ** 2, axis=-1)
