"""BEV relative supervision: ordinal depth, age groups, kid-shape offsets.

Parity: `romp/lib/loss_funcs/relative_loss.py` — piecewise depth-ordering
loss over annotated person pairs (:46-95), age-group classification of the
kid offset (the 11th beta), and direct kid-offset regression. All masked
fixed-(B, P) formulations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Age groups: adult=0, teen=1, kid=2, baby=3; kid-offset bin edges.
AGE_THRESHOLDS = (0.25, 0.5, 0.75)


def relative_depth_loss(pred_depths: jax.Array, depth_ids: jax.Array,
                        mask: jax.Array,
                        dist_thresh: float = 0.3) -> jax.Array:
    """Piecewise ordinal depth loss.

    pred_depths: (B, P) predicted depths; depth_ids: (B, P) integer ordinal
    depth layers, -1 if unannotated; mask: (B, P) person validity.
    For each annotated pair (i, j), i<j in the fixed slots:
      same layer   -> (d_i - d_j)^2
      i closer     -> softplus(d_i - d_j) once violating the margin
      i farther    -> softplus(d_j - d_i) once violating the margin
    """
    B, P = pred_depths.shape
    valid = mask & (depth_ids >= 0)
    pair_valid = (valid[:, :, None] & valid[:, None, :]
                  & jnp.triu(jnp.ones((P, P), bool), k=1)[None])
    dd = pred_depths[:, :, None] - pred_depths[:, None, :]     # d_i - d_j
    did = (depth_ids[:, :, None] - depth_ids[:, None, :]).astype(jnp.float32)

    eq = pair_valid & (did == 0)
    closer = pair_valid & (did < 0) & ((dd - did * dist_thresh) > 0)
    farther = pair_valid & (did > 0) & ((dd - did * dist_thresh) < 0)

    # softplus is the numerically-stable log(1+exp(.)); clip keeps extreme
    # (mis-)predicted depths from producing inf that would leak through the
    # unselected jnp.where branch.
    ddc = jnp.clip(dd, -50.0, 50.0)
    loss = (jnp.where(eq, ddc ** 2, 0.0)
            + jnp.where(closer, jax.nn.softplus(ddc), 0.0)
            + jnp.where(farther, jax.nn.softplus(-ddc), 0.0))
    n = jnp.sum(eq | closer | farther)
    return jnp.sum(loss) / (n + 1e-6)


def age_group_loss(kid_offsets: jax.Array, age_gts: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Hinge the predicted kid offset (11th beta) into its annotated age bin.

    age_gts: (B, P) in {0..3}, -1 unannotated. Bin ranges from
    AGE_THRESHOLDS; loss is squared distance to the bin interval.
    """
    edges_lo = jnp.asarray([0.0, *AGE_THRESHOLDS])
    edges_hi = jnp.asarray([*AGE_THRESHOLDS, 1.0])
    valid = mask & (age_gts >= 0)
    a = jnp.clip(age_gts, 0, 3)
    lo = edges_lo[a]
    hi = edges_hi[a]
    below = jnp.maximum(lo - kid_offsets, 0.0)
    above = jnp.maximum(kid_offsets - hi, 0.0)
    per = (below + above) ** 2
    return jnp.sum(jnp.where(valid, per, 0.0)) / (jnp.sum(valid) + 1e-6)


def kid_offset_loss(kid_offsets: jax.Array, gt_offsets: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Direct supervision where kid-shape offsets are annotated (>=0)."""
    valid = mask & (gt_offsets >= 0)
    per = (kid_offsets - gt_offsets) ** 2
    return jnp.sum(jnp.where(valid, per, 0.0)) / (jnp.sum(valid) + 1e-6)
