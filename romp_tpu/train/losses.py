"""Training losses — masked fixed-K formulations of the reference loss suite.

Reference semantics:
- CenterNet-style focal loss on center heatmaps:
  `romp/lib/loss_funcs/maps_loss.py:18-75` (2D + 3D)
- keypoint losses (visible-masked 2D L2, hip-aligned MPJPE, Procrustes-aligned
  PA-MPJPE): `romp/lib/loss_funcs/keypoints_loss.py`,
  `romp/lib/evaluation/evaluation_matrix.py:252` (batch Procrustes)
- SMPL parameter losses (axis-angle -> rotmat L2, PCA-weighted shape):
  `romp/lib/loss_funcs/params_loss.py:22`, `calc_loss.py:115-150`

The reference boolean-masks dynamic person subsets; here every loss takes a
(B*K,) validity weight so shapes stay static under jit/pjit. All losses
return scalars (weighted means).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from romp_tpu.ops.rotations import axis_angle_to_matrix

# PCA-variance weighting of betas (`calc_loss.py:34`)
SHAPE_PCA_WEIGHT = jnp.array(
    [1.0, 0.64, 0.32, 0.32, 0.16, 0.16, 0.16, 0.16, 0.16, 0.16])
# Hip joints of the 54-joint set used for MPJPE alignment (`calc_loss.py:33`).
ALIGN_INDS = (45, 46)


def _wmean(x: jax.Array, w: jax.Array, eps: float = 1e-6) -> jax.Array:
    return jnp.sum(x * w) / (jnp.sum(w) + eps)


def _safe_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """norm with a finite gradient at exactly-zero differences (masked
    entries would otherwise backprop NaN through sqrt'(0))."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)


def focal_heatmap_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """CenterNet focal loss. pred/gt: (B, ..., H, W)-like, any rank >= 3;
    reduces all non-batch axes, normalizes by per-image positive count.
    """
    pred = pred.reshape(pred.shape[0], -1)
    gt = gt.reshape(gt.shape[0], -1)
    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_w = (1.0 - gt) ** 4
    p = jnp.clip(pred, 1e-3, 1.0 - 1e-3)
    pos_loss = jnp.sum(jnp.log(p) * (1.0 - pred) ** 2 * pos, axis=-1)
    neg_loss = jnp.sum(jnp.log(1.0 - p) * pred ** 2 * neg_w * neg, axis=-1)
    num_pos = jnp.sum(pos, axis=-1)
    per_img = jnp.where(
        num_pos > 0,
        -(pos_loss + neg_loss) / (num_pos + 1e-4),
        -neg_loss,
    )
    return per_img.mean()


def kp2d_l2_loss(gt: jax.Array, pred: jax.Array,
                 person_w: jax.Array) -> jax.Array:
    """Visibility-masked 2D keypoint L2.

    gt: (N, J, 2) in [-1, 1] with invisible joints < -1.99 (reference
    convention: invalid kps set to -2); pred: (N, J, 2); person_w: (N,).
    """
    vis = (gt > -1.99).all(axis=-1).astype(pred.dtype)  # (N, J)
    d = _safe_norm(pred - gt)                           # (N, J)
    per_person = jnp.sum(d * vis, axis=-1) / (jnp.sum(vis, axis=-1) + 1e-6)
    return _wmean(per_person, person_w)


def mpjpe_loss(gt: jax.Array, pred: jax.Array, person_w: jax.Array,
               align_inds=ALIGN_INDS) -> jax.Array:
    """Hip-midpoint-aligned mean per-joint position error (meters).

    gt: (N, J, 3) with invalid joints at -2.0 exactly; pred: (N, J, 3).
    """
    def _align(x):
        return x - x[:, list(align_inds)].mean(axis=1, keepdims=True)

    valid_j = (gt != -2.0).any(axis=-1).astype(pred.dtype)
    ga, pa = _align(gt), _align(pred)
    d = _safe_norm(pa - ga)
    per_person = jnp.sum(d * valid_j, axis=-1) / (jnp.sum(valid_j, -1) + 1e-6)
    return _wmean(per_person, person_w)


def procrustes_align(gt: jax.Array, pred: jax.Array,
                     joint_w: Optional[jax.Array] = None) -> jax.Array:
    """Batched similarity (Procrustes) transform of pred onto gt.

    gt/pred: (N, J, 3). Returns aligned pred. Mirrors
    `evaluation_matrix.py:252` (batch_compute_similarity_transform_torch).
    joint_w: optional (N, J) per-joint validity weights — the alignment is
    solved on the weighted point sets (the reference boolean-indexes valid
    joints before Procrustes; weighting is the fixed-shape equivalent).
    """
    if joint_w is None:
        joint_w = jnp.ones(gt.shape[:2], gt.dtype)
    wn = (joint_w / (jnp.sum(joint_w, axis=1, keepdims=True) + 1e-8)
          )[..., None]                # (N, J, 1), rows sum to 1
    mu_g = jnp.sum(gt * wn, axis=1, keepdims=True)
    mu_p = jnp.sum(pred * wn, axis=1, keepdims=True)
    X = ((gt - mu_g) * wn).swapaxes(1, 2)      # (N, 3, J) weighted
    Y = (pred - mu_p).swapaxes(1, 2)
    Yw = ((pred - mu_p) * wn).swapaxes(1, 2)
    var_p = jnp.sum(Y * Yw, axis=(1, 2))
    K = X @ Y.swapaxes(1, 2)          # (N, 3, 3)
    # Degenerate persons (fewer than 3 valid joints -> K near-singular)
    # would make the SVD *gradient* NaN, and NaN * 0-weight still poisons
    # the whole backward pass. Route them through a fixed well-conditioned
    # matrix: the where() picks the constant branch, so their gradient
    # contribution is exactly zero; callers weight them out of the mean.
    ok = jnp.sum(joint_w, axis=1) >= 3
    K = jnp.where(ok[:, None, None], K,
                  jnp.diag(jnp.asarray([1.0, 2.0, 3.0], K.dtype))[None])
    var_p = jnp.where(ok, var_p, 1.0)
    U, s, Vh = jnp.linalg.svd(K)
    V = Vh.swapaxes(1, 2)
    det = jnp.linalg.det(U @ Vh)
    Z = jnp.tile(jnp.eye(3, dtype=U.dtype), (U.shape[0], 1, 1))
    Z = Z.at[:, 2, 2].set(det)
    R = U @ Z @ V.swapaxes(1, 2)
    scale = (jnp.trace(R @ K.swapaxes(1, 2), axis1=1, axis2=2)
             / (var_p + 1e-8))[:, None, None]
    t = mu_g.swapaxes(1, 2) - scale * (R @ mu_p.swapaxes(1, 2))
    aligned = scale * (R @ pred.swapaxes(1, 2)) + t
    return aligned.swapaxes(1, 2)


def pampjpe_loss(gt: jax.Array, pred: jax.Array,
                 person_w: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE. Invalid joints (gt == -2 exactly, the
    reference's set_minus convention) are excluded from both the alignment
    solve and the error mean; persons with fewer than 3 valid joints (an
    under-determined similarity fit) are dropped from the batch mean."""
    valid_j = (gt != -2.0).any(axis=-1).astype(pred.dtype)   # (N, J)
    aligned = procrustes_align(gt, pred, valid_j)
    d = _safe_norm(aligned - gt)
    per_person = jnp.sum(d * valid_j, -1) / (jnp.sum(valid_j, -1) + 1e-6)
    person_w = person_w * (jnp.sum(valid_j, -1) >= 3).astype(pred.dtype)
    return _wmean(per_person, person_w)


def pose_l2_loss(gt_aa: jax.Array, pred_aa: jax.Array,
                 person_w: jax.Array) -> jax.Array:
    """Geodesic-ish pose loss: L2 between rotation matrices of axis-angle
    params (`params_loss.py:22`). gt_aa/pred_aa: (N, J*3)."""
    N = gt_aa.shape[0]
    Rg = axis_angle_to_matrix(gt_aa.reshape(N, -1, 3))
    Rp = axis_angle_to_matrix(pred_aa.reshape(N, -1, 3))
    d = jnp.sqrt(jnp.sum((Rg - Rp) ** 2, axis=(-2, -1)) + 1e-12).mean(-1)
    return _wmean(d, person_w)


def shape_loss(gt_betas: Optional[jax.Array], pred_betas: jax.Array,
               person_w: jax.Array,
               has_gt: Optional[jax.Array] = None) -> jax.Array:
    """PCA-weighted shape supervision + L2 regularization for persons without
    beta annotations (`calc_loss.py:136-143`); both divided by 20."""
    reg = jnp.mean(pred_betas[:, :10] ** 2, axis=-1) / 20.0
    if gt_betas is None:
        return _wmean(reg, person_w)
    has_gt = jnp.ones_like(person_w) if has_gt is None else has_gt
    sup = jnp.linalg.norm(
        (gt_betas[:, :10] - pred_betas[:, :10]) * SHAPE_PCA_WEIGHT,
        axis=-1) / 20.0
    per = jnp.where(has_gt > 0, sup, reg)
    return _wmean(per, person_w)
