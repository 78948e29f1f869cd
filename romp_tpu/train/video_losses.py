"""TRACE temporal/video training losses — masked fixed-(N, T) formulations.

Parity targets (`trace/lib/loss_funcs/video_loss.py`):
- quaternion world-rotation loss (:36-60)
- world-translation consistency between frame pairs (:101-128,:251-266)
- temporal shape consistency across a trajectory (:193-208)
- 3D motion-offset supervision from GT trajectories (:389-400)
- velocity/acceleration error (:210-226)

All losses take (N, T, ...) per-track clip tensors + (N, T) validity masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from romp_tpu.ops.rotations import axis_angle_to_matrix, matrix_to_quaternion


def _safe_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """norm with finite gradient at 0 (plain norm backprops NaN at exactly
    zero differences, which occur on masked/diagonal pairs)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)


def _pair_mask(valid: jax.Array) -> jax.Array:
    """(N, T) -> (N, T, T) valid frame-pair mask, diagonal removed."""
    T = valid.shape[1]
    m = valid[:, :, None] & valid[:, None, :]
    return m & ~jnp.eye(T, dtype=bool)[None]


def quaternion_angle_loss(pred_aa: jax.Array, gt_aa: jax.Array,
                          w: jax.Array) -> jax.Array:
    """Geodesic angle between predicted/GT rotations (axis-angle inputs).

    pred_aa/gt_aa: (..., 3); w: (...) weights. Mirrors quaternion_loss
    (video_loss.py:36-60) via 2*acos(|<q1,q2>|) (sign-invariant).
    """
    qp = matrix_to_quaternion(axis_angle_to_matrix(pred_aa))
    qg = matrix_to_quaternion(axis_angle_to_matrix(gt_aa))
    dot = jnp.clip(jnp.abs(jnp.sum(qp * qg, axis=-1)), 0.0, 1.0 - 1e-7)
    ang = 2.0 * jnp.arccos(dot)
    return jnp.sum(ang * w) / (jnp.sum(w) + 1e-6)


def world_trans_consistency_loss(pred_trans: jax.Array, gt_trans: jax.Array,
                                 valid: jax.Array) -> jax.Array:
    """Relative world-translation consistency: for every valid frame pair
    (i, j) of a track, pred displacement must match GT displacement
    (video_loss.py:101-128 — supervising differences removes the arbitrary
    world origin)."""
    pm = _pair_mask(valid).astype(pred_trans.dtype)
    dp = pred_trans[:, :, None] - pred_trans[:, None, :]
    dg = gt_trans[:, :, None] - gt_trans[:, None, :]
    err = _safe_norm(dp - dg)
    return jnp.sum(err * pm) / (jnp.sum(pm) + 1e-6)


def temporal_shape_consistency_loss(pred_betas: jax.Array,
                                    valid: jax.Array) -> jax.Array:
    """Betas of one subject should not change across the clip
    (video_loss.py:193-208)."""
    pm = _pair_mask(valid).astype(pred_betas.dtype)
    d = _safe_norm(pred_betas[:, :, None] - pred_betas[:, None, :])
    return jnp.sum(d * pm) / (jnp.sum(pm) + 1e-6)


def motion_offset3d_loss(pred_offsets: jax.Array, traj3d_gt: jax.Array,
                         valid: jax.Array) -> jax.Array:
    """Supervise predicted last->current 3D motion offsets with GT
    trajectory differences (video_loss.py:389-400). Frame 0 has no previous
    frame and is excluded."""
    gt_off = traj3d_gt[:, 1:] - traj3d_gt[:, :-1]
    w = (valid[:, 1:] & valid[:, :-1]).astype(pred_offsets.dtype)
    err = _safe_norm(pred_offsets[:, 1:] - gt_off)
    return jnp.sum(err * w) / (jnp.sum(w) + 1e-6)


def vel_acc_error(gt_seq: jax.Array, pred_seq: jax.Array,
                  valid: jax.Array) -> jax.Array:
    """Velocity + acceleration discrepancy (video_loss.py:210-226)."""
    def vel(x):
        return x[:, 1:] - x[:, :-1]

    wv = (valid[:, 1:] & valid[:, :-1]).astype(pred_seq.dtype)
    v_err = _safe_norm(vel(pred_seq) - vel(gt_seq))
    l_v = jnp.sum(v_err * wv) / (jnp.sum(wv) + 1e-6)
    wa = (valid[:, 2:] & valid[:, 1:-1] & valid[:, :-2]).astype(pred_seq.dtype)
    acc = lambda x: x[:, 2:] - 2 * x[:, 1:-1] + x[:, :-2]
    a_err = _safe_norm(acc(pred_seq) - acc(gt_seq))
    l_a = jnp.sum(a_err * wa) / (jnp.sum(wa) + 1e-6)
    return l_v + l_a
