"""Batched 3D rotation representation conversions (jittable, shape-polymorphic).

Conventions match the reference implementation numerically so that parity
tests pass bit-for-tolerance:
- axis-angle -> matrix: `simple_romp/romp/smpl.py:191` (batch_rodrigues)
- 6D -> matrix: `simple_romp/romp/utils.py` rot6d_to_rotmat (Gram-Schmidt on
  the two column vectors, columns stacked as [b1 b2 b1xb2])
- matrix -> axis-angle: `simple_romp/romp/utils.py` kornia-style
  rotation_matrix_to_quaternion + quaternion_to_angle_axis.

All functions accept arbitrary leading batch dims and operate on the trailing
representation dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Matches reference `batch_rodrigues` (`simple_romp/romp/smpl.py:191`):
    the angle is computed as ||aa + 1e-8|| (elementwise epsilon on the vector
    itself, a quirk kept for numerical parity), and the axis as aa / angle.
    """
    batch_shape = aa.shape[:-1]
    aa = aa.reshape(-1, 3)
    angle = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)  # (N, 1)
    axis = aa / angle
    cos = jnp.cos(angle)[..., None]  # (N, 1, 1)
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(-1, 3, 3)
    # Closed form: for unit axis r, K^2 = r r^T - I, so
    # R = I + sin K + (1-cos)(r r^T - I). The outer product keeps the whole
    # conversion elementwise (VPU), independent of MXU matmul precision.
    outer = axis[:, :, None] * axis[:, None, :]
    ident = jnp.eye(3, dtype=aa.dtype)
    rot = ident + sin * K + (1.0 - cos) * (outer - ident)
    return rot.reshape(*batch_shape, 3, 3)


def rot6d_to_matrix(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation -> (..., 3, 3) matrix.

    Input trailing dim 6 is interpreted as a (3, 2) column pair, exactly as
    the reference `rot6d_to_rotmat` (`simple_romp/romp/utils.py`): columns are
    orthonormalized by Gram-Schmidt and completed with a cross product.
    torch.nn.functional.normalize clamps the denominator with max(norm, eps);
    we reproduce that (eps=1e-6).
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]

    def _normalize(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, 1e-6)

    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    rot = jnp.stack([b1, b2, b3], axis=-1)  # columns
    return rot.reshape(*batch_shape, 3, 3)


def matrix_to_quaternion(R: jax.Array, eps: float = 1e-6) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) quaternion (w, x, y, z).

    Branch-free port of the 4-case algorithm used by the reference
    (`simple_romp/romp/utils.py` rotation_matrix_to_quaternion, from kornia):
    case selection by trace/diagonal comparisons, implemented with jnp.where
    so the whole conversion stays on device.
    """
    batch_shape = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    # The reference operates on the TRANSPOSE of the input matrix.
    m = jnp.swapaxes(R, -1, -2)
    m00, m01, m02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    m10, m11, m12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    m20, m21, m22 = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]

    mask_d2 = m22 < eps
    mask_d0_d1 = m00 > m11
    mask_d0_nd1 = m00 < -m11

    t0 = 1.0 + m00 - m11 - m22
    q0 = jnp.stack([m12 - m21, t0, m01 + m10, m20 + m02], axis=-1)
    t1 = 1.0 - m00 + m11 - m22
    q1 = jnp.stack([m20 - m02, m01 + m10, t1, m12 + m21], axis=-1)
    t2 = 1.0 - m00 - m11 + m22
    q2 = jnp.stack([m01 - m10, m20 + m02, m12 + m21, t2], axis=-1)
    t3 = 1.0 + m00 + m11 + m22
    q3 = jnp.stack([t3, m12 - m21, m20 - m02, m01 - m10], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)[:, None]
    c1 = (mask_d2 & ~mask_d0_d1)[:, None]
    c2 = (~mask_d2 & mask_d0_nd1)[:, None]
    q = jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))
    t = jnp.where(
        c0[:, 0], t0, jnp.where(c1[:, 0], t1, jnp.where(c2[:, 0], t2, t3))
    )
    q = q * (0.5 / jnp.sqrt(t))[:, None]
    return q.reshape(*batch_shape, 4)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3) axis-angle.

    Ceres-style conversion as in the reference `quaternion_to_angle_axis`
    (`simple_romp/romp/utils.py`), with the sin(theta)==0 branch returning
    k=2 and NaNs flushed to zero (the reference does `aa[isnan(aa)] = 0`).
    """
    q1, q2, q3 = q[..., 1], q[..., 2], q[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(sin_sq)
    cos_theta = q[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    # Avoid 0/0 producing NaN under jit: guard the denominator, then select.
    k_pos = two_theta / jnp.where(sin_theta > 0.0, sin_theta, 1.0)
    k = jnp.where(sin_sq > 0.0, k_pos, 2.0)
    aa = jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)
    return jnp.nan_to_num(aa)


def matrix_to_axis_angle(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3), via quaternion (reference-parity path)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def rot6d_to_axis_angle(x: jax.Array) -> jax.Array:
    """(..., J*6) flat 6D rotations -> (..., J*3) flat axis-angle.

    Mirrors reference `rot6D_to_angular` (`simple_romp/romp/utils.py`).
    """
    batch_shape = x.shape[:-1]
    n_joint = x.shape[-1] // 6
    R = rot6d_to_matrix(x.reshape(*batch_shape, n_joint, 6))
    aa = matrix_to_axis_angle(R)
    return aa.reshape(*batch_shape, n_joint * 3)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(*q.shape[:-1], 3, 3)


def matrix_to_rot6d(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two COLUMNS, flattened row-major.

    Inverse of `rot6d_to_matrix` for ground-truth encoding in training.
    """
    return R[..., :, :2].reshape(*R.shape[:-2], 6)
