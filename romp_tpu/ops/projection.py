"""Camera / projection utilities — batched, on-device.

Parity targets:
- weak-perspective projection: `simple_romp/romp/utils.py` batch_orth_proj
- input->original-image coordinate unmapping:
  `simple_romp/romp/post_parser.py:81-88`
- cam -> 3D translation: `simple_romp/romp/post_parser.py:90-94`
- camera-translation estimation: the reference solves a host-side cv2 PnP /
  numpy weighted least squares per person (`simple_romp/romp/utils.py`
  estimate_translation_np). That math IS a linear least-squares in the
  translation; we solve the 3x3 normal equations batched in jnp so the whole
  thing stays on device (cv2 kept as a test oracle only).
- perspective projection (BEV): `simple_romp/bev/post_parser.py:68-112`,
  focal length 443.4 (FOV 60 deg).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

FOCAL_LENGTH_BEV = 443.4
INVALID_TRANS = -1.0


def weak_perspective_projection(points: jax.Array, cam: jax.Array,
                                keep_dim: bool = False) -> jax.Array:
    """points: (..., N, 3); cam: (..., 3) = (s, tx, ty).

    Returns (..., N, 2) [or (..., N, 3) with original z when keep_dim].
    """
    s = cam[..., None, 0:1]
    t = cam[..., None, 1:3]
    xy = points[..., :2] * s + t
    if keep_dim:
        return jnp.concatenate([xy, points[..., 2:3]], axis=-1)
    return xy


def convert_to_org_image_coords(kps: jax.Array, pad_info: jax.Array,
                                ) -> jax.Array:
    """Map [-1,1] input-square coords back to original-image pixels.

    kps: (..., N, 2 or 3); pad_info: (6,) = (top, bottom, left, right, h, w)
    as produced by padding (`simple_romp/romp/utils.py:16-24`); unmapping as
    `post_parser.py:81-88`.
    """
    top, _, left = pad_info[0], pad_info[1], pad_info[2]
    h, w = pad_info[4], pad_info[5]
    size = jnp.maximum(h, w)
    x = (kps[..., 0] + 1.0) * size / 2.0 - left
    y = (kps[..., 1] + 1.0) * size / 2.0 - top
    out = [x, y]
    if kps.shape[-1] == 3:
        out.append((kps[..., 2] + 1.0) * size / 2.0)
    return jnp.stack(out, axis=-1)


def convert_to_org_image_coords_np(kps, pad_info):
    """Host-side numpy twin of convert_to_org_image_coords: the unmapping
    is a trivial affine, and doing it eagerly on a remote-tunneled device
    costs 3 round trips (upload, op, fetch) per tensor in the batch-1 CLI
    path."""
    import numpy as np

    kps = np.asarray(kps, np.float32)
    top, left = float(pad_info[0]), float(pad_info[2])
    size = float(max(pad_info[4], pad_info[5]))
    out = [(kps[..., 0] + 1.0) * size / 2.0 - left,
           (kps[..., 1] + 1.0) * size / 2.0 - top]
    if kps.shape[-1] == 3:
        out.append((kps[..., 2] + 1.0) * size / 2.0)
    return np.stack(out, axis=-1)


def cam_to_3d_trans(cam: jax.Array, weight: float = 2.0) -> jax.Array:
    """(s, tx, ty) -> rough 3D translation (dx, dy, depth) * weight."""
    s, tx, ty = cam[..., 0], cam[..., 1], cam[..., 2]
    return jnp.stack([tx / s, ty / s, 1.0 / s], axis=-1) * weight


def estimate_translation_lstsq(joints3d: jax.Array, joints2d: jax.Array,
                               weights: jax.Array,
                               focal_length: float = 443.4,
                               img_size: float = 512.0,
                               min_points: int = 4) -> jax.Array:
    """Weighted least-squares camera translation, batched.

    Solves for t = (tx, ty, tz) minimizing the linearized reprojection error
    f*(X+tx) - (u-cx)*(Z+tz) ~ 0 (and likewise for y), the same system the
    reference's estimate_translation_np builds row-by-row. Persons with fewer
    than `min_points` valid joints get INVALID_TRANS (= -1), matching
    `simple_romp/romp/utils.py` estimate_translation.

    joints3d: (B, N, 3); joints2d: (B, N, 2) in pixels; weights: (B, N)
    {0,1} validity. Returns (B, 3).
    """
    # img_size: float (square, principal point at center) or an (w, h)
    # pair for non-square intrinsics (e.g. the AGORA 1280x720 cameras).
    if isinstance(img_size, (tuple, list)):
        cx, cy = img_size[0] / 2.0, img_size[1] / 2.0
    else:
        cx = cy = img_size / 2.0
    f = focal_length
    X, Y, Z = joints3d[..., 0], joints3d[..., 1], joints3d[..., 2]
    u, v = joints2d[..., 0], joints2d[..., 1]

    # Rows for x: [f, 0, cx - u] t = (u - cx) Z - f X
    # Rows for y: [0, f, cy - v] t = (v - cy) Z - f Y
    zeros = jnp.zeros_like(u)
    fcol = jnp.full_like(u, f)
    Qx = jnp.stack([fcol, zeros, cx - u], axis=-1)      # (B, N, 3)
    Qy = jnp.stack([zeros, fcol, cy - v], axis=-1)
    cx_rhs = (u - cx) * Z - f * X                        # (B, N)
    cy_rhs = (v - cy) * Z - f * Y

    Q = jnp.concatenate([Qx, Qy], axis=1)                # (B, 2N, 3)
    c = jnp.concatenate([cx_rhs, cy_rhs], axis=1)        # (B, 2N)
    # The reference weights rows by sqrt(conf) then forms normal equations,
    # i.e. effective row weight = conf.
    w = jnp.concatenate([weights, weights], axis=1)      # (B, 2N)

    A = jnp.einsum("bni,bn,bnj->bij", Q, w, Q)           # (B, 3, 3)
    b = jnp.einsum("bni,bn,bn->bi", Q, w, c)             # (B, 3)
    # Regularize singular systems (invalid persons) so solve stays finite.
    valid = jnp.sum(weights, axis=-1) >= min_points      # (B,)
    A = A + (~valid)[:, None, None] * jnp.eye(3)
    t = jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.where(valid[:, None], t, INVALID_TRANS)


def perspective_projection(points: jax.Array, translation: jax.Array,
                           focal_length: float = FOCAL_LENGTH_BEV,
                           img_size: float = 512.0,
                           normalized: bool = True) -> jax.Array:
    """Pinhole projection of (..., N, 3) points offset by (..., 3) translation.

    Returns normalized [-1, 1] coords when `normalized` (the reference's
    convention in `bev/post_parser.py:68-90`), else pixels.
    """
    p = points + translation[..., None, :]
    x = p[..., 0] / jnp.maximum(p[..., 2], 1e-6) * focal_length
    y = p[..., 1] / jnp.maximum(p[..., 2], 1e-6) * focal_length
    if normalized:
        return jnp.stack([x, y], axis=-1) / (img_size / 2.0)
    return jnp.stack([x + img_size / 2.0, y + img_size / 2.0], axis=-1)
