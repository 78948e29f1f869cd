"""Differentiable PnP: batched Levenberg-Marquardt pose solver.

Equivalent of the reference's vendored EProPnP solver core
(`trace/lib/epropnp/`: `LMSolver:22`, `EProPnP6DoF:263` — used optionally
for camera estimation in TRACE training). This implements the deterministic
part — batched 4DoF/6DoF reprojection LM with fixed iteration count (jit
friendly: `lax.fori_loop`, static shapes, damped normal equations) — which
is the piece the pipelines consume; the Monte-Carlo pose-distribution layer
of EProPnP is a training-only regularizer the reference itself ships
disabled by default.

Rotation is parameterized as axis-angle; all math is jnp and differentiable
(implicit-function gradients via the solver being unrolled).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from romp_tpu.ops.rotations import axis_angle_to_matrix


class PnPResult(NamedTuple):
    rotation_aa: jax.Array    # (B, 3)
    translation: jax.Array    # (B, 3)
    cost: jax.Array           # (B,) final mean squared reproj error


def _project(pts3d, aa, t, f, c):
    R = axis_angle_to_matrix(aa)                       # (B, 3, 3)
    p = jnp.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    z = jnp.maximum(p[..., 2], 1e-6)
    return p[..., :2] / z[..., None] * f + c, z


def _residuals(params, pts3d, pts2d, w, f, c):
    aa, t = params[..., :3], params[..., 3:6]
    proj, _ = _project(pts3d, aa, t, f, c)
    return ((proj - pts2d) * w[..., None]).reshape(params.shape[0], -1)


def lm_pnp(pts3d: jax.Array, pts2d: jax.Array, weights: jax.Array,
           focal: float, center: jax.Array,
           init_aa: jax.Array = None, init_t: jax.Array = None,
           iters: int = 10, damping: float = 1e-3,
           dof: int = 6) -> PnPResult:
    """Solve camera pose from (B, N, 3) points / (B, N, 2) pixels.

    dof=6: full rotation + translation; dof=4: yaw (y-axis) + translation
    (the reference's EProPnP4DoF case — other rotation components frozen).
    """
    B, N, _ = pts3d.shape
    if init_aa is None:
        init_aa = jnp.zeros((B, 3))
    if init_t is None:
        init_t = jnp.concatenate(
            [jnp.zeros((B, 2)), jnp.full((B, 1), 5.0)], -1)
    params0 = jnp.concatenate([init_aa, init_t], -1)

    if dof == 4:
        mask = jnp.asarray([0.0, 1.0, 0.0, 1.0, 1.0, 1.0])
    else:
        mask = jnp.ones(6)

    def res_fn(p):
        return _residuals(p, pts3d, pts2d, weights, focal, center)

    def single_jac(p, x3, x2, w):
        return jax.jacfwd(lambda q: _residuals(
            q[None], x3[None], x2[None], w[None], focal, center)[0])(p)

    def body(_, params):
        r = res_fn(params)                                    # (B, 2N)
        Jb = jax.vmap(single_jac)(params, pts3d, pts2d,
                                  weights)                    # (B, 2N, 6)
        Jb = Jb * mask[None, None, :]
        JtJ = jnp.einsum("bni,bnj->bij", Jb, Jb)
        Jtr = jnp.einsum("bni,bn->bi", Jb, r)
        A = JtJ + damping * jnp.eye(6)[None]
        step = jnp.linalg.solve(A, Jtr[..., None])[..., 0]
        new = params - step * mask[None]
        # accept only improving steps (the LM trust-region gate)
        better = (jnp.sum(res_fn(new) ** 2, -1)
                  < jnp.sum(r ** 2, -1))[:, None]
        return jnp.where(better, new, params)

    params = jax.lax.fori_loop(0, iters, body, params0)
    r = res_fn(params)
    nvalid = jnp.maximum(jnp.sum(weights > 0, -1), 1)
    cost = jnp.sum(r ** 2, -1) / nvalid
    return PnPResult(params[..., :3], params[..., 3:6], cost)


def estimate_camera_pnp(joints3d: jax.Array, joints2d_px: jax.Array,
                        conf: jax.Array, focal: float = 548.0,
                        img_size: float = 512.0,
                        iters: int = 10) -> PnPResult:
    """Convenience wrapper: 6DoF LM from SMPL joints to detected 2D joints
    (the optional camera-estimation path of TRACE)."""
    c = jnp.asarray([img_size / 2.0, img_size / 2.0])
    return lm_pnp(joints3d, joints2d_px, conf, focal, c, iters=iters)
