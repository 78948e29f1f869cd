"""End-to-end BEV inference pipeline — jitted, fixed-K masked.

Mirrors `simple_romp/bev/main.py:123-183` (single_image_forward +
process_normal_image): maps -> 3D parse -> param regression -> SMPL+A ->
perspective projection -> duplicate suppression -> outlier removal. The two
O(N^2) pruning passes (`bev/post_parser.py:167-222`) become masked matrix
ops at fixed K.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from romp_tpu.models.bev import (
    bev_forward_maps, bev_regress_params, cam3dmap_anchor, coord_maps_3d_halfz,
)
from romp_tpu.models.layers import ParamStore
from romp_tpu.ops.centermap import parse_centermap3d
from romp_tpu.ops.projection import (
    FOCAL_LENGTH_BEV, perspective_projection,
)
from romp_tpu.ops.rotations import rot6d_to_axis_angle
from romp_tpu.smpl.body_model import SmplModel, smpla_forward

TAN_FOV_HALF = float(np.tan(np.radians(30.0)))  # FOV 60 deg


@dataclasses.dataclass(frozen=True)
class BevConfig:
    input_size: int = 512
    max_person: int = 64
    conf_thresh: float = 0.1       # `bev_settings` center_thresh presets
    nms_thresh: float = 16.0       # duplicate suppression
    relative_scale_thresh: float = 3.0
    outlier_scale_thresh: float = 0.25
    compute_dtype: str = "float32"
    act_dtype: str = "float32"     # bfloat16 = folded-BN fast path
    calc_smpl: bool = True
    transfer_dtype: str = "float32"  # float16 halves the verts fetch
    # (cast applied AFTER the pruning passes — NMS math stays f32)
    # Run HRNet branch BasicBlock chains through the Pallas fused kernel
    # (ops/pallas_fuse.py) — inference-only, mixed-path numerics.
    fuse_chains: bool = False
    # "hrnet32_tiny" = the reduced-depth variant (same structure); used by
    # the convergence chain (scripts/convergence.py --model bev)
    backbone: str = "hrnet32"


def unpack_bev_params(params_pred: jax.Array) -> Dict[str, jax.Array]:
    """(..., 146) -> cam(3) / thetas(72) / betas(11)
    (`bev/post_parser.py:240-253`)."""
    lead = params_pred.shape[:-1]
    cam = params_pred[..., 0:3]
    global_orient = rot6d_to_axis_angle(params_pred[..., 3:9])
    body_pose = rot6d_to_axis_angle(params_pred[..., 9:135])
    thetas = jnp.concatenate(
        [global_orient, body_pose, jnp.zeros((*lead, 6), params_pred.dtype)],
        axis=-1)
    return {"cam": cam, "smpl_thetas": thetas,
            "smpl_betas": params_pred[..., 135:146]}


def scale_to_depth(scale: jax.Array) -> jax.Array:
    return 1.0 / (scale * TAN_FOV_HALF + 1e-3)


def bev_cam_to_trans(cam: jax.Array) -> jax.Array:
    """(s, ty, tx) normalized -> camera-space (X, Y, depth)
    (`bev/post_parser.py:114-128`; note the y/x flip)."""
    depth = scale_to_depth(cam[..., 0])
    xy = jnp.stack([cam[..., 2], cam[..., 1]], axis=-1) \
        * depth[..., None] * TAN_FOV_HALF
    return jnp.concatenate([xy, depth[..., None]], axis=-1)


def suppress_duplicates(pj2d: jax.Array, scales: jax.Array,
                        mask: jax.Array, img_max_len: jax.Array,
                        nms_thresh: float) -> jax.Array:
    """Masked rewrite of projected-2D duplicate suppression
    (`bev/post_parser.py:167-198`): for close pairs keep the larger-scale
    (nearer) person. pj2d: (K, J, 2); scales, mask: (K,). Returns new mask.
    """
    K = mask.shape[0]
    d = jnp.linalg.norm(pj2d[:, None] - pj2d[None, :], axis=-1).mean(-1)
    ps = scales * 2.0
    max_scale = jnp.maximum(ps[:, None], ps[None, :])
    dn = d / max_scale
    # only upper triangle, only valid pairs
    iu = jnp.triu(jnp.ones((K, K), bool), k=1)
    pair_valid = iu & mask[:, None] & mask[None, :]
    thresh = nms_thresh * img_max_len / 640.0
    dup = pair_valid & (dn < thresh)
    # For each duplicate pair (i, j), remove the smaller-scale member.
    rm_i = dup & (ps[:, None] < ps[None, :])
    rm_j = dup & ~(ps[:, None] < ps[None, :])
    removed = rm_i.any(axis=1) | rm_j.any(axis=0)
    return mask & ~removed


def remove_outliers(cam_trans: jax.Array, scales: jax.Array,
                    mask: jax.Array, relative_scale_thresh: float,
                    scale_thresh: float) -> jax.Array:
    """Masked rewrite of isolated-outlier removal (`bev/post_parser.py:200-222`):
    drop small-scale persons whose mean distance to the crowd (excluding self
    and the farthest) is >> the others'. No-op when fewer than 3 valid."""
    K = mask.shape[0]
    n = jnp.sum(mask)
    m2 = mask[:, None] & mask[None, :]
    d = jnp.linalg.norm(cam_trans[:, None] - cam_trans[None, :], axis=-1)
    d = jnp.where(m2, d, 0.0)
    row_max = jnp.max(jnp.where(m2, d, -jnp.inf), axis=1)
    # per row: drop self (0) and the largest, average the rest
    mean_dist = (jnp.sum(d, axis=1) - row_max) / jnp.maximum(n - 2, 1)
    mean_dist = jnp.where(mask, mean_dist, 0.0)
    others = (jnp.sum(mean_dist) - mean_dist) / jnp.maximum(n - 1, 1)
    rel = mean_dist / (others + 1e-8)
    outlier = (rel > relative_scale_thresh) & (scales < scale_thresh) & mask
    return jnp.where(n < 3, mask, mask & ~outlier)


def bev_inference(params: Dict[str, jax.Array], smpl_adult: SmplModel,
                  smpl_baby: SmplModel, images: jax.Array,
                  cfg: BevConfig,
                  img_max_len: Optional[jax.Array] = None,
                  ) -> Dict[str, jax.Array]:
    """Jittable BEV core. images: (B, S, S, 3) RGB [0, 255]."""
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    at = jnp.bfloat16 if cfg.act_dtype == "bfloat16" else jnp.float32
    store = ParamStore(params, compute_dtype=dt, act_dtype=at,
                       fuse_chains=cfg.fuse_chains)
    anchors_np = cam3dmap_anchor()
    anchors = jnp.asarray(anchors_np)
    coord3d = jnp.asarray(
        coord_maps_3d_halfz(cfg.input_size // 4, anchors_np))

    maps = bev_forward_maps(store, images, anchors, coord3d,
                            backbone=cfg.backbone)
    det = parse_centermap3d(maps.center_maps_3d, cfg.max_person,
                            cfg.conf_thresh)
    params_pred = bev_regress_params(store, maps, det, anchors
                                     ).astype(jnp.float32)
    out = unpack_bev_params(params_pred)
    out.update({
        "mask": det.mask,
        "center_confs": det.scores.astype(jnp.float32),
        "pred_czyxs": det.zyx,
        "params_pred": params_pred,
        "cam_trans": bev_cam_to_trans(out["cam"]),
    })
    if not cfg.calc_smpl:
        return out

    B, K = det.mask.shape
    flat = lambda a: a.reshape(B * K, *a.shape[2:])
    unflat = lambda a: a.reshape(B, K, *a.shape[1:])
    verts, joints = smpla_forward(
        smpl_adult, smpl_baby, flat(out["smpl_betas"]),
        flat(out["smpl_thetas"]), root_align=True)
    trans = flat(out["cam_trans"])
    # focal scales with input size: FOCAL_LENGTH_BEV is the 512-calibrated
    # value (tan(FOV/2)*443/(512/2) ~= 1, bev/post_parser.py), so at other
    # input sizes the normalized projection must keep that calibration —
    # identity at 512 (reference parity), size-invariant elsewhere
    _f = FOCAL_LENGTH_BEV * cfg.input_size / 512.0
    pj2d = perspective_projection(joints, trans, focal_length=_f,
                                  img_size=cfg.input_size)
    verts_camed = perspective_projection(verts, trans, focal_length=_f,
                                         img_size=cfg.input_size)
    verts_camed = jnp.concatenate([verts_camed, verts[..., 2:3]], -1)

    out.update({
        "verts": unflat(verts), "joints": unflat(joints),
        "pj2d": unflat(pj2d), "verts_camed": unflat(verts_camed),
    })

    # pruning passes (vmapped per image)
    if img_max_len is None:
        img_max_len = jnp.full((B,), float(cfg.input_size))
    mask = jax.vmap(
        lambda p, s, m, L: suppress_duplicates(p, s, m, L, cfg.nms_thresh)
    )(out["pj2d"], out["cam"][..., 0], out["mask"], img_max_len)
    mask = jax.vmap(
        lambda t, s, m: remove_outliers(t, s, m, cfg.relative_scale_thresh,
                                        cfg.outlier_scale_thresh)
    )(out["cam_trans"], out["cam"][..., 0], mask)
    out["mask"] = mask
    if cfg.transfer_dtype == "float16":
        for k in ("verts", "joints", "pj2d", "verts_camed"):
            # clamp into f16 range (degenerate slots -> inf otherwise)
            out[k] = jnp.clip(out[k], -6.0e4, 6.0e4).astype(jnp.float16)
    return out


@functools.partial(jax.jit, static_argnums=(4,))
def _jitted_bev(params, smpl_adult, smpl_baby, images, cfg):
    return bev_inference(params, smpl_adult, smpl_baby, images, cfg)


class BevPipeline:
    def __init__(self, params, smpl_adult: SmplModel, smpl_baby: SmplModel,
                 cfg: Optional[BevConfig] = None):
        self.params = params
        self.smpl_adult = smpl_adult
        self.smpl_baby = smpl_baby
        self.cfg = cfg or BevConfig()

    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        return _jitted_bev(self.params, self.smpl_adult, self.smpl_baby,
                           images, self.cfg)
