"""End-to-end ROMP inference pipeline — one jitted, fixed-shape device graph.

host image (B, 512, 512, 3 RGB float) ->
  backbone+heads -> center NMS/top-K parse -> per-person parameter gather ->
  6D->axis-angle -> SMPL LBS -> weak-perspective projection + least-squares
  camera translation -> (K, ...) tensors + validity mask.

This replaces the reference's split host/device flow
(`simple_romp/romp/main.py:106-160`: torch model + host numpy parse + cv2
PnP) with a single XLA program. Dynamic person counts become fixed-K masked
tensors; downstream host code (tracker, renderer, savers) filters by mask.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import ParamStore
from romp_tpu.models.romp import romp_forward
from romp_tpu.ops.centermap import parse_centermap2d, sample_maps_at
from romp_tpu.ops.projection import (
    cam_to_3d_trans, convert_to_org_image_coords, estimate_translation_lstsq,
    weak_perspective_projection,
)
from romp_tpu.ops.rotations import rot6d_to_axis_angle
from romp_tpu.smpl.body_model import SmplModel, smpl_forward


@dataclasses.dataclass(frozen=True)
class RompConfig:
    input_size: int = 512
    max_person: int = 64           # reference topK (simple_romp/romp/post_parser.py:32)
    conf_thresh: float = 0.25      # `simple_romp/romp/main.py` center_thresh
    cam_scale_base: float = 1.1    # pow(1.1, s) decode (`main.py:113`)
    root_align: bool = False       # CLI default (`romp/main.py:39`)
    compute_dtype: str = "float32"  # conv input dtype ("bfloat16" = MXU fast)
    act_dtype: str = "float32"      # inter-layer activation dtype; bfloat16
    # halves activation HBM traffic (folded-BN fast path, small accuracy cost)
    calc_smpl: bool = True
    backbone: str = "hrnet32"       # or "resnet50"
    # dtype the big per-vertex outputs (verts/joints/pj2d/verts_camed) are
    # returned in. float16 halves the dominant host<-device fetch in the
    # batch-1 CLI/webcam path (sub-mm quantization); float32 = exact.
    transfer_dtype: str = "float32"
    # When >0 and < max_person: sort the K person slots by
    # (validity, confidence) on device and return only the top fetch_slots.
    # The host<-device result transfer scales with K x 6890 verts, so a
    # webcam frame with 2 people pays for all 64 slots otherwise; 8 slots
    # cut the dominant fetch 8x. People beyond fetch_slots (rare in the
    # interactive path; crowd images use the BEV crowd pipeline) are
    # dropped, most-confident kept.
    fetch_slots: int = 0
    # Run HRNet branch BasicBlock chains through the Pallas fused kernel
    # (ops/pallas_fuse.py): one HBM round trip per 4-block chain instead of
    # per conv + 2x better MXU lane occupancy on the thin branches.
    # Same mixed-path numerics (bf16 matmuls, f32 BN/residual math).
    fuse_chains: bool = False


def unpack_params(params_pred: jax.Array, cam_scale_base: float) -> Dict[str, jax.Array]:
    """(..., 145) raw head channels -> cam / thetas / betas.

    Layout [cam(3) | global 6D (6) | body 21x6D (126) | betas(10)] per
    `simple_romp/romp/post_parser.py:66-79`; hands (joints 22, 23) are
    zero-filled to give the 72-dim axis-angle theta.
    """
    lead = params_pred.shape[:-1]
    cam = params_pred[..., 0:3]
    if cam_scale_base != 1.0:
        cam = cam.at[..., 0].set(cam_scale_base ** cam[..., 0])
    global_orient = rot6d_to_axis_angle(params_pred[..., 3:9])
    body_pose = rot6d_to_axis_angle(params_pred[..., 9:135])
    thetas = jnp.concatenate(
        [global_orient, body_pose, jnp.zeros((*lead, 6), params_pred.dtype)],
        axis=-1)
    betas = params_pred[..., 135:145]
    return {"cam": cam, "smpl_thetas": thetas, "smpl_betas": betas}


def romp_inference(params: Dict[str, jax.Array], smpl: SmplModel,
                   images: jax.Array, cfg: RompConfig) -> Dict[str, jax.Array]:
    """The jittable core. images: (B, S, S, 3) RGB in [0, 255].

    Returns a dict of fixed-shape tensors, all with leading (B, K):
    mask, center_confs, centers, cam, cam_trans, smpl_thetas, smpl_betas,
    and (when cfg.calc_smpl) verts, joints, pj2d.
    """
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    at = jnp.bfloat16 if cfg.act_dtype == "bfloat16" else jnp.float32
    store = ParamStore(params, compute_dtype=dt, act_dtype=at,
                       fuse_chains=cfg.fuse_chains)
    center_maps, params_maps = romp_forward(store, images,
                                            backbone=cfg.backbone)
    center_maps = center_maps.astype(jnp.float32)
    params_maps = params_maps.astype(jnp.float32)

    det = parse_centermap2d(center_maps[..., 0], cfg.max_person,
                            cfg.conf_thresh)
    B, K = det.scores.shape
    params_pred = sample_maps_at(params_maps, det.flat_inds)  # (B, K, 145)
    out = unpack_params(params_pred, cfg.cam_scale_base)
    # (x, y) pixel centers on the input image, `post_parser.py:144`; the
    # map size comes from the net output, not a hardcoded 64.
    S = center_maps.shape[1]
    centers = jnp.stack(
        [det.flat_inds % S, det.flat_inds // S], -1) * cfg.input_size // S
    out.update({
        "mask": det.mask,
        "center_confs": det.scores,
        "centers": centers.astype(jnp.float32),
    })

    if not cfg.calc_smpl:
        if 0 < cfg.fetch_slots < K:
            out = compact_slots(out, cfg.fetch_slots)
        return out

    flat = lambda a: a.reshape(B * K, *a.shape[2:])
    verts, joints = smpl_forward(
        smpl, flat(out["smpl_betas"]), flat(out["smpl_thetas"]),
        root_align=cfg.root_align)
    cam_flat = flat(out["cam"])
    pj2d = weak_perspective_projection(joints, cam_flat)
    verts_camed = weak_perspective_projection(verts, cam_flat, keep_dim=True)

    # Least-squares camera translation on the first 24 joints, pixels in the
    # 512-square; validity mirrors estimate_translation's masks.
    j24 = joints[:, :24]
    # (pj2d + 1) * 256: normalized -> 512-square pixels (`post_parser.py:98`).
    pj24_pix = (pj2d[:, :24] + 1.0) * (cfg.input_size / 2.0)
    w = ((pj2d[:, :24, 1] > -2.0) & (j24[..., 2] != -2.0)).astype(jnp.float32)
    cam_trans = estimate_translation_lstsq(
        j24, pj24_pix, w, focal_length=443.4, img_size=float(cfg.input_size))

    unflat = lambda a: a.reshape(B, K, *a.shape[1:])
    if cfg.transfer_dtype == "float16":
        # clamp into f16 range: degenerate slots can hold huge values that
        # would otherwise become inf in transit
        tcast = lambda a: jnp.clip(a, -6.0e4, 6.0e4).astype(jnp.float16)
    else:
        tcast = lambda a: a
    out.update({
        "verts": tcast(unflat(verts)),
        "joints": tcast(unflat(joints)),
        "pj2d": tcast(unflat(pj2d)),
        "verts_camed": tcast(unflat(verts_camed)),
        "cam_trans": unflat(cam_trans),
    })
    if 0 < cfg.fetch_slots < K:
        out = compact_slots(out, cfg.fetch_slots)
    return out


def compact_slots(out: Dict[str, jax.Array], n: int) -> Dict[str, jax.Array]:
    """Reorder the K person slots by (validity, confidence) descending and
    keep the first n — shrinks every (B, K, ...) output before the host
    fetch. Pure gather; stays inside the jitted graph."""
    key = out["center_confs"] + jnp.where(out["mask"], 1.0e4, 0.0)
    order = jnp.argsort(-key, axis=1)[:, :n]            # (B, n)
    res = {}
    for k, v in out.items():
        idx = order.reshape(order.shape + (1,) * (v.ndim - 2))
        res[k] = jnp.take_along_axis(v, idx.astype(jnp.int32), axis=1)
    return res


def project_to_org_image(out: Dict[str, jax.Array], pad_info: jax.Array,
                         ) -> Dict[str, jax.Array]:
    """Add pj2d_org / verts_camed_org for one image's pad offsets (6,)."""
    res = dict(out)
    if "pj2d" in out:
        res["pj2d_org"] = convert_to_org_image_coords(out["pj2d"], pad_info)
    if "verts_camed" in out:
        res["verts_camed_org"] = convert_to_org_image_coords(
            out["verts_camed"], pad_info)
    return res


@functools.partial(jax.jit, static_argnums=(3,))
def _jitted_inference(params, smpl, images, cfg):
    return romp_inference(params, smpl, images, cfg)


class RompPipeline:
    """Convenience wrapper owning params + SMPL model + config."""

    def __init__(self, params: Dict[str, jax.Array], smpl: SmplModel,
                 cfg: Optional[RompConfig] = None):
        self.params = params
        self.smpl = smpl
        self.cfg = cfg or RompConfig()

    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        return _jitted_inference(self.params, self.smpl, images, self.cfg)
