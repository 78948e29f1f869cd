"""2D-pose pretraining: keypoint heatmaps + associative embedding.

Reference: the optional bottom-up 2D-pose learning path used for backbone
pretraining (`romp/pretrain.py`, `romp/lib/loss_funcs/maps_loss.py:18-116`
HeatmapLoss/AELoss, `romp/lib/maps_utils/kp_group.py` HeatmapParser,
`target_generators.py`). Provides:
- per-joint Gaussian heatmap GT rendering (vectorized, on device)
- masked heatmap MSE + focal losses
- associative-embedding pull/push losses over fixed-(P,) persons
- fixed-K heatmap peak parsing + host-side tag grouping
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def generate_joint_heatmaps(kp2d: jax.Array, vis: jax.Array,
                            map_size: int, sigma: float = 2.0) -> jax.Array:
    """kp2d: (B, P, J, 2) in [-1, 1]; vis: (B, P, J) -> (B, S, S, J)."""
    B, P, J, _ = kp2d.shape
    cx = (kp2d[..., 0] + 1.0) / 2.0 * map_size
    cy = (kp2d[..., 1] + 1.0) / 2.0 * map_size
    xs = jnp.arange(map_size, dtype=jnp.float32)
    dx = xs[None, None, None, :] - cx[..., None]     # (B, P, J, S)
    dy = xs[None, None, None, :] - cy[..., None]
    g = jnp.exp(-(dx[:, :, :, None, :] ** 2 + dy[:, :, :, :, None] ** 2)
                / (2.0 * sigma ** 2))                # (B, P, J, S, S)
    g = jnp.where(vis[..., None, None], g, 0.0)
    heat = jnp.max(g, axis=1)                        # (B, J, S, S)
    return heat.transpose(0, 2, 3, 1)


def heatmap_mse_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Channel-masked MSE (`maps_loss.py:86-99`): only supervised joints
    (non-empty GT channels) contribute."""
    chan_mask = (gt.sum(axis=(1, 2)) > 0).astype(pred.dtype)   # (B, J)
    per_chan = jnp.mean((pred - gt) ** 2, axis=(1, 2))
    return jnp.sum(per_chan * chan_mask) / (jnp.sum(chan_mask) + 1e-6)


def ae_loss(tags: jax.Array, kp2d: jax.Array, vis: jax.Array,
            person_mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Associative-embedding pull/push (`maps_loss.py:101-160`).

    tags: (B, S, S, J) predicted embedding maps; kp2d: (B, P, J, 2) in
    [-1, 1]; vis: (B, P, J); person_mask: (B, P). Returns (pull, push).
    """
    B, S = tags.shape[0], tags.shape[1]
    P, J = kp2d.shape[1], kp2d.shape[2]
    cx = jnp.clip(((kp2d[..., 0] + 1) / 2 * S).astype(jnp.int32), 0, S - 1)
    cy = jnp.clip(((kp2d[..., 1] + 1) / 2 * S).astype(jnp.int32), 0, S - 1)
    flat = tags.transpose(0, 3, 1, 2).reshape(B, J, S * S)     # (B, J, SS)
    idx = (cy * S + cx).transpose(0, 2, 1)                     # (B, J, P)
    picked = jnp.take_along_axis(flat, idx, axis=2)            # (B, J, P)
    picked = picked.transpose(0, 2, 1)                         # (B, P, J)

    w = vis.astype(tags.dtype) * person_mask[..., None]
    nj = jnp.sum(w, axis=-1)                                   # (B, P)
    mean_tag = jnp.sum(picked * w, -1) / jnp.maximum(nj, 1.0)  # (B, P)
    pull = jnp.sum(((picked - mean_tag[..., None]) ** 2) * w) \
        / (jnp.sum(w) + 1e-6)

    pv = (person_mask & (nj > 0)).astype(tags.dtype)           # (B, P)
    pair = pv[:, :, None] * pv[:, None, :] \
        * (1.0 - jnp.eye(P)[None])
    diff = mean_tag[:, :, None] - mean_tag[:, None, :]
    push = jnp.sum(jnp.exp(-diff ** 2) * pair) / (jnp.sum(pair) + 1e-6)
    return pull, push


def parse_joint_heatmaps(heat: jax.Array, tags: jax.Array,
                         max_person: int, conf_thresh: float = 0.1):
    """Fixed-K per-joint peak extraction (device): returns
    (coords (B, J, K, 2) xy in map px, scores (B, J, K), tag values)."""
    from romp_tpu.models.layers import max_pool_same

    B, S, _, J = heat.shape
    h = heat.transpose(0, 3, 1, 2)                 # (B, J, S, S)
    pooled = max_pool_same(heat, 5).transpose(0, 3, 1, 2)
    nmsed = jnp.where(h == pooled, h, 0.0).reshape(B, J, S * S)
    scores, inds = jax.lax.top_k(nmsed, max_person)
    xs = (inds % S).astype(jnp.float32)
    ys = (inds // S).astype(jnp.float32)
    tflat = tags.transpose(0, 3, 1, 2).reshape(B, J, S * S)
    tvals = jnp.take_along_axis(tflat, inds, axis=2)
    return (jnp.stack([xs, ys], -1), scores, tvals,
            scores > conf_thresh)


def group_by_tags(coords: np.ndarray, scores: np.ndarray, tvals: np.ndarray,
                  valid: np.ndarray, tag_thresh: float = 1.0
                  ) -> List[np.ndarray]:
    """Greedy host-side grouping of per-joint peaks into persons by tag
    distance (kp_group.py semantics). Inputs are one image's (J, K, ...)
    arrays; returns a list of (J, 3) person keypoint arrays (x, y, conf),
    missing joints zeroed."""
    J = coords.shape[0]
    persons: List[dict] = []
    for j in range(J):
        for k in np.where(valid[j])[0]:
            tag = tvals[j, k]
            best, best_d = None, tag_thresh
            for p in persons:
                if j in p["joints"]:
                    continue
                d = abs(p["tag"] - tag)
                if d < best_d:
                    best, best_d = p, d
            if best is None:
                persons.append({"tag": float(tag), "n": 1,
                                "joints": {j: (*coords[j, k], scores[j, k])}})
            else:
                best["joints"][j] = (*coords[j, k], scores[j, k])
                best["tag"] = (best["tag"] * best["n"] + float(tag)) \
                    / (best["n"] + 1)
                best["n"] += 1
    out = []
    for p in persons:
        arr = np.zeros((J, 3), np.float32)
        for j, (x, y, s) in p["joints"].items():
            arr[j] = (x, y, s)
        out.append(arr)
    return out
