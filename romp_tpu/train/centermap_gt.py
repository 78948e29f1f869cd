"""Ground-truth center-heatmap generation — vectorized fixed-K.

Reference: scale-adaptive Gaussian splats, one per person, combined by max,
with the exact center pixel forced to 1
(`romp/lib/maps_utils/centermap.py:92-140,362-369,392-397`). The reference
loops persons in numpy inside dataloader workers; here one jittable call
renders the whole (B, K) batch on device (usable both in input pipelines and
for on-device augmentation).

Conventions: centers in [-1, 1] normalized coords, order (x, y); invalid
persons marked by center_x < -1 (mask) — matching the reference's -2 fill.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_RADIUS_FRAC = 1.0 / 32.0   # map_size/32
SCALE_FACTOR_FRAC = 1.0 / 16.0  # map_size/16


def person_radius(bbox_hw_norm: jax.Array, map_size: int) -> jax.Array:
    """Adaptive splat radius from normalized bbox (h, w) (`_calc_radius_`).

    bbox_hw_norm: (..., 2) in [0, 2] (normalized image units). Returns int32.
    The reference casts through uint8 (floor); we floor explicitly.
    """
    scales = jnp.linalg.norm(bbox_hw_norm / 2.0, axis=-1)
    r = scales * (map_size * SCALE_FACTOR_FRAC) + map_size * MIN_RADIUS_FRAC
    return jnp.floor(r).astype(jnp.int32)


def generate_centermap(centers: jax.Array, radii: jax.Array,
                       mask: jax.Array, map_size: int = 64) -> jax.Array:
    """Render GT center heatmaps.

    centers: (B, K, 2) normalized (x, y) in [-1, 1]; radii: (B, K) int32;
    mask: (B, K) person validity. Returns (B, map_size, map_size) in [0, 1].
    """
    B, K = mask.shape
    cx = jnp.floor((centers[..., 0] + 1.0) / 2.0 * map_size).astype(jnp.int32)
    cy = jnp.floor((centers[..., 1] + 1.0) / 2.0 * map_size).astype(jnp.int32)
    in_range = (cx >= 0) & (cy >= 0) & (cx < map_size) & (cy < map_size)
    valid = mask & in_range

    xs = jnp.arange(map_size)
    dx = xs[None, None, :] - cx[..., None]            # (B, K, S)
    dy = xs[None, None, :] - cy[..., None]
    diam = (2 * radii + 1).astype(jnp.float32)
    sigma = (diam / 6.0)[..., None, None]             # (B, K, 1, 1)
    d2 = (dx[:, :, None, :] ** 2 + dy[:, :, :, None] ** 2).astype(jnp.float32)
    g = jnp.exp(-d2 / (2.0 * sigma ** 2))             # (B, K, S, S)
    box = ((jnp.abs(dx) <= radii[..., None])[:, :, None, :]
           & (jnp.abs(dy) <= radii[..., None])[:, :, :, None])
    g = jnp.where(box & valid[..., None, None], g, 0.0)
    heat = jnp.max(g, axis=1)                          # (B, S, S)

    # Exact centers forced to 1 (reference sets heatmap[y, x] = 1).
    flat = heat.reshape(B, map_size * map_size)
    idx = jnp.where(valid, cy * map_size + cx, 0)
    ones = valid.astype(heat.dtype)
    flat = jax.vmap(lambda f, i, o: f.at[i].max(o))(flat, idx, ones)
    return flat.reshape(B, map_size, map_size)


def collision_aware_centers(centers: jax.Array, radii: jax.Array,
                            mask: jax.Array,
                            map_size: int = 64,
                            collision_factor: float = 0.2) -> jax.Array:
    """CAR (Collision-Aware Representation): push overlapping persons'
    centers apart so each keeps a distinct heatmap peak
    (`romp/lib/maps_utils/centermap.py:98-115`).

    centers: (B, K, 2) normalized; radii: (B, K); mask: (B, K).
    One repulsion pass over all pairs (the reference iterates annotated
    occluder pairs; symmetric all-pairs is its masked superset).
    """
    d = centers[:, :, None] - centers[:, None, :]             # (B,K,K,2)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)
    least = (radii[:, :, None] + radii[:, None, :] + 1.0) \
        / map_size * 2.0
    pair = (mask[:, :, None] & mask[:, None, :]
            & ~jnp.eye(mask.shape[1], dtype=bool)[None])
    colliding = pair & (dist < least)
    # offset along the connecting line, split between the two persons
    push = jnp.abs((least - dist) / dist) * collision_factor
    offset = jnp.where(colliding[..., None],
                       d * push[..., None] * 0.5, 0.0).sum(axis=2)
    out = jnp.clip(centers + offset, -1.0, 1.0)
    out = jnp.where(out == -1.0, -0.96, out)
    out = jnp.where(out == 1.0, 0.96, out)
    return jnp.where(mask[..., None], out, centers)


def generate_centermap3d(centers_zyx: jax.Array, mask: jax.Array,
                         map_size: int = 128, depth_size: int = 64,
                         radius: int = 3) -> jax.Array:
    """3D GT centermap for BEV (`centermap.py:141-187`): fixed-radius 3D
    Gaussian splats combined by max, centers forced to 1.

    centers_zyx: (B, K, 3) integer grid coords (z, y, x); mask: (B, K).
    Returns (B, depth_size, map_size, map_size).
    """
    B, K = mask.shape
    cz = centers_zyx[..., 0].astype(jnp.int32)
    cy = centers_zyx[..., 1].astype(jnp.int32)
    cx = centers_zyx[..., 2].astype(jnp.int32)
    in_range = ((cz >= 0) & (cz < depth_size) & (cy >= 0) & (cy < map_size)
                & (cx >= 0) & (cx < map_size))
    valid = mask & in_range

    diam = 2 * radius + 1
    sigma = diam / 6.0

    def per_person(cz1, cy1, cx1, v1):
        dz = (jnp.arange(depth_size) - cz1)[:, None, None]
        dy = (jnp.arange(map_size) - cy1)[None, :, None]
        dx = (jnp.arange(map_size) - cx1)[None, None, :]
        d2 = (dz ** 2 + dy ** 2 + dx ** 2).astype(jnp.float32)
        box = ((jnp.abs(dz) <= radius) & (jnp.abs(dy) <= radius)
               & (jnp.abs(dx) <= radius))
        g = jnp.exp(-d2 / (2.0 * sigma ** 2))
        return jnp.where(box & v1, g, 0.0)

    g = jax.vmap(jax.vmap(per_person))(cz, cy, cx, valid)  # (B,K,D,S,S)
    heat = jnp.max(g, axis=1)
    flat = heat.reshape(B, depth_size * map_size * map_size)
    idx = jnp.where(valid, (cz * map_size + cy) * map_size + cx, 0)
    flat = jax.vmap(lambda f, i, o: f.at[i].max(o))(
        flat, idx, valid.astype(heat.dtype))
    return flat.reshape(B, depth_size, map_size, map_size)
