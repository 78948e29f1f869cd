"""Deformable convolution (v1) — pure-XLA bilinear-gather implementation.

Replaces the reference's CUDA kernels
(`trace/lib/models/deform_conv/src/deform_conv_cuda_kernel.cu`,
`simple_romp/trace2/models/deform_conv/`): for every output location p and
kernel tap k, the input is sampled at p + p_k + Δp_k(p) with bilinear
interpolation (zero outside), then contracted with the conv kernel. Offsets
follow the mmcv layout: (B, G*2*kh*kw, H, W) with per-tap (dy, dx) pairs and
G deformable groups each steering C/G channels.

On TPU this lowers to 4 gathers per tap (vectorized over B*H*W) plus one
einsum over taps x channels — fully fusable by XLA; a Pallas variant can
stream taps through VMEM if this ever dominates (it is ~2% of TRACE's FLOPs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample x (H, W, C) at float coords ys/xs (...,) -> (..., C).

    Zero padding outside the image (matching deformable-conv semantics).
    """
    H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1, wx1 = ys - y0, xs - x0
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1

    def tap(yi, xi, w):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = x[yc, xc]                       # (..., C)
        return v * (w * valid)[..., None]

    return (tap(y0, x0, wy0 * wx0) + tap(y0, x0 + 1, wy0 * wx1)
            + tap(y0 + 1, x0, wy1 * wx0) + tap(y0 + 1, x0 + 1, wy1 * wx1))


def deform_conv2d(x: jax.Array, offsets: jax.Array, weight: jax.Array,
                  deform_groups: int = 8, padding: int = 1) -> jax.Array:
    """x: (B, H, W, C); offsets: (B, H, W, G*2*kh*kw) mmcv channel order
    (already NHWC: torch's (B, G*2*K, H, W) transposed); weight:
    (kh, kw, C, Cout). Stride 1, dilation 1. Returns (B, H, W, Cout).
    """
    B, H, W, C = x.shape
    kh, kw = weight.shape[:2]
    K = kh * kw
    G = deform_groups
    off = offsets.reshape(B, H, W, G, K, 2)      # (dy, dx) per tap

    yy = jnp.arange(H, dtype=x.dtype)[:, None]
    xx = jnp.arange(W, dtype=x.dtype)[None, :]
    ky = (jnp.arange(kh) - padding).astype(x.dtype)
    kx = (jnp.arange(kw) - padding).astype(x.dtype)
    base_y = yy[None, :, :, None] + ky[jnp.repeat(
        jnp.arange(kh), kw)][None, None, None, :]       # (1, H, W, K)
    base_x = xx[None, :, :, None] + kx[jnp.tile(
        jnp.arange(kw), kh)][None, None, None, :]

    ys = base_y[:, :, :, None, :] + off[..., 0]         # (B, H, W, G, K)
    xs = base_x[:, :, :, None, :] + off[..., 1]

    # Each deform group g steers its contiguous block of C//G channels, so
    # sample each channel block only at its own group's positions.
    Cg = C // G
    xg = jnp.moveaxis(x.reshape(B, H, W, G, Cg), 3, 0)   # (G, B, H, W, Cg)
    ysg = jnp.moveaxis(ys, 3, 0)                          # (G, B, H, W, K)
    xsg = jnp.moveaxis(xs, 3, 0)

    sample_bi = jax.vmap(bilinear_sample)                 # over batch
    sampled = jax.vmap(sample_bi)(xg, ysg, xsg)           # (G, B, H, W, K, Cg)
    sampled = jnp.moveaxis(sampled, 0, 4)                 # (B, H, W, K, G, Cg)
    sampled = sampled.reshape(B, H, W, K, C)

    w = weight.reshape(K, C, -1)
    return jnp.einsum("bhwkc,kco->bhwo", sampled, w,
                      preferred_element_type=jnp.float32)
