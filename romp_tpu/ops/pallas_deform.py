"""Pallas TPU kernel for the deformable-conv feature warp.

The one genuinely custom kernel the reference implements in CUDA
(`trace/lib/models/deform_conv/src/deform_conv_cuda_kernel.cu`, 864 LoC;
SURVEY.md §7). The XLA formulation (`ops/deform_conv.py`) factors bilinear
sampling into one-hot matmuls but materializes a (B, G, P, W*Cg) `rows`
intermediate in HBM per tap — the dominant cost of TRACE's maps head
(~114 ms/clip, STATUS r2). This kernel runs the same math with the
intermediates resident in VMEM:

  per (batch, pixel-tile, group) grid step, with the group's feature rows
  (H, W*Cg) held in VMEM across all K taps:
    w_row  = bilinear one-hot over rows      (VPU: iota-compare)
    rows   = w_row @ xg                      (MXU)
    w_col2 = bilinear one-hot over cols, broadcast over Cg (VPU)
    acc   += (rows * w_col2) @ W_k_expanded  (MXU)

  The conv weight is pre-expanded to (G, K, W*Cg, Cout) so the per-tap
  contraction over (w, c) is ONE matmul; groups accumulate by revisiting
  the output block (innermost grid dim).

Zero-padding semantics: out-of-image sample rows/cols match no iota index,
so their one-hot weights are exactly zero — identical to the CUDA kernel.

Backward: `deform_conv2d_fast` is a custom_vjp whose backward is the VJP of
the (numerically matching) XLA implementation — forward speed without
hand-writing the transpose kernels (the CUDA reference needs 3 of them).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romp_tpu.ops.deform_conv import deform_conv2d

MAX_PIXEL_TILE = 1024


def _sample_coords(offsets, H, W, kh, kw, padding, G):
    """(B, H, W, G*2*K) offsets -> float sample coords ys/xs (B, G, K, P)."""
    B = offsets.shape[0]
    K = kh * kw
    P = H * W
    off = offsets.reshape(B, H, W, G, K, 2)
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    ky = (jnp.arange(kh) - padding).astype(jnp.float32)
    kx = (jnp.arange(kw) - padding).astype(jnp.float32)
    base_y = yy[None, :, :, None] + ky[jnp.repeat(
        jnp.arange(kh), kw)][None, None, None, :]
    base_x = xx[None, :, :, None] + kx[jnp.tile(
        jnp.arange(kw), kh)][None, None, None, :]
    ys = (base_y[:, :, :, None, :] + off[..., 0].astype(jnp.float32)
          ).transpose(0, 3, 4, 1, 2).reshape(B, G, K, P)
    xs = (base_x[:, :, :, None, :] + off[..., 1].astype(jnp.float32)
          ).transpose(0, 3, 4, 1, 2).reshape(B, G, K, P)
    return ys, xs


def _onehot_lin(coords_col, ids, dtype):
    """coords_col (PT, 1) float, ids (PT, N) int -> bilinear one-hot
    (PT, N); all-zero where the sample falls outside [0, N-1]."""
    c0 = jnp.floor(coords_col)
    f = (coords_col - c0).astype(dtype)
    c0i = c0.astype(jnp.int32)
    return ((ids == c0i).astype(dtype) * (1.0 - f)
            + (ids == c0i + 1).astype(dtype) * f)


def _warp_kernel(ys_ref, xs_ref, xg_ref, wke_ref, out_ref, *, K, H, W, Cg,
                 cdt):
    g = pl.program_id(2)
    PT = out_ref.shape[1]
    WCg = W * Cg
    xg = xg_ref[0, 0]                                        # (H, WCg)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (PT, H), 1)
    # column ids broadcast over the Cg fast axis of the (w, c) layout
    wc_ids = jax.lax.broadcasted_iota(jnp.int32, (PT, WCg), 1) // Cg

    acc = jnp.zeros((PT, out_ref.shape[2]), jnp.float32)
    for k in range(K):
        w_row = _onehot_lin(ys_ref[0, 0, k, :][:, None], h_ids, cdt)
        rows = jnp.dot(w_row, xg, preferred_element_type=jnp.float32)
        w_col2 = _onehot_lin(xs_ref[0, 0, k, :][:, None], wc_ids,
                             jnp.float32)
        masked = (rows * w_col2).astype(cdt)
        acc = acc + jnp.dot(masked, wke_ref[0, k],
                            preferred_element_type=jnp.float32)

    @pl.when(g == 0)
    def _():
        out_ref[0] = acc

    @pl.when(g > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def deform_conv2d_pallas(x: jax.Array, offsets: jax.Array, weight: jax.Array,
                         deform_groups: int = 8, padding: int = 1,
                         interpret: bool = False) -> jax.Array:
    """Drop-in Pallas forward for `deform_conv2d` (same contract:
    x (B, H, W, C); offsets (B, H, W, G*2*K) mmcv order; weight
    (kh, kw, C, Cout); stride 1). Returns (B, H, W, Cout) float32."""
    B, H, W, C = x.shape
    kh, kw = weight.shape[:2]
    Cout = weight.shape[-1]
    K = kh * kw
    G = deform_groups
    Cg = C // G
    P = H * W
    WCg = W * Cg
    PT = P if P <= MAX_PIXEL_TILE else MAX_PIXEL_TILE
    if P % PT:
        # ragged pixel count: the XLA path handles it (never hit by TRACE's
        # power-of-two maps)
        return deform_conv2d(x, offsets, weight, deform_groups, padding)

    cdt = x.dtype
    ys, xs = _sample_coords(offsets, H, W, kh, kw, padding, G)
    xg = x.reshape(B, H, W, G, Cg).transpose(0, 3, 1, 2, 4).reshape(
        B, G, H, WCg)
    # (K, G, Cg, Cout) -> broadcast over w -> (G, K, W*Cg, Cout)
    wk = weight.reshape(K, G, Cg, Cout).transpose(1, 0, 2, 3)
    wke = jnp.broadcast_to(wk[:, :, None, :, :], (G, K, W, Cg, Cout)
                           ).reshape(G, K, WCg, Cout).astype(cdt)

    grid = (B, P // PT, G)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, K=K, H=H, W=W, Cg=Cg, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((B, P, Cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, K, PT), lambda b, p, g: (b, g, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K, PT), lambda b, p, g: (b, g, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, WCg), lambda b, p, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, WCg, Cout), lambda b, p, g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PT, Cout), lambda b, p, g: (b, p, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ys, xs, xg, wke)
    return out.reshape(B, H, W, Cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_conv2d_fast(x, offsets, weight, deform_groups=8, padding=1):
    """deform_conv2d with the Pallas forward on TPU (XLA elsewhere) and the
    XLA implementation's VJP as the backward.

    ROMP_TPU_NO_PALLAS=1 forces the XLA formulation even on TPU — escape
    hatch for environments whose compile service cannot build Mosaic
    kernels (the remote axon AOT helper here SIGKILLs on any Pallas
    compile; plain XLA graphs are unaffected)."""
    import os

    if os.environ.get("ROMP_TPU_NO_PALLAS") == "1":
        return deform_conv2d(x, offsets, weight, deform_groups, padding)
    if any(d.platform == "tpu" for d in jax.devices()):
        return deform_conv2d_pallas(x, offsets, weight, deform_groups,
                                    padding)
    return deform_conv2d(x, offsets, weight, deform_groups, padding)


def _fast_fwd(x, offsets, weight, deform_groups, padding):
    return (deform_conv2d_fast(x, offsets, weight, deform_groups, padding),
            (x, offsets, weight))


def _fast_bwd(deform_groups, padding, res, g):
    x, offsets, weight = res
    _, vjp = jax.vjp(
        lambda xx, oo, ww: deform_conv2d(xx, oo, ww, deform_groups,
                                         padding), x, offsets, weight)
    return vjp(g)


deform_conv2d_fast.defvjp(_fast_fwd, _fast_bwd)
