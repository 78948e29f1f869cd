"""Pallas TPU kernel: a fused chain of stride-1 BasicBlocks (inference).

Why: HRNet spends its time in per-branch chains of 4 BasicBlocks
(`simple_romp/romp/model.py:54-83` BasicBlock; our `models/hrnet.py:_branch`)
on thin-channel maps (C = 32..256). Two structural costs on TPU:

1. HBM traffic — XLA runs each conv as its own HBM->MXU->HBM pass: a
   4-block chain moves the feature map 16+ times. The roofline
   (`scripts/roofline.py`) shows stages 3/4 HBM-bound at f32 activations.
   This kernel keeps the whole chain resident in VMEM: the map is read
   ONCE from HBM and written ONCE, eliminating 14/16 of the round trips.

2. MXU lane occupancy — a conv's MXU use is capped at Cout/128 lanes
   (25% for the C=32 branch). Here each conv is ONE matmul per row-chunk
   with K = 3*C (dy-unrolled im2col concat) and N = 3*C (dx-concatenated
   taps), e.g. (4160, 96) @ (96, 96) for C=32: 56% of the 128x128 array
   vs 25% for the XLA conv formulation.

Numerics mirror the "mixed" inference path (compute bf16, activations
f32): matmul inputs are cast to bf16, accumulation and all BN/residual
math stay f32. BatchNorm running stats are folded to per-channel
scale/shift (inference only — training uses the unfused path, which
remains the autodiff path).

Layout notes: padded (H+2, W+2, C) scratches hold zero borders so the
SAME-padding taps need no masking; dy-slices of the padded buffer are
contiguous row blocks, so their (rows, C) reshape is free; the P output
reshape (M, 3C) -> (HC, W+2, 3, C) is a free minor-dim split, and the
three dx contributions land with static offset slices.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romp_tpu.models.layers import BN_EPS


def pack_chain_weights(params: Dict[str, jax.Array], prefix: str,
                       blocks: int) -> Tuple[jax.Array, jax.Array,
                                             jax.Array]:
    """Flat-dict torch-named params -> (w, scale, shift) kernel operands.

    w:     (blocks, 2, 3C, 3C) bf16 — w[n, j, dy*C + ci, dx*C + co]
    scale: (blocks, 2, C) f32 — folded BN gamma / sqrt(var + eps)
    shift: (blocks, 2, C) f32 — folded BN beta - mean * scale
    """
    ws, scs, shs = [], [], []
    for n in range(blocks):
        per_conv_w, per_conv_s, per_conv_t = [], [], []
        for j, (cname, bname) in enumerate(
                ((f"{prefix}.{n}.conv1", f"{prefix}.{n}.bn1"),
                 (f"{prefix}.{n}.conv2", f"{prefix}.{n}.bn2"))):
            w = params[f"{cname}.weight"]          # (3, 3, C, C) HWIO
            C = w.shape[2]
            wp = w.transpose(0, 2, 1, 3).reshape(3 * C, 3 * C)
            gamma = params[f"{bname}.weight"]
            beta = params[f"{bname}.bias"]
            mean = params[f"{bname}.running_mean"]
            var = params[f"{bname}.running_var"]
            s = gamma * jax.lax.rsqrt(var + BN_EPS)
            per_conv_w.append(wp)
            per_conv_s.append(s)
            per_conv_t.append(beta - mean * s)
        ws.append(jnp.stack(per_conv_w))
        scs.append(jnp.stack(per_conv_s))
        shs.append(jnp.stack(per_conv_t))
    return (jnp.stack(ws).astype(jnp.bfloat16),
            jnp.stack(scs).astype(jnp.float32),
            jnp.stack(shs).astype(jnp.float32))


def _conv_pass(src, dst, wmat, scale, shift, H, W, C, HC, residual):
    """One 3x3 conv + folded BN (+ residual) + ReLU: padded VMEM scratch
    `src` -> padded VMEM scratch `dst` (interior only; borders stay 0)."""
    Wp = W + 2
    for h0 in range(0, H, HC):
        xp = jnp.concatenate(
            [src[h0 + dy:h0 + dy + HC, :, :]
             .reshape(HC * Wp, C).astype(jnp.bfloat16)
             for dy in range(3)], axis=1)                     # (M, 3C)
        p = jnp.dot(xp, wmat,
                    preferred_element_type=jnp.float32)       # (M, 3C)
        p = p.reshape(HC, Wp, 3 * C)   # major-dim split only (free)
        a = (p[:, 0:W, 0:C] + p[:, 1:W + 1, C:2 * C]
             + p[:, 2:W + 2, 2 * C:3 * C])                    # (HC, W, C)
        a = a * scale.reshape(1, 1, C) + shift.reshape(1, 1, C)
        if residual is not None:
            a = a + residual[h0 + 1:h0 + 1 + HC, 1:W + 1, :]
        a = jnp.maximum(a, 0.0)
        dst[h0 + 1:h0 + 1 + HC, 1:W + 1, :] = a


def _chain_kernel(x_ref, w_ref, sc_ref, sh_ref, out_ref,
                  xa, xb, *, blocks, H, W, C, HC):
    """ONE BasicBlock (two conv passes) per grid step; the block index is
    the innermost grid dimension, so the VMEM scratches chain state across
    a batch element's blocks (TPU grids execute sequentially).

    Round-5 finding: the python-unrolled all-blocks body produced a 172 KB
    Mosaic module for the C=32 branch (4 row chunks x 8 conv passes) and
    the remote compile helper SIGKILLs modules that large, while the same
    kernel at 1 chunk (C=128/256 branches) compiled fine. Gridding over
    blocks shrinks the body 4x; the weights BlockSpec streams block n's
    (2, 3C, 3C) slice per step.
    """
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        # zero borders (SAME padding) + load this batch element's map
        xa[:] = jnp.zeros_like(xa)
        xb[:] = jnp.zeros_like(xb)
        xa[1:H + 1, 1:W + 1, :] = x_ref[0]

    _conv_pass(xa, xb, w_ref[0, 0], sc_ref[0, 0], sh_ref[0, 0],
               H, W, C, HC, residual=None)
    # second conv: BN + residual(block input, still in xa) + ReLU,
    # written back into xa in place (read-before-write per chunk).
    _conv_pass(xb, xa, w_ref[0, 1], sc_ref[0, 1], sh_ref[0, 1],
               H, W, C, HC, residual=xa)

    @pl.when(n == blocks - 1)
    def _():
        out_ref[0] = xa[1:H + 1, 1:W + 1, :]


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def fused_basic_chain(x: jax.Array, w: jax.Array, scale: jax.Array,
                      shift: jax.Array, blocks: int,
                      interpret: bool = False) -> jax.Array:
    """Run `blocks` stride-1 BasicBlocks over x: (B, H, W, C) -> same shape.

    x is converted to f32 internally (the kernel's residual/BN math is
    f32); output dtype matches the input dtype.
    """
    B, H, W, C = x.shape
    HC = min(H, 32)
    assert H % HC == 0, (H, HC)
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    kernel = functools.partial(_chain_kernel, blocks=blocks, H=H, W=W,
                               C=C, HC=HC)
    yf = pl.pallas_call(
        kernel,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, n: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3 * C, 3 * C), lambda b, n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),    # block n's weights
            pl.BlockSpec((1, 2, C), lambda b, n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b, n: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, C), jnp.float32),
            pltpu.VMEM((H + 2, W + 2, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xf, w, scale, shift)
    return yf.astype(out_dtype)


def fused_chain_from_store(store, prefix: str, x: jax.Array, planes: int,
                           blocks: int) -> jax.Array:
    """hrnet._branch drop-in: pack weights from the flat param dict and run
    the fused kernel. Inference only (BN running stats folded)."""
    w, scale, shift = pack_chain_weights(store.params, prefix, blocks)
    return fused_basic_chain(x, w, scale, shift, blocks)


def reference_basic_chain(x, w, scale, shift, blocks):
    """XLA reference of the exact kernel math (for parity tests): bf16
    matmul inputs, f32 accumulation, folded-BN scale/shift, f32 residual."""
    C = x.shape[-1]
    y = x.astype(jnp.float32)
    for n in range(blocks):
        h = y
        for j in range(2):
            wm = w[n, j].astype(jnp.float32).reshape(3, C, 3, C)
            wm = wm.transpose(0, 2, 1, 3)                    # (3,3,C,C) HWIO
            o = jax.lax.conv_general_dilated(
                h.astype(jnp.bfloat16), wm.astype(jnp.bfloat16),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            o = o * scale[n, j] + shift[n, j]
            if j == 1:
                o = o + y
            o = jnp.maximum(o, 0.0)
            h = o
        y = h
    return y.astype(x.dtype)
