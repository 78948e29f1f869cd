"""Pallas TPU kernel: fused linear-blend-skinning apply.

The LBS hot spot is: T16 = A16 @ W^T (per-vertex 4x4 transforms as 16
channels over V) followed by the homogeneous apply. Unfused, T16 is a
(B, 16, V) intermediate (~900 MB at B=2048, V=6890) written to and re-read
from HBM. This kernel tiles V through VMEM and keeps T16 entirely on-chip:
per (batch, V-tile) grid cell it computes the (16, TILE) transform block on
the MXU and immediately applies it to the vertex tile on the VPU.

Numerics identical to the XLA path (f32 accumulate); `fused_skinning` picks
the kernel on TPU and falls back to pure XLA elsewhere (or set
ROMP_TPU_NO_PALLAS=1).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

TILE_V = 1024
TILE_B = 8


def _skinning_kernel(a16_ref, w_ref, vpos_ref, out_ref):
    """Grid cell: TILE_B batch elements x one V tile.

    a16_ref: (TILE_B, 16, J); w_ref: (TILE, J); vpos_ref: (TILE_B, 3, TILE);
    out_ref: (TILE_B, 3, TILE). The TILE_B transforms are computed as ONE
    (TILE_B*16, J) x (J, TILE) MXU matmul.
    """
    J = a16_ref.shape[-1]
    t16 = jnp.dot(a16_ref[...].reshape(TILE_B * 16, J), w_ref[...].T,
                  preferred_element_type=jnp.float32)
    t16 = t16.reshape(TILE_B, 16, -1)
    for m in range(3):
        out_ref[:, m, :] = (
            t16[:, 4 * m + 0] * vpos_ref[:, 0, :]
            + t16[:, 4 * m + 1] * vpos_ref[:, 1, :]
            + t16[:, 4 * m + 2] * vpos_ref[:, 2, :]
            + t16[:, 4 * m + 3])


@partial(jax.jit, static_argnames=("interpret",))
def skinning_pallas(a16: jax.Array, weights: jax.Array, v_posed: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """a16: (B, 16, J); weights: (V, J); v_posed: (B, 3, V) -> (B, 3, V)."""
    from jax.experimental import pallas as pl

    B, _, J = a16.shape
    V = weights.shape[0]
    pad_v = (-V) % TILE_V
    pad_b = (-B) % TILE_B
    if pad_v:
        weights = jnp.pad(weights, ((0, pad_v), (0, 0)))
        v_posed = jnp.pad(v_posed, ((0, 0), (0, 0), (0, pad_v)))
    if pad_b:
        a16 = jnp.pad(a16, ((0, pad_b), (0, 0), (0, 0)))
        v_posed = jnp.pad(v_posed, ((0, pad_b), (0, 0), (0, 0)))
    Vp, Bp = V + pad_v, B + pad_b

    out = pl.pallas_call(
        _skinning_kernel,
        grid=(Bp // TILE_B, Vp // TILE_V),
        in_specs=[
            pl.BlockSpec((TILE_B, 16, J), lambda b, v: (b, 0, 0)),
            pl.BlockSpec((TILE_V, J), lambda b, v: (v, 0)),
            pl.BlockSpec((TILE_B, 3, TILE_V), lambda b, v: (b, 0, v)),
        ],
        out_specs=pl.BlockSpec((TILE_B, 3, TILE_V), lambda b, v: (b, 0, v)),
        out_shape=jax.ShapeDtypeStruct((Bp, 3, Vp), jnp.float32),
        interpret=interpret,
    )(a16, weights, v_posed)
    return out[:B, :, :V]


def skinning_xla(a16: jax.Array, weights: jax.Array,
                 v_posed: jax.Array) -> jax.Array:
    """Reference XLA path (materializes T16)."""
    t16 = jnp.einsum("bkj,vj->bkv", a16, weights)
    return jnp.stack([
        t16[:, 4 * m + 0] * v_posed[:, 0] + t16[:, 4 * m + 1] * v_posed[:, 1]
        + t16[:, 4 * m + 2] * v_posed[:, 2] + t16[:, 4 * m + 3]
        for m in range(3)], axis=1)


def _skinning_fwd_impl(a16, weights, v_posed):
    use_pallas = (jax.default_backend() == "tpu"
                  and not os.environ.get("ROMP_TPU_NO_PALLAS"))
    if use_pallas:
        try:
            return skinning_pallas(a16, weights, v_posed)
        except Exception:
            pass
    return skinning_xla(a16, weights, v_posed)


@jax.custom_vjp
def fused_skinning(a16: jax.Array, weights: jax.Array,
                   v_posed: jax.Array) -> jax.Array:
    """Skinning with a Pallas forward and an analytic XLA backward
    (pallas_call is not auto-differentiable; training needs grads w.r.t.
    the joint transforms and posed vertices — lbs weights are model
    constants and get a zero cotangent)."""
    return _skinning_fwd_impl(a16, weights, v_posed)


def _fused_skinning_fwd(a16, weights, v_posed):
    return _skinning_fwd_impl(a16, weights, v_posed), (a16, weights, v_posed)


def _fused_skinning_bwd(res, g):
    a16, weights, v_posed = res
    B, _, J = a16.shape
    # verts[b,m,v] = sum_n T16[b,4m+n,v] * vpos[b,n,v] + T16[b,4m+3,v]
    t16 = jnp.einsum("bkj,vj->bkv", a16, weights)
    dv = jnp.stack([
        sum(t16[:, 4 * m + n] * g[:, m] for m in range(3))
        for n in range(3)], axis=1)                        # (B, 3, V)
    vh = jnp.concatenate([v_posed, jnp.ones_like(v_posed[:, :1])], axis=1)
    # da16[b, 4m+n, j] = sum_v g[b,m,v] * vh[b,n,v] * W[v,j]
    da_mn = jnp.einsum("bmv,bnv,vj->bmnj", g, vh, weights)  # (B, 3, 4, J)
    da16 = jnp.concatenate(
        [da_mn.reshape(B, 12, J), jnp.zeros((B, 4, J), da_mn.dtype)], axis=1)
    return da16, jnp.zeros_like(weights), dv


fused_skinning.defvjp(_fused_skinning_fwd, _fused_skinning_bwd)
