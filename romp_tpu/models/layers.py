"""Functional NN layer library over a flat parameter dict.

Design: parameters live in ONE flat dict {name: array} whose keys are chosen
to match the reference torch state_dict exactly (e.g.
"backbone.layer1.0.conv1.weight"). This makes released-checkpoint conversion
a pure dtype/layout transform (conv OIHW -> HWIO), keeps the whole model a
pure function of a pytree (jit/grad/shard-friendly), and avoids any module
framework between the math and XLA.

A `ParamStore` runs in two modes:
- init mode (no params given): each layer call creates its parameter with the
  right shape/init and records it;
- apply mode: layers read parameters; BatchNorm in train mode records
  batch-statistics updates into `store.stats_updates` for the train step to
  fold into the running stats (momentum update), keeping apply pure.

Layout: NHWC activations, HWIO conv kernels (TPU-native). Mixed precision via
`compute_dtype`: parameters stay f32; convs cast inputs/kernels to bf16 and
accumulate in f32 (MXU-friendly), BatchNorm/statistics stay f32.

Reference architecture blocks mirrored here: BasicBlock / Bottleneck / head
convs of `simple_romp/romp/model.py:54-123,445-468`.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]

BN_MOMENTUM = 0.1  # torch convention: new = (1-m)*old + m*batch
BN_EPS = 1e-5


class ParamStore:
    """Parameter/state access object threaded through layer functions."""

    def __init__(self, params: Optional[Params] = None,
                 rng: Optional[jax.Array] = None,
                 train: bool = False,
                 compute_dtype=jnp.float32,
                 act_dtype=None,
                 fuse_chains: bool = False):
        self.init_mode = params is None
        self.params: Params = {} if params is None else params
        self.rng = rng
        self.train = train
        # fuse_chains: inference-only — run stride-1 BasicBlock chains
        # through the Pallas fused kernel (ops/pallas_fuse.py): one
        # HBM read + one write per chain instead of per conv, bf16 MXU
        # matmuls with f32 accumulation/BN math (the mixed-path numerics).
        self.fuse_chains = fuse_chains and params is not None and not train
        self.compute_dtype = compute_dtype
        # act_dtype: dtype activations are KEPT in between layers. Defaults
        # to f32 (conv accumulations returned in f32, BN in f32 — the parity
        # path). Setting bfloat16 at inference folds BN to a precomputed
        # scale/shift applied in bf16, halving activation HBM traffic (the
        # backbone is bandwidth-bound at C=32).
        self.act_dtype = act_dtype or jnp.float32
        self.stats_updates: Params = {}

    def _next_rng(self) -> jax.Array:
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def get(self, name: str, shape, init_fn) -> jax.Array:
        if self.init_mode:
            if name not in self.params:
                self.params[name] = init_fn(self._next_rng(), shape)
            return self.params[name]
        p = self.params[name]
        assert p.shape == tuple(shape), (
            f"{name}: stored {p.shape} != expected {tuple(shape)}")
        return p


def _he_normal(rng, shape):
    fan_in = int(np.prod(shape[:-1]))
    return (jax.random.normal(rng, shape, jnp.float32)
            * np.sqrt(2.0 / max(fan_in, 1)))


def _zeros(_, shape):
    return jnp.zeros(shape, jnp.float32)


def _ones(_, shape):
    return jnp.ones(shape, jnp.float32)


def conv2d(store: ParamStore, prefix: str, x: jax.Array, out_ch: int,
           kernel: int = 3, stride: int = 1, padding: Optional[int] = None,
           bias: bool = False) -> jax.Array:
    """2D convolution, torch-compatible explicit symmetric padding.

    `prefix` is the torch module path; weights live at f"{prefix}.weight"
    (stored HWIO) and optionally f"{prefix}.bias".
    """
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    if padding is None:
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
    elif isinstance(padding, int):
        ph = pw = padding
    else:
        ph, pw = padding
    in_ch = x.shape[-1]
    w = store.get(f"{prefix}.weight", (kh, kw, in_ch, out_ch), _he_normal)
    dt = store.compute_dtype
    if store.train:
        # Differentiable mixed precision: mixed conv output dtypes break
        # the backward pass (cotangent/kernel dtype mismatch), so output in
        # the compute dtype and upcast explicitly (TPU still accumulates
        # bf16 convs in f32 internally).
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), window_strides=(stride, stride),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(store.act_dtype)
    else:
        # Inference: emit the activation dtype directly from the conv (no
        # extra upcast buffer — the bf16+f32 pair OOMs HBM at batch 512).
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), window_strides=(stride, stride),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=store.act_dtype,
        )
    if bias:
        b = store.get(f"{prefix}.bias", (out_ch,), _zeros)
        y = y + b.astype(y.dtype)
    return y


def batch_norm(store: ParamStore, prefix: str, x: jax.Array) -> jax.Array:
    """BatchNorm2d. Inference uses running stats; train mode computes batch
    stats (biased variance for normalization, as torch does) and records the
    momentum-updated running stats in `store.stats_updates`.
    """
    ch = x.shape[-1]
    scale = store.get(f"{prefix}.weight", (ch,), _ones)
    offset = store.get(f"{prefix}.bias", (ch,), _zeros)
    mean = store.get(f"{prefix}.running_mean", (ch,), _zeros)
    var = store.get(f"{prefix}.running_var", (ch,), _ones)

    if store.train and not store.init_mode:
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        bmean = jnp.mean(x32, axis=axes)
        bvar = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(bmean)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = bvar * (n / max(n - 1, 1))
        store.stats_updates[f"{prefix}.running_mean"] = (
            (1 - BN_MOMENTUM) * mean + BN_MOMENTUM * bmean)
        store.stats_updates[f"{prefix}.running_var"] = (
            (1 - BN_MOMENTUM) * var + BN_MOMENTUM * unbiased)
        use_mean, use_var = bmean, bvar
    else:
        use_mean, use_var = mean, var

    inv = jax.lax.rsqrt(use_var + BN_EPS) * scale
    if store.act_dtype != jnp.float32 and not store.train:
        # inference fast path: folded scale/shift applied in the activation
        # dtype (params stay f32; the tiny per-channel fold runs in f32)
        shift = offset - use_mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)
    # Train path: statistics/normalization in f32, output re-emitted in the
    # activation dtype — with act_dtype=bf16 the stashed-for-backward
    # activations are half-size (act_dtype defaults to f32 = parity path).
    return ((x.astype(jnp.float32) - use_mean) * inv + offset
            ).astype(store.act_dtype)


def bn_relu(store: ParamStore, prefix: str, x: jax.Array) -> jax.Array:
    return jax.nn.relu(batch_norm(store, prefix, x))


def basic_block(store: ParamStore, prefix: str, x: jax.Array, planes: int,
                stride: int = 1, downsample: bool = False) -> jax.Array:
    """ResNet BasicBlock (`simple_romp/romp/model.py:54-83`)."""
    residual = x
    out = conv2d(store, f"{prefix}.conv1", x, planes, 3, stride)
    out = bn_relu(store, f"{prefix}.bn1", out)
    out = conv2d(store, f"{prefix}.conv2", out, planes, 3, 1)
    out = batch_norm(store, f"{prefix}.bn2", out)
    if downsample:
        residual = conv2d(store, f"{prefix}.downsample.0", x, planes, 1,
                          stride, padding=0)
        residual = batch_norm(store, f"{prefix}.downsample.1", residual)
    return jax.nn.relu(out + residual)


def bottleneck(store: ParamStore, prefix: str, x: jax.Array, planes: int,
               stride: int = 1, downsample: bool = False) -> jax.Array:
    """ResNet Bottleneck, expansion 4 (`simple_romp/romp/model.py:85-123`)."""
    residual = x
    out = conv2d(store, f"{prefix}.conv1", x, planes, 1, 1, padding=0)
    out = bn_relu(store, f"{prefix}.bn1", out)
    out = conv2d(store, f"{prefix}.conv2", out, planes, 3, stride)
    out = bn_relu(store, f"{prefix}.bn2", out)
    out = conv2d(store, f"{prefix}.conv3", out, planes * 4, 1, 1, padding=0)
    out = batch_norm(store, f"{prefix}.bn3", out)
    if downsample:
        residual = conv2d(store, f"{prefix}.downsample.0", x, planes * 4, 1,
                          stride, padding=0)
        residual = batch_norm(store, f"{prefix}.downsample.1", residual)
    return jax.nn.relu(out + residual)


def conv1d(store: ParamStore, prefix: str, x: jax.Array, out_ch: int,
           kernel: int = 3, stride: int = 1, padding: Optional[int] = None,
           bias: bool = False) -> jax.Array:
    """1D convolution over (B, W, C); kernel stored LIO."""
    if padding is None:
        padding = (kernel - 1) // 2
    in_ch = x.shape[-1]
    w = store.get(f"{prefix}.weight", (kernel, in_ch, out_ch), _he_normal)
    dt = store.compute_dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(store.act_dtype)
    if bias:
        y = y + store.get(f"{prefix}.bias", (out_ch,), _zeros)
    return y


def conv3d(store: ParamStore, prefix: str, x: jax.Array, out_ch: int,
           kernel: int = 3, stride: int = 1, padding: Optional[int] = None,
           bias: bool = False) -> jax.Array:
    """3D convolution over (B, D, H, W, C); kernel stored DHWIO."""
    if padding is None:
        padding = (kernel - 1) // 2
    in_ch = x.shape[-1]
    w = store.get(f"{prefix}.weight",
                  (kernel, kernel, kernel, in_ch, out_ch), _he_normal)
    dt = store.compute_dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), window_strides=(stride,) * 3,
        padding=[(padding, padding)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(store.act_dtype)
    if bias:
        y = y + store.get(f"{prefix}.bias", (out_ch,), _zeros)
    return y


def basic_block_conv_ds(store: ParamStore, prefix: str, x: jax.Array,
                        planes: int) -> jax.Array:
    """BasicBlock whose downsample is a bare 1x1 conv WITH bias (no BN) —
    the BEV head variant (`simple_romp/bev/model.py:149-162` passes
    downsample=nn.Conv2d directly)."""
    out = conv2d(store, f"{prefix}.conv1", x, planes, 3, 1)
    out = bn_relu(store, f"{prefix}.bn1", out)
    out = conv2d(store, f"{prefix}.conv2", out, planes, 3, 1)
    out = batch_norm(store, f"{prefix}.bn2", out)
    residual = conv2d(store, f"{prefix}.downsample", x, planes, 1, 1,
                      padding=0, bias=True)
    return jax.nn.relu(out + residual)


def basic_block_1d(store: ParamStore, prefix: str, x: jax.Array,
                   planes: int) -> jax.Array:
    """BEV BasicBlock_1D: conv-bn-relu-conv-bn-relu, NO residual
    (`simple_romp/bev/model.py:24-45`)."""
    out = conv1d(store, f"{prefix}.conv1", x, planes, 3, 1)
    out = bn_relu(store, f"{prefix}.bn1", out)
    out = conv1d(store, f"{prefix}.conv2", out, planes, 3, 1)
    return jax.nn.relu(batch_norm(store, f"{prefix}.bn2", out))


def _conv2d_zband(store: ParamStore, prefix: str, x2: jax.Array, D: int,
                  in_ch: int, out_ch: int) -> jax.Array:
    """3x3x3 SAME stride-1 conv3d recast as a 2D conv with the depth axis
    folded into channels.

    x2: (B, H, W, D*in_ch) with channel index d*in_ch + c. The stored
    parameter keeps the conv3d shape/name (3, 3, 3, Cin, Cout) DHWIO; at
    trace time it is scattered into a z-banded (3, 3, D*Cin, D*Cout) 2D
    kernel: W2[ky, kx, di*Cin+ci, do*Cout+co] = w[di-do+1, ky, kx, ci, co]
    for |di-do| <= 1, zero elsewhere (the zero band edges reproduce the
    SAME zero-padding along depth).

    Why: the BEV/TRACE map refiners run conv3d at Cin = Cout in {1, 3} —
    an MXU lane occupancy of 1/128..3/128 and one HBM round trip per tap
    plane. Folding D=64 depth bins into channels gives a (D*C)-lane dense
    matmul per pixel; the 64/3x extra multiply-adds are zeros that ride in
    otherwise-idle lanes, and XLA tiles one ordinary NHWC conv instead of a
    degenerate NDHWC one (measured ~25x on the batch-128 BEV refiners).
    """
    w = store.get(f"{prefix}.weight", (3, 3, 3, in_ch, out_ch), _he_normal)
    dt = store.compute_dtype
    # band[z, di, do] = 1 where the z-th tap couples input depth di to
    # output depth do = di + 1 - z (conv: out[do] = sum_z in[do+z-1]*w[z]).
    band = jnp.stack([jnp.eye(D, k=1 - z, dtype=dt) for z in range(3)])
    w2 = jnp.einsum("zyxio,zde->yxdieo", w.astype(dt), band)
    w2 = w2.reshape(3, 3, D * in_ch, D * out_ch)
    return jax.lax.conv_general_dilated(
        x2.astype(dt), w2, window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(store.act_dtype)


def basic_block_3d(store: ParamStore, prefix: str, x: jax.Array,
                   planes: int) -> jax.Array:
    """BEV BasicBlock_3D: conv-bn-relu-conv-bn + residual, NO final relu
    (`simple_romp/bev/model.py:52-75`).

    Runs in depth-folded layout (see `_conv2d_zband`): one transpose in,
    both convs + BN + residual on (B, H, W, D*C), one transpose out. BN
    operates on a free (B, H, W, D, C) minor-dim view, so train-mode batch
    statistics reduce over (B, D, H, W) exactly like BatchNorm3d.
    """
    B, D, H, W, C = x.shape
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, D * C)

    def bn(name, h, relu):
        h = batch_norm(store, name, h.reshape(B, H, W, D, planes))
        if relu:
            h = jax.nn.relu(h)
        return h.reshape(B, H, W, D * planes)

    out = _conv2d_zband(store, f"{prefix}.conv1", x2, D, C, planes)
    out = bn(f"{prefix}.bn1", out, relu=True)
    out = _conv2d_zband(store, f"{prefix}.conv2", out, D, planes, planes)
    out = bn(f"{prefix}.bn2", out, relu=False) + x2.astype(store.act_dtype)
    return out.reshape(B, H, W, D, C).transpose(0, 3, 1, 2, 4)


def conv_transpose2d(store: ParamStore, prefix: str, x: jax.Array,
                     out_ch: int, kernel: int = 4, stride: int = 2,
                     torch_padding: int = 1) -> jax.Array:
    """Transposed conv matching torch ConvTranspose2d numerics.

    Kernel stored HWOI (torch (I, O, H, W) -> transpose(2, 3, 1, 0));
    lax.conv_transpose(transpose_kernel=True) with padding
    kernel - 1 - torch_padding reproduces torch's output exactly
    (verified: max dev 2e-7 vs ConvTranspose2d(k=4, s=2, p=1)).
    """
    in_ch = x.shape[-1]
    w = store.get(f"{prefix}.weight", (kernel, kernel, out_ch, in_ch),
                  _he_normal)
    p = kernel - 1 - torch_padding
    dt = store.compute_dtype
    return jax.lax.conv_transpose(
        x.astype(dt), w.astype(dt), strides=(stride, stride),
        padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    ).astype(store.act_dtype)


def max_pool2d(x: jax.Array, window: int, stride: int,
               padding: int) -> jax.Array:
    """Strided max pool with torch-style symmetric padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def linear(store: ParamStore, prefix: str, x: jax.Array,
           out_ch: int) -> jax.Array:
    """Dense layer; torch Linear weight (O, I) kept as stored (matmul x W^T)."""
    in_ch = x.shape[-1]
    w = store.get(f"{prefix}.weight", (out_ch, in_ch), _he_normal)
    b = store.get(f"{prefix}.bias", (out_ch,), _zeros)
    return x @ w.T + b


def embedding_lookup(store: ParamStore, prefix: str, ids: jax.Array,
                     num: int, dim: int) -> jax.Array:
    w = store.get(f"{prefix}.weight", (num, dim), _he_normal)
    return w[ids]


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbor upsample by an integer factor (NHWC)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def max_pool_same(x: jax.Array, window: int) -> jax.Array:
    """Max pool, stride 1, torch-style symmetric padding (for heatmap NMS)."""
    pad = (window - 1) // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
