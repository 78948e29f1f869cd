"""RAFT optical flow — JAX port of the recurrent all-pairs field transform.

Parity target: the vendored `simple_romp/trace2/models/raft/` (basic variant:
256-dim instance-norm feature encoder, batch-norm context encoder, 4-level
all-pairs correlation pyramid with radius-4 lookup, 12 SepConvGRU update
iterations, convex-combination 8x flow upsampling). Parameter names equal the
torch state_dict keys so released raft-things checkpoints convert directly.

TPU notes: the all-pairs correlation is one big (B, H*W, C) x (B, C, H*W)
matmul (MXU); the per-iteration pyramid lookup is a batched bilinear gather;
the update loop is a python-unrolled 12-step chain (static iteration count).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import ParamStore, batch_norm, conv2d
from romp_tpu.ops.deform_conv import bilinear_sample

HDIM = CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free InstanceNorm2d (torch default: affine=False)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _norm(store, prefix, x, kind):
    if kind == "instance":
        return instance_norm(x)
    if kind == "batch":
        return batch_norm(store, prefix, x)
    return x


def _residual_block(store: ParamStore, prefix: str, x: jax.Array,
                    planes: int, norm: str, stride: int = 1) -> jax.Array:
    y = conv2d(store, f"{prefix}.conv1", x, planes, 3, stride, bias=True)
    y = jax.nn.relu(_norm(store, f"{prefix}.norm1", y, norm))
    y = conv2d(store, f"{prefix}.conv2", y, planes, 3, 1, bias=True)
    y = jax.nn.relu(_norm(store, f"{prefix}.norm2", y, norm))
    if stride != 1:
        x = conv2d(store, f"{prefix}.downsample.0", x, planes, 1, stride,
                   padding=0, bias=True)
        # torch registers this norm twice (as `norm3` and `downsample.1`);
        # we use `norm3` and checkpoint loading drops the alias.
        x = _norm(store, f"{prefix}.norm3", x, norm)
    return jax.nn.relu(x + y)


def basic_encoder(store: ParamStore, prefix: str, x: jax.Array,
                  output_dim: int, norm: str) -> jax.Array:
    """(B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, output_dim)."""
    x = conv2d(store, f"{prefix}.conv1", x, 64, 7, 2, padding=3, bias=True)
    x = jax.nn.relu(_norm(store, f"{prefix}.norm1", x, norm))
    for li, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)], 1):
        x = _residual_block(store, f"{prefix}.layer{li}.0", x, planes, norm,
                            stride)
        x = _residual_block(store, f"{prefix}.layer{li}.1", x, planes, norm, 1)
    return conv2d(store, f"{prefix}.conv2", x, output_dim, 1, 1, padding=0,
                  bias=True)


def build_corr_pyramid(fmap1: jax.Array, fmap2: jax.Array,
                       out_dtype=jnp.float32) -> List[jax.Array]:
    """All-pairs correlation + 2x average pools.

    fmap*: (B, H, W, C). Returns levels of (B, H*W, H_i, W_i).

    out_dtype: storage dtype of the pyramid. The volume is the biggest
    tensor RAFT touches (H²W² floats) and every refinement iteration
    re-reads it through corr_lookup's one-hot matmuls, so bfloat16 halves
    the dominant HBM traffic AND doubles the lookup's MXU rate. Values are
    C-normalized correlations (O(1) scale), so bf16's ~0.4% relative
    rounding is benign; accumulation stays f32 (preferred_element_type).
    f32 = reference parity (the torch code keeps the volume float,
    raft.py:95-96, even under autocast).
    """
    B, H, W, C = fmap1.shape
    corr = jnp.einsum("bxc,byc->bxy", fmap1.reshape(B, H * W, C),
                      fmap2.reshape(B, H * W, C),
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(C, corr.dtype))
    corr = corr.reshape(B, H * W, H, W).astype(out_dtype)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        corr = jax.lax.reduce_window(
            corr, jnp.asarray(0.0, out_dtype), jax.lax.add, (1, 1, 2, 2),
            (1, 1, 2, 2), "VALID") / jnp.asarray(4.0, out_dtype)
        pyramid.append(corr)
    return pyramid


def corr_lookup_onehot(pyramid: List[jax.Array], coords: jax.Array,
                       radius: int = CORR_RADIUS) -> jax.Array:
    """coords: (B, H, W, 2) (x, y) target positions. Returns
    (B, H, W, LEVELS*(2r+1)^2) sampled correlation features.

    One-hot formulation: all (2r+1)^2 window taps share one fractional
    offset, so the whole window is two one-hot contractions (rows then cols,
    out-of-range rows/cols are all-zero = zero padding) followed by a 2x2
    bilinear blend of the (2r+2)^2 integer patch. Replaced per-point gathers
    (scalar loops on TPU) in round 2. Measured on-chip round 4
    (scripts/flow_bisect.py, B=8 64^2): 14.0 ms/iteration inside the
    refinement scan — op-latency-bound on the 32K-per-level tiny
    (W2, Hi)@(Hi, Wi) batched matmuls, NOT HBM-bound (a bf16 volume changes
    nothing), and still 2x faster than the take_along_axis row-gather
    variant (corr_lookup_rowgather, 29 ms/iter: per-point dynamic gathers
    lower worse than one-hot MXU contractions on TPU).
    """
    B, H, W, _ = coords.shape
    r = radius
    W2 = 2 * r + 2
    outs = []
    for i, corr in enumerate(pyramid):
        Hi, Wi = corr.shape[2:]
        maps = corr.reshape(B, H * W, Hi, Wi)
        c = coords.reshape(B, H * W, 2) / (2 ** i)
        x, y = c[..., 0], c[..., 1]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = (y - y0)[..., None, None]                    # (B, P, 1, 1)
        fx = (x - x0)[..., None, None]

        j = jnp.arange(W2, dtype=jnp.int32) - r           # window offsets
        rows_idx = y0.astype(jnp.int32)[..., None] + j    # (B, P, W2)
        cols_idx = x0.astype(jnp.int32)[..., None] + j
        wr = (rows_idx[..., None]
              == jnp.arange(Hi, dtype=jnp.int32)).astype(maps.dtype)
        wc = (cols_idx[..., None]
              == jnp.arange(Wi, dtype=jnp.int32)).astype(maps.dtype)
        rows = jnp.einsum("bpjh,bphw->bpjw", wr, maps,
                          preferred_element_type=jnp.float32)
        patch = jnp.einsum("bpkw,bpjw->bpjk", wc, rows,
                           preferred_element_type=jnp.float32)
        # shared-fraction bilinear blend of the integer patch:
        # out[dy, dx] = lerp_y(lerp_x(patch)) at window tap (dy, dx)
        px = (patch[..., :, :-1] * (1.0 - fx)
              + patch[..., :, 1:] * fx)                   # (B, P, W2, 2r+1)
        win = (px[..., :-1, :] * (1.0 - fy)
               + px[..., 1:, :] * fy)                     # (B, P, 2r+1, 2r+1)
        # channel order parity with the reference (`raft/corr.py:37-42`):
        # tap t = a*(2r+1)+b carries (dx=d[a], dy=d[b]) -> transpose so the
        # x-offset axis is channel-major.
        win = win.swapaxes(-1, -2)
        outs.append(win.reshape(B, H, W, -1))
    return jnp.concatenate(outs, axis=-1)


def corr_lookup_rowgather(pyramid: List[jax.Array], coords: jax.Array,
                          radius: int = CORR_RADIUS) -> jax.Array:
    """corr_lookup via a contiguous ROW gather + one-hot column contraction.

    The window rows [y0-r, y0+r+1] are consecutive, so selecting them is a
    take_along_axis over the row axis — each gathered element is a full
    contiguous (Wi,)-lane row, which TPU executes as vectorized dynamic
    slices instead of the one-hot form's 32K tiny (W2, Hi)@(Hi, Wi) matmuls.
    Memory: W2/Hi of the volume per iteration instead of ALL of it (6.4x
    less at level 0). Out-of-range rows fill with 0 (mode="fill") = the
    reference's zero padding; the column selection stays a one-hot einsum on
    the (W2, Wi) strips (cheap, exact). Identical math to corr_lookup_onehot
    (selection + shared-fraction bilinear blend); parity is tested in
    tests/test_raft.py.

    Measured on-chip round 4 (scripts/flow_bisect.py): 29 ms/iteration vs
    14 for the one-hot form — the hypothesis that less HBM traffic wins was
    FALSE (the lookup is op-latency-bound, and take_along_axis lowers to
    per-point dynamic gathers that are slower than one-hot MXU
    contractions). Kept as the measured record + CPU-friendly alternative.
    """
    B, H, W, _ = coords.shape
    r = radius
    W2 = 2 * r + 2
    j = jnp.arange(W2, dtype=jnp.int32) - r
    outs = []
    for i, corr in enumerate(pyramid):
        Hi, Wi = corr.shape[2:]
        maps = corr.reshape(B, H * W, Hi, Wi)
        c = coords.reshape(B, H * W, 2) / (2 ** i)
        x, y = c[..., 0], c[..., 1]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = (y - y0)[..., None, None]
        fx = (x - x0)[..., None, None]

        rows_idx = y0.astype(jnp.int32)[..., None] + j        # (B, P, W2)
        cols_idx = x0.astype(jnp.int32)[..., None] + j
        # mode="fill" zero-fills indices >= Hi but WRAPS negatives (numpy
        # semantics), so remap negatives out of range to get zero padding
        # on both sides like the one-hot form / reference grid_sample.
        rows_idx = jnp.where(rows_idx < 0, Hi, rows_idx)
        rows = jnp.take_along_axis(
            maps, rows_idx[..., None], axis=2, mode="fill",
            fill_value=0)                                     # (B, P, W2, Wi)
        wc = (cols_idx[..., None]
              == jnp.arange(Wi, dtype=jnp.int32)).astype(maps.dtype)
        patch = jnp.einsum("bpkw,bpjw->bpjk", wc, rows,
                           preferred_element_type=jnp.float32)
        px = (patch[..., :, :-1] * (1.0 - fx)
              + patch[..., :, 1:] * fx)
        win = (px[..., :-1, :] * (1.0 - fy)
               + px[..., 1:, :] * fy)
        win = win.swapaxes(-1, -2)
        outs.append(win.reshape(B, H, W, -1))
    return jnp.concatenate(outs, axis=-1)


def pack_corr_pyramid(pyramid: List[jax.Array]):
    """Concatenate the pyramid levels into ONE (B, P, sum(Hi), maxW) buffer.

    Level i occupies rows [off_i, off_i + Hi) and columns [0, Wi) (the
    column tail is zero-padded to the widest level so every level shares
    the lane dimension). Done once per clip, outside the refinement scan,
    so corr_lookup_packed can run the whole 4-level window extraction as
    TWO batched matmuls per iteration instead of eight.
    """
    B, P = pyramid[0].shape[:2]
    maxw = pyramid[0].shape[3]
    dims, off = [], 0
    blocks = []
    for corr in pyramid:
        Hi, Wi = corr.shape[2:]
        blocks.append(jnp.pad(corr, ((0, 0), (0, 0), (0, 0),
                                     (0, maxw - Wi))))
        dims.append((Hi, Wi, off))
        off += Hi
    return jnp.concatenate(blocks, axis=2), tuple(dims)


def corr_lookup_packed(packed, coords: jax.Array,
                       radius: int = CORR_RADIUS) -> jax.Array:
    """corr_lookup on a pack_corr_pyramid buffer: all levels in TWO batched
    matmuls per iteration.

    The one-hot form (corr_lookup_onehot) is op-latency-bound: 8 batched
    matmuls per iteration of 32K tiny (10, Hi)@(Hi, Wi) elements each
    (14 ms/iter on-chip, scripts/flow_bisect.py). Two structural changes:

    1. The bilinear fraction folds INTO the selection weights: row tap j of
       level i reads map row h with tent weight max(0, 1-|y_i + j - r - h|)
       — exactly one-hot(floor)+lerp for in-range taps and zero padding
       outside, so the post-matmul lerp disappears and the tap axis shrinks
       (2r+2) -> (2r+1).
    2. All 4 levels concatenate along the contraction axis (block-diagonal
       tent weights, K = sum(Hi) = 120), so the eight tiny matmuls become
       two per iteration: rows (B*P) x (36, 120)@(120, 64), then the window
       blend (B*P) x (36, 64)@(64, 36) whose off-diagonal level blocks are
       sliced away (wasted FLOPs are trivial; dispatch count is what costs).

    Identical taps + identical blend as the reference grid_sample
    (`trace2/models/raft/corr.py:30-42`); parity vs corr_lookup_onehot is
    tested to f32 tolerance in tests/test_raft.py.

    Measured on-chip round 4 (scripts/flow_bisect.py, B=8 64^2): 9.35
    ms/iteration standalone, and a FULL refinement iteration (lookup +
    motion encoder + GRU + flow head) drops 19 -> 11.2 ms — the scan is
    still lookup-bound (update block alone: 0.97 ms), but the 20-iteration
    parity scan sheds ~160 ms/clip. This is the active formulation.
    """
    buf, dims = packed
    B, H, W, _ = coords.shape
    r = radius
    T = 2 * r + 1
    P = H * W
    K = buf.shape[2]
    maxw = buf.shape[3]
    c = coords.reshape(B, P, 2)
    j = jnp.arange(T, dtype=jnp.float32) - r

    wr_blocks, wc_blocks = [], []
    hh = jnp.arange(K, dtype=jnp.float32)
    ww = jnp.arange(maxw, dtype=jnp.float32)
    for i, (Hi, Wi, off) in enumerate(dims):
        ci = c / (2 ** i)
        # tap centers (B, P, T); tent weights vs the global row index
        yc = ci[..., 1:2] + j + off
        xc = ci[..., 0:1] + j
        wr_i = jnp.maximum(0.0, 1.0 - jnp.abs(yc[..., None] - hh))
        # zero out rows belonging to other levels (tent tails at block
        # borders would otherwise leak into the neighbor level)
        wr_i = wr_i * ((hh >= off) & (hh < off + Hi))
        wc_i = jnp.maximum(0.0, 1.0 - jnp.abs(xc[..., None] - ww))
        wc_i = wc_i * (ww < Wi)
        wr_blocks.append(wr_i)
        wc_blocks.append(wc_i)
    wr = jnp.concatenate(wr_blocks, axis=2).astype(buf.dtype)  # (B,P,4T,K)
    wc = jnp.concatenate(wc_blocks, axis=2).astype(buf.dtype)  # (B,P,4T,mw)

    rows = jnp.einsum("bpjh,bphw->bpjw", wr, buf,
                      preferred_element_type=jnp.float32)      # (B,P,4T,mw)
    full = jnp.einsum("bpkw,bpjw->bpjk", wc, rows,
                      preferred_element_type=jnp.float32)      # (B,P,4T,4T)
    outs = []
    for i in range(len(dims)):
        win = full[:, :, i * T:(i + 1) * T, i * T:(i + 1) * T]
        # channel order parity with the reference (`raft/corr.py:37-42`):
        # x-offset axis channel-major (same transpose as the other forms)
        outs.append(win.swapaxes(-1, -2).reshape(B, H, W, -1))
    return jnp.concatenate(outs, axis=-1)


# Active formulation for raft_refine. All variants are exact selections of
# the same taps + the same blend, so this is a pure performance switch;
# measured on-chip in scripts/flow_bisect.py (onehot 14.0, rowgather 29,
# packed 9.35 ms/iter at the B=8 64^2 parity config).
corr_lookup = corr_lookup_packed


def _motion_encoder(store: ParamStore, flow: jax.Array,
                    corr: jax.Array) -> jax.Array:
    p = "update_block.encoder"
    cor = jax.nn.relu(conv2d(store, f"{p}.convc1", corr, 256, 1, 1,
                             padding=0, bias=True))
    cor = jax.nn.relu(conv2d(store, f"{p}.convc2", cor, 192, 3, 1, bias=True))
    flo = jax.nn.relu(conv2d(store, f"{p}.convf1", flow, 128, 7, 1,
                             padding=3, bias=True))
    flo = jax.nn.relu(conv2d(store, f"{p}.convf2", flo, 64, 3, 1, bias=True))
    out = jax.nn.relu(conv2d(store, f"{p}.conv",
                             jnp.concatenate([cor, flo], -1), 126, 3, 1,
                             bias=True))
    return jnp.concatenate([out, flow], axis=-1)


def _sep_conv_gru(store: ParamStore, h: jax.Array, x: jax.Array) -> jax.Array:
    p = "update_block.gru"

    def half(h, suffix, kernel_hw):
        hx = jnp.concatenate([h, x], axis=-1)

        def cv(name, inp):
            return conv2d(store, f"{p}.{name}{suffix}", inp, HDIM,
                          kernel_hw, 1, bias=True)

        z = jax.nn.sigmoid(cv("convz", hx))
        r = jax.nn.sigmoid(cv("convr", hx))
        q = jnp.tanh(cv("convq", jnp.concatenate([r * h, x], -1)))
        return (1 - z) * h + z * q

    h = half(h, "1", (1, 5))
    h = half(h, "2", (5, 1))
    return h


def _flow_head(store: ParamStore, net: jax.Array) -> jax.Array:
    p = "update_block.flow_head"
    y = jax.nn.relu(conv2d(store, f"{p}.conv1", net, 256, 3, 1, bias=True))
    return conv2d(store, f"{p}.conv2", y, 2, 3, 1, bias=True)


def _mask_head(store: ParamStore, net: jax.Array) -> jax.Array:
    p = "update_block.mask"
    y = jax.nn.relu(conv2d(store, f"{p}.0", net, 256, 3, 1, bias=True))
    return 0.25 * conv2d(store, f"{p}.2", y, 64 * 9, 1, 1, padding=0,
                         bias=True)


def upsample_flow_convex(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Convex-combination 8x upsampling (`raft.py:67-80`).

    flow: (B, H, W, 2); mask: (B, H, W, 64*9). Returns (B, 8H, 8W, 2).
    """
    B, H, W, _ = flow.shape
    mask = mask.reshape(B, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of 8*flow via shifts (zero padded like F.unfold)
    f = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([f[:, i:i + H, j:j + W] for i in range(3)
                       for j in range(3)], axis=3)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)


def raft_refine(store: ParamStore, fmap1: jax.Array, fmap2: jax.Array,
                cnet: jax.Array, iters: int,
                corr_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Shared refinement body: encoder outputs -> (flow_low, flow_up).

    fmap1/fmap2: (B, H, W, 256) fnet features of the frame pairs; cnet:
    (B, H, W, HDIM+CDIM) context features of frame 1. Split out of
    raft_forward so the sequence formulation (fnet shared across
    overlapping pairs, see raft_forward_seq) reuses the exact same math.
    """
    pyramid = build_corr_pyramid(fmap1, fmap2, out_dtype=corr_dtype)
    packed = pack_corr_pyramid(pyramid) if corr_lookup is corr_lookup_packed \
        else None
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    B, H, W, _ = fmap1.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (B, H, W, 2))
    coords1 = coords0

    # The recurrent refinement is a lax.scan: one compiled iteration body
    # instead of `iters` unrolled copies (compile time at 512^2 goes from
    # minutes to seconds). Inference only needs the FINAL convex upsample;
    # the reference computes it per-iteration solely for its training loss
    # (raft.py:24 flow_predictions list).
    def step(carry, _):
        net_c, coords1_c = carry
        corr = (corr_lookup_packed(packed, coords1_c) if packed is not None
                else corr_lookup(pyramid, coords1_c))
        flow = coords1_c - coords0
        motion = _motion_encoder(store, flow, corr)
        net_c = _sep_conv_gru(store, net_c,
                              jnp.concatenate([inp, motion], -1))
        delta = _flow_head(store, net_c)
        return (net_c, coords1_c + delta), None

    # materialize GRU params once so the scan body sees a complete store
    (net, coords1), _ = step((net, coords1), None)
    (net, coords1), _ = jax.lax.scan(step, (net, coords1), None,
                                     length=iters - 1)
    mask = _mask_head(store, net)
    flow_up = upsample_flow_convex(coords1 - coords0, mask)
    return coords1 - coords0, flow_up


def raft_forward(store: ParamStore, image1: jax.Array, image2: jax.Array,
                 iters: int = 12,
                 corr_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """RGB images (B, H, W, 3) in [0, 255] -> (flow_low, flow_up).

    flow_low: (B, H/8, W/8, 2); flow_up: (B, H, W, 2), both (dx, dy).
    """
    image1 = 2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0
    image2 = 2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0
    fmap1 = basic_encoder(store, "fnet", image1, 256, "instance")
    fmap2 = basic_encoder(store, "fnet", image2, 256, "instance")
    cnet = basic_encoder(store, "cnet", image1, HDIM + CDIM, "batch")
    return raft_refine(store, fmap1, fmap2, cnet, iters, corr_dtype)


def raft_forward_seq(store: ParamStore, frames_seq: jax.Array,
                     iters: int = 12,
                     corr_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Flow over CONSECUTIVE frames: (T+1, H, W, 3) in [0, 255] ->
    (flow_low, flow_up) for the T pairs (t, t+1).

    The pairwise entry (raft_forward) runs fnet on both `prev` and `cur`
    stacks, but in a video stream those overlap: frame t is pair t's `cur`
    AND pair t+1's `prev`, so 2T-1 of the 2T fnet passes hit only T+1
    unique frames. Here fnet runs ONCE over the unique frames and the pair
    features are slices — same per-frame math (fnet/instance-norm are
    per-sample), ~1/3 less encoder compute per clip. cnet runs on the T
    `prev` frames exactly as the reference does (`trace2/models/raft/
    raft.py` context branch on image1).
    """
    imgs = 2.0 * (frames_seq.astype(jnp.float32) / 255.0) - 1.0
    fmaps = basic_encoder(store, "fnet", imgs, 256, "instance")
    cnet = basic_encoder(store, "cnet", imgs[:-1], HDIM + CDIM, "batch")
    return raft_refine(store, fmaps[:-1], fmaps[1:], cnet, iters,
                       corr_dtype)


def filter_raft_state_dict(params: dict) -> dict:
    """Drop torch's duplicate `downsample.1` norm aliases (same tensors as
    `norm3`) from a converted RAFT checkpoint."""
    return {k: v for k, v in params.items() if ".downsample.1." not in k}


def make_trace_flow_fn(raft_params: dict, iters: int = 20,
                       out_size: int = 128,
                       compute_dtype: str = "float32",
                       flow_input_size: int = 512,
                       corr_dtype: str = "float32",
                       sequence: bool = False):
    """Flow extractor for TRACE, matching the reference FlowExtract
    (`trace2/models/raft/process.py:17-28`): RAFT at full 512 resolution,
    bilinearly resized to 128x128 and divided by 8 (flow-vector units on the
    feature map grid). Returns a jitted fn (prev, cur) -> (T, 128, 128, 2).

    compute_dtype="bfloat16" halves the dominant HBM traffic (the all-pairs
    correlation volume is ~0.5 GB/clip at f32); iteration math and the flow
    accumulator stay f32 via the update loop's residual structure.

    flow_input_size < 512 is the fast path: frames are resized on device
    before RAFT (256 quarters the encoder pixels and shrinks the correlation
    volume 16x) and the flow vectors are rescaled back to 512-equivalent
    units, so downstream consumers see the same convention. Parity default
    stays 512.

    sequence=True returns a fn over ONE stacked frame sequence
    (T+1, H, W, 3) -> flows for the T consecutive pairs, running fnet once
    per unique frame instead of twice (raft_forward_seq). The returned fn
    carries `.takes_sequence = True` so TracePipeline picks the right call
    convention. Same math, same outputs (tested), less encoder compute —
    this is the streaming default.
    """
    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    cdt = jnp.bfloat16 if corr_dtype == "bfloat16" else jnp.float32
    S = flow_input_size

    def _postprocess(flow_up):
        flow_up = flow_up.astype(jnp.float32)
        flow = jax.image.resize(
            flow_up, (flow_up.shape[0], out_size, out_size, 2), "bilinear")
        return flow * (512.0 / S) / 8.0

    def _resize(f):
        return jax.image.resize(
            f.astype(jnp.float32), (f.shape[0], S, S, 3), "bilinear")

    if sequence:
        @jax.jit
        def _seq_impl(frames_seq):
            store = ParamStore(raft_params, compute_dtype=dt, act_dtype=dt)
            if S != frames_seq.shape[1]:
                frames_seq = _resize(frames_seq)
            _, flow_up = raft_forward_seq(store, frames_seq, iters=iters,
                                          corr_dtype=cdt)
            return _postprocess(flow_up)

        # plain-def wrapper: custom attributes can't be set on a jitted
        # callable, and TracePipeline dispatches on .takes_sequence
        def flow_seq_fn(frames_seq):
            return _seq_impl(frames_seq)

        flow_seq_fn.takes_sequence = True
        return flow_seq_fn

    @jax.jit
    def flow_fn(frames_prev, frames_cur):
        store = ParamStore(raft_params, compute_dtype=dt, act_dtype=dt)
        if S != frames_prev.shape[1]:
            frames_prev, frames_cur = _resize(frames_prev), _resize(
                frames_cur)
        _, flow_up = raft_forward(store, frames_prev, frames_cur,
                                  iters=iters, corr_dtype=cdt)
        return _postprocess(flow_up)

    return flow_fn


def init_raft_params(rng: jax.Array, size: int = 64):
    store = ParamStore(rng=rng)
    img = jnp.zeros((1, size, size, 3))
    raft_forward(store, img, img, iters=1)
    return store.params
