"""HRNet-W32 backbone, functional NHWC implementation.

Architecture parity with `simple_romp/romp/model.py:246-417`
(HigherResolutionNet): stem (two stride-2 3x3 convs) -> layer1 (4 Bottleneck,
64->256) -> three multi-resolution stages with branch channels
(32,64) / (32,64,128) / (32,64,128,256), BasicBlock x4 per branch per module,
sum-fused with 1x1-conv+nearest-upsample (coarse->fine) and strided-3x3 chains
(fine->coarse). Final stage emits only the full-resolution 32-channel map
(input/4: 128x128 for a 512x512 input).

Parameter names equal the torch state_dict keys under the given prefix, so
released checkpoints convert by layout transform only.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import (
    ParamStore, basic_block, batch_norm, bn_relu, bottleneck, conv2d,
    upsample_nearest,
)

STAGE2_CHANNELS = (32, 64)
STAGE3_CHANNELS = (32, 64, 128)
STAGE4_CHANNELS = (32, 64, 128, 256)
BLOCKS_PER_BRANCH = 4


def _branch(store: ParamStore, prefix: str, x: jax.Array,
            planes: int, blocks: int = BLOCKS_PER_BRANCH) -> jax.Array:
    if getattr(store, "fuse_chains", False):
        from romp_tpu.ops.pallas_fuse import fused_chain_from_store

        return fused_chain_from_store(store, prefix, x, planes, blocks)
    for b in range(blocks):
        x = basic_block(store, f"{prefix}.{b}", x, planes)
    return x


def hr_module(store: ParamStore, prefix: str, xs: List[jax.Array],
              channels: Sequence[int],
              multi_scale_output: bool = True,
              blocks: int = BLOCKS_PER_BRANCH) -> List[jax.Array]:
    """One HighResolutionModule: per-branch blocks + all-to-all fusion."""
    nb = len(channels)
    xs = [_branch(store, f"{prefix}.branches.{j}", xs[j], channels[j],
                  blocks=blocks)
          for j in range(nb)]
    outs = []
    for i in range(nb if multi_scale_output else 1):
        y = None
        for j in range(nb):
            if j == i:
                t = xs[j]
            elif j > i:
                t = conv2d(store, f"{prefix}.fuse_layers.{i}.{j}.0", xs[j],
                           channels[i], 1, 1, padding=0)
                t = batch_norm(store, f"{prefix}.fuse_layers.{i}.{j}.1", t)
                t = upsample_nearest(t, 2 ** (j - i))
            else:
                t = xs[j]
                for k in range(i - j):
                    last = k == i - j - 1
                    out_ch = channels[i] if last else channels[j]
                    t = conv2d(store,
                               f"{prefix}.fuse_layers.{i}.{j}.{k}.0", t,
                               out_ch, 3, 2)
                    t = batch_norm(
                        store, f"{prefix}.fuse_layers.{i}.{j}.{k}.1", t)
                    if not last:
                        t = jax.nn.relu(t)
            y = t if y is None else y + t
        outs.append(jax.nn.relu(y))
    return outs


def _transition(store: ParamStore, prefix: str, ys: List[jax.Array],
                pre_channels: Sequence[int],
                cur_channels: Sequence[int]) -> List[jax.Array]:
    """Stage transition: keep/convert existing branches, grow a new one from
    the last (coarsest) previous branch via a stride-2 3x3 conv.

    Mirrors `_make_transition_layer` + the forward's `y_list[-1]` source for
    new branches (`simple_romp/romp/model.py:254-287,400-414`).
    """
    xs = []
    for i, ch in enumerate(cur_channels):
        if i < len(pre_channels):
            if ch != pre_channels[i]:
                t = conv2d(store, f"{prefix}.{i}.0", ys[i], ch, 3, 1)
                t = bn_relu(store, f"{prefix}.{i}.1", t)
                xs.append(t)
            else:
                xs.append(ys[i])
        else:
            t = conv2d(store, f"{prefix}.{i}.0.0", ys[-1], ch, 3, 2)
            t = bn_relu(store, f"{prefix}.{i}.0.1", t)
            xs.append(t)
    return xs


def _seg_stem(store: ParamStore, xs, prefix: str):
    (x,) = xs
    x = conv2d(store, f"{prefix}.conv1", x, 64, 3, 2)
    x = bn_relu(store, f"{prefix}.bn1", x)
    x = conv2d(store, f"{prefix}.conv2", x, 64, 3, 2)
    x = bn_relu(store, f"{prefix}.bn2", x)
    for b in range(4):
        x = bottleneck(store, f"{prefix}.layer1.{b}", x, 64,
                       downsample=(b == 0))
    return [x]


def _seg_stage2(store: ParamStore, xs, prefix: str,
                blocks: int = BLOCKS_PER_BRANCH):
    xs = _transition(store, f"{prefix}.transition1", xs, (256,),
                     STAGE2_CHANNELS)
    return hr_module(store, f"{prefix}.stage2.0", xs, STAGE2_CHANNELS,
                     blocks=blocks)


def _seg_stage3(store: ParamStore, ys, prefix: str, modules: int = 4,
                blocks: int = BLOCKS_PER_BRANCH):
    xs = _transition(store, f"{prefix}.transition2", ys, STAGE2_CHANNELS,
                     STAGE3_CHANNELS)
    for m in range(modules):
        xs = hr_module(store, f"{prefix}.stage3.{m}", xs, STAGE3_CHANNELS,
                       blocks=blocks)
    return xs


def _seg_stage4(store: ParamStore, xs, prefix: str, modules: int = 3,
                blocks: int = BLOCKS_PER_BRANCH):
    xs = _transition(store, f"{prefix}.transition3", xs, STAGE3_CHANNELS,
                     STAGE4_CHANNELS)
    for m in range(modules):
        xs = hr_module(store, f"{prefix}.stage4.{m}", xs, STAGE4_CHANNELS,
                       multi_scale_output=(m != modules - 1), blocks=blocks)
    return [xs[0]]


def hrnet_w32_segments(prefix: str = "backbone"):
    """The forward split at its natural stage boundaries, as
    fn(store, [arrays]) -> [arrays] segments.

    Training wraps each in `jax.checkpoint` so the backward rematerializes
    one stage at a time: only the small inter-stage boundary tensors are
    stashed across the whole graph instead of every intra-stage activation
    (a whole-net checkpoint re-materializes ALL of them at once during the
    backward, which is why it barely moved peak HBM).
    """
    import functools

    return [functools.partial(f, prefix=prefix)
            for f in (_seg_stem, _seg_stage2, _seg_stage3, _seg_stage4)]


def hrnet_w32_tiny_segments(prefix: str = "backbone"):
    """Depth-reduced HRNet (1 module in stages 3/4 instead of 4/3, 2 blocks
    per branch instead of 4): the SAME branch/transition/fuse structure and
    parameter-name scheme, ~5x fewer convs. For compile-budgeted correctness
    checks (multi-chip dryruns) — NOT checkpoint-compatible with released
    weights."""
    import functools

    return [functools.partial(_seg_stem, prefix=prefix),
            functools.partial(_seg_stage2, prefix=prefix, blocks=2),
            functools.partial(_seg_stage3, prefix=prefix, modules=1,
                              blocks=2),
            functools.partial(_seg_stage4, prefix=prefix, modules=1,
                              blocks=2)]


def hrnet_w32(store: ParamStore, x: jax.Array,
              prefix: str = "backbone") -> jax.Array:
    """HRNet-W32 forward. x: (B, H, W, 3) already normalized to [-1, 1].

    Returns the full-resolution feature map (B, H/4, W/4, 32).
    """
    xs = [x]
    for seg in hrnet_w32_segments(prefix):
        xs = seg(store, xs)
    return xs[0]
