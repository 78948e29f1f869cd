"""Fused BasicBlock-chain Pallas kernel vs the layer-library math.

Three parities:
1. kernel (interpret mode) vs `reference_basic_chain` (the exact math the
   kernel implements, as XLA convs);
2. `reference_basic_chain` vs the real `models/layers.py` BasicBlock path
   with inference BatchNorm (proves the folded scale/shift + packed-weight
   transform is the same function);
3. full HRNet forward with `fuse_chains=True` (interpret) vs the unfused
   mixed path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import ParamStore, basic_block
from romp_tpu.ops.pallas_fuse import (
    fused_basic_chain, pack_chain_weights, reference_basic_chain,
)


def _chain_params(rng, C, blocks, prefix="br"):
    params = {}
    for n in range(blocks):
        for conv, bn in ((f"{prefix}.{n}.conv1", f"{prefix}.{n}.bn1"),
                         (f"{prefix}.{n}.conv2", f"{prefix}.{n}.bn2")):
            params[f"{conv}.weight"] = jnp.asarray(
                rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
            params[f"{bn}.weight"] = jnp.asarray(
                1.0 + 0.1 * rng.randn(C).astype(np.float32))
            params[f"{bn}.bias"] = jnp.asarray(
                0.1 * rng.randn(C).astype(np.float32))
            params[f"{bn}.running_mean"] = jnp.asarray(
                0.1 * rng.randn(C).astype(np.float32))
            params[f"{bn}.running_var"] = jnp.asarray(
                (1.0 + 0.2 * rng.rand(C)).astype(np.float32))
    return params


def _layers_chain(params, x, C, blocks, prefix="br"):
    store = ParamStore(params, compute_dtype=jnp.bfloat16,
                       act_dtype=jnp.float32)
    for n in range(blocks):
        x = basic_block(store, f"{prefix}.{n}", x, C)
    return x


@pytest.mark.parametrize("C,H", [(32, 32), (64, 16)])
def test_kernel_matches_reference(C, H):
    rng = np.random.RandomState(0)
    blocks = 2
    x = jnp.asarray(rng.randn(2, H, H, C).astype(np.float32))
    w = jnp.asarray(rng.randn(blocks, 2, 3 * C, 3 * C)
                    .astype(np.float32) * 0.05).astype(jnp.bfloat16)
    sc = jnp.asarray(1.0 + 0.1 * rng.randn(blocks, 2, C).astype(np.float32))
    sh = jnp.asarray(0.1 * rng.randn(blocks, 2, C).astype(np.float32))
    y_k = fused_basic_chain(x, w, sc, sh, blocks, interpret=True)
    y_r = reference_basic_chain(x, w, sc, sh, blocks)
    scale = float(jnp.max(jnp.abs(y_r))) + 1e-9
    assert float(jnp.max(jnp.abs(y_k - y_r))) / scale < 5e-4


def test_packed_weights_match_layer_library():
    rng = np.random.RandomState(1)
    C, blocks = 32, 3
    params = _chain_params(rng, C, blocks)
    x = jnp.asarray(rng.randn(2, 16, 16, C).astype(np.float32))
    y_layers = _layers_chain(params, x, C, blocks)
    w, sc, sh = pack_chain_weights(params, "br", blocks)
    y_ref = reference_basic_chain(x, w, sc, sh, blocks)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_layers),
                               rtol=0, atol=2e-2)  # bf16-scale rounding
    # relative error must be at bf16 rounding scale, not structural
    scale = float(jnp.max(jnp.abs(y_layers))) + 1e-9
    assert float(jnp.max(jnp.abs(y_ref - y_layers))) / scale < 2e-3


def test_hrnet_fused_forward_matches_unfused():
    from romp_tpu.models.hrnet import hr_module

    rng = np.random.RandomState(2)
    C2 = (16, 32)
    params = {}
    # init a tiny 2-branch module via init mode
    st = ParamStore(rng=jax.random.PRNGKey(0))
    xs0 = [jnp.zeros((1, 16, 16, 16)), jnp.zeros((1, 8, 8, 32))]
    hr_module(st, "m", xs0, C2, blocks=2)
    params = st.params
    xs = [jnp.asarray(rng.randn(2, 16, 16, 16).astype(np.float32)),
          jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))]

    base = hr_module(ParamStore(params, compute_dtype=jnp.bfloat16,
                                act_dtype=jnp.float32),
                     "m", xs, C2, blocks=2)

    # interpret-mode pallas inside the fused store
    import romp_tpu.ops.pallas_fuse as pf
    orig = pf.fused_basic_chain

    def interp(x, w, sc, sh, blocks, interpret=False):
        return orig(x, w, sc, sh, blocks, interpret=True)

    pf.fused_basic_chain = interp
    try:
        fused = hr_module(ParamStore(params, compute_dtype=jnp.bfloat16,
                                     act_dtype=jnp.float32,
                                     fuse_chains=True),
                          "m", xs, C2, blocks=2)
    finally:
        pf.fused_basic_chain = orig
    for a, b in zip(base, fused):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-3
