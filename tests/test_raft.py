"""RAFT parity vs the vendored torch implementation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import ParamStore
from romp_tpu.models.raft import (
    filter_raft_state_dict, init_raft_params, raft_forward,
)
from romp_tpu.utils.checkpoint import convert_torch_state_dict
from tests._oracle import ref_package

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_raft():
    imp = ref_package("refraftroot", "simple_romp/trace2/models")
    mod = imp("raft.raft")
    torch.manual_seed(0)
    return mod.RAFT(small=False).eval()


@pytest.mark.slow
def test_raft_parity(ref_raft):
    sd = ref_raft.state_dict()
    sd = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    params = filter_raft_state_dict({
        k: jnp.asarray(v) for k, v in convert_torch_state_dict(sd).items()})
    ours_init = init_raft_params(jax.random.PRNGKey(0))
    from romp_tpu.utils.checkpoint import check_params_match

    check_params_match(params, ours_init)

    rng = np.random.RandomState(0)
    im1 = rng.rand(1, 128, 128, 3).astype(np.float32) * 255.0
    im2 = np.roll(im1, 2, axis=2)  # horizontal shift

    with torch.no_grad():
        t1 = torch.from_numpy(im1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(im2.transpose(0, 3, 1, 2))
        flow_low_ref, flow_up_ref = ref_raft(t1, t2, iters=6, test_mode=True)

    store = ParamStore(params)
    flow_low, flow_up = jax.jit(
        lambda a, b: raft_forward(store, a, b, iters=6))(
        jnp.asarray(im1), jnp.asarray(im2))

    np.testing.assert_allclose(
        np.asarray(flow_low), flow_low_ref.numpy().transpose(0, 2, 3, 1),
        atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(flow_up), flow_up_ref.numpy().transpose(0, 2, 3, 1),
        atol=5e-3)


def test_flow_fn_half_res_units():
    """flow_input_size rescales flow vectors back to 512-equivalent units:
    a rigid horizontal shift must read out the same (within resampling
    tolerance) at full and half flow resolution."""
    from romp_tpu.models.raft import make_trace_flow_fn

    params = init_raft_params(jax.random.PRNGKey(0), size=64)
    rng = np.random.RandomState(0)
    # smooth image so bilinear downsampling preserves structure
    base = rng.rand(1, 16, 16, 3).astype(np.float32)
    im1 = np.kron(base, np.ones((1, 8, 8, 1), np.float32)) * 255.0  # 128^2
    im2 = np.roll(im1, 8, axis=2)

    full = make_trace_flow_fn(params, iters=4, out_size=32,
                              flow_input_size=128)
    half = make_trace_flow_fn(params, iters=4, out_size=32,
                              flow_input_size=64)
    f_full = np.asarray(full(jnp.asarray(im1), jnp.asarray(im2)))
    f_half = np.asarray(half(jnp.asarray(im1), jnp.asarray(im2)))
    assert f_full.shape == f_half.shape == (1, 32, 32, 2)
    assert np.isfinite(f_half).all()
    # random-init RAFT gives arbitrary flow values; the unit-consistency
    # check is that the half-res path's magnitudes live on the same scale
    # (the *4 rescale is what's under test, not flow quality)
    s_full = np.abs(f_full).mean()
    s_half = np.abs(f_half).mean()
    assert s_half < 50 * s_full + 1e-3 and s_full < 50 * s_half + 1e-3


def test_flow_fn_bf16_default_mode():
    """bfloat16 flow (the CLI parity default — the reference runs RAFT
    under fp16 autocast, raft.py:93-104) produces finite flow on the same
    magnitude scale as f32."""
    from romp_tpu.models.raft import make_trace_flow_fn

    params = init_raft_params(jax.random.PRNGKey(0), size=64)
    rng = np.random.RandomState(0)
    base = rng.rand(1, 16, 16, 3).astype(np.float32)
    im1 = np.kron(base, np.ones((1, 8, 8, 1), np.float32)) * 255.0
    im2 = np.roll(im1, 8, axis=2)

    f32 = make_trace_flow_fn(params, iters=4, out_size=32,
                             flow_input_size=128)
    bf16 = make_trace_flow_fn(params, iters=4, out_size=32,
                              flow_input_size=128,
                              compute_dtype="bfloat16")
    a = np.asarray(f32(jnp.asarray(im1), jnp.asarray(im2)))
    b = np.asarray(bf16(jnp.asarray(im1), jnp.asarray(im2)))
    assert b.shape == a.shape and b.dtype == np.float32
    assert np.isfinite(b).all()
    sa, sb = np.abs(a).mean(), np.abs(b).mean()
    assert sb < 50 * sa + 1e-3 and sa < 50 * sb + 1e-3

    # opt-in bf16 correlation pyramid stays finite and on-scale too
    bf16c = make_trace_flow_fn(params, iters=4, out_size=32,
                               flow_input_size=128,
                               compute_dtype="bfloat16",
                               corr_dtype="bfloat16")
    c = np.asarray(bf16c(jnp.asarray(im1), jnp.asarray(im2)))
    assert np.isfinite(c).all()
    sc = np.abs(c).mean()
    assert sc < 50 * sa + 1e-3 and sa < 50 * sc + 1e-3


def test_corr_lookup_rowgather_matches_onehot():
    """The row-gather formulation is an exact reformulation of the one-hot
    window contraction: same taps, same zero padding out of range, same
    shared-fraction bilinear blend. Checked on coords spanning in-range,
    boundary, and far out-of-range positions, for f32 and bf16 pyramids."""
    from romp_tpu.models.raft import (
        build_corr_pyramid, corr_lookup_onehot, corr_lookup_rowgather,
    )

    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 16
    f1 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32))
    f2 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32))
    # coords: in-range, exactly-on-border, and far outside (zero padding)
    coords = (rng.rand(B, H, W, 2).astype(np.float32) * 3.0 - 1.0) \
        * np.asarray([W, H], np.float32)

    for dt in (jnp.float32, jnp.bfloat16):
        pyr = build_corr_pyramid(f1, f2, out_dtype=dt)
        a = np.asarray(corr_lookup_onehot(pyr, jnp.asarray(coords)))
        b = np.asarray(corr_lookup_rowgather(pyr, jnp.asarray(coords)))
        assert a.shape == b.shape == (B, H, W, 4 * 81)
        np.testing.assert_allclose(b, a, atol=1e-6 if dt == jnp.float32
                                   else 1e-2)


def test_corr_lookup_packed_matches_onehot():
    """The packed formulation (levels concatenated along the contraction
    axis, bilinear fractions folded into tent selection weights) computes
    the same taps + blend as the one-hot form: same zero padding out of
    range, same channel order. Tent weights change the fp summation order,
    so f32 parity is to tolerance rather than exact."""
    from romp_tpu.models.raft import (
        build_corr_pyramid, corr_lookup_onehot, corr_lookup_packed,
        pack_corr_pyramid,
    )

    rng = np.random.RandomState(1)
    B, H, W = 2, 16, 16
    f1 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32))
    f2 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32))
    coords = (rng.rand(B, H, W, 2).astype(np.float32) * 3.0 - 1.0) \
        * np.asarray([W, H], np.float32)
    # include exact-integer positions (scan init: coords1 == integer grid)
    coords[0, :4] = np.round(coords[0, :4])

    for dt, atol in ((jnp.float32, 1e-4), (jnp.bfloat16, 3e-2)):
        pyr = build_corr_pyramid(f1, f2, out_dtype=dt)
        packed = pack_corr_pyramid(pyr)
        a = np.asarray(corr_lookup_onehot(pyr, jnp.asarray(coords)))
        b = np.asarray(corr_lookup_packed(packed, jnp.asarray(coords)))
        assert a.shape == b.shape == (B, H, W, 4 * 81)
        np.testing.assert_allclose(b, a, atol=atol)


def test_flow_seq_fn_matches_pairwise():
    """sequence=True (fnet shared over the T+1 unique frames) must produce
    the same flows as the pairwise fn on the shifted-pair inputs the
    pipeline builds — same math, just deduplicated encoder passes."""
    from romp_tpu.models.raft import make_trace_flow_fn

    params = init_raft_params(jax.random.PRNGKey(0), size=64)
    rng = np.random.RandomState(3)
    seq = (rng.rand(5, 64, 64, 3) * 255.0).astype(np.float32)  # T+1 = 5

    pair = make_trace_flow_fn(params, iters=3, out_size=16,
                              flow_input_size=64)
    seqf = make_trace_flow_fn(params, iters=3, out_size=16,
                              flow_input_size=64, sequence=True)
    assert getattr(seqf, "takes_sequence", False)

    a = np.asarray(pair(jnp.asarray(seq[:-1]), jnp.asarray(seq[1:])))
    b = np.asarray(seqf(jnp.asarray(seq)))
    assert b.shape == a.shape == (4, 16, 16, 2)
    np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)
