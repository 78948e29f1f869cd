"""Property tests for the XLA deformable convolution."""
import numpy as np

import jax
import jax.numpy as jnp

from romp_tpu.ops.deform_conv import bilinear_sample, deform_conv2d


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_zero_offsets_equal_standard_conv():
    rng = np.random.RandomState(0)
    B, H, W, C, Co, G = 2, 16, 16, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32))
    off = jnp.zeros((B, H, W, G * 2 * 9))
    out = deform_conv2d(x, off, w, deform_groups=G)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_integer_offset_equals_shifted_conv():
    rng = np.random.RandomState(1)
    B, H, W, C, Co, G = 1, 12, 12, 8, 4, 1
    x = np.zeros((B, H, W, C), np.float32)
    x[:, 2:-2, 2:-2] = rng.randn(B, H - 4, W - 4, C)
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32))
    # uniform offset (dy, dx) = (0, 1): equivalent to convolving the input
    # shifted left by one pixel
    off = np.zeros((B, H, W, G * 2 * 9), np.float32)
    off[..., 1::2] = 1.0  # dx channels
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(off), w, deform_groups=G)
    x_shift = np.roll(x, -1, axis=2)
    x_shift[:, :, -1] = 0
    ref = _ref_conv(jnp.asarray(x_shift), w)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-1],
                               np.asarray(ref)[:, 1:-1, 1:-1], atol=1e-4)


def test_bilinear_sample_interpolates():
    x = jnp.arange(16.0).reshape(4, 4, 1)
    v = bilinear_sample(x, jnp.asarray([1.5]), jnp.asarray([1.5]))
    # average of x[1,1], x[1,2], x[2,1], x[2,2] = (5+6+9+10)/4
    np.testing.assert_allclose(np.asarray(v)[0, 0], 7.5)
    # outside -> 0
    v = bilinear_sample(x, jnp.asarray([-5.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(v)[0, 0], 0.0)


def test_deform_groups_independent():
    rng = np.random.RandomState(2)
    B, H, W, C, Co, G = 1, 10, 10, 8, 8, 2
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = np.zeros((3, 3, C, Co), np.float32)
    # kernel reads only channel 0 (group 0) for out 0, channel 7 (group 1)
    # for out 1, center tap only
    w[1, 1, 0, 0] = 1.0
    w[1, 1, 7, 1] = 1.0
    off = np.zeros((B, H, W, G * 2 * 9), np.float32)
    # group 1 shifted by dy=2; group 0 unshifted. Per-group block layout:
    # first 18 channels group 0, next 18 group 1; (dy, dx) interleaved.
    off[..., 18::2] = 2.0
    out = np.asarray(deform_conv2d(x, jnp.asarray(off), jnp.asarray(w),
                                   deform_groups=G))
    xn = np.asarray(x)
    np.testing.assert_allclose(out[0, 3:-3, 3:-3, 0],
                               xn[0, 3:-3, 3:-3, 0], atol=1e-5)
    np.testing.assert_allclose(out[0, 3:-3, 3:-3, 1],
                               xn[0, 5:-1, 3:-3, 7], atol=1e-5)



# ----------------------------------------------------- Pallas deform warp --

def test_pallas_deform_matches_xla():
    """Pallas kernel (interpret mode on CPU) vs the XLA one-hot-matmul
    implementation: identical math, bit-close outputs."""
    from romp_tpu.ops.pallas_deform import deform_conv2d_pallas

    rng = np.random.RandomState(0)
    B, H, W, C, G = 2, 8, 8, 16, 4
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray((rng.randn(B, H, W, G * 2 * 9) * 1.5
                       ).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, 12).astype(np.float32) * 0.1)

    ref = deform_conv2d(x, off, w, deform_groups=G)
    out = deform_conv2d_pallas(x, off, w, deform_groups=G, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_deform_zero_offsets_is_conv():
    """Zero offsets reduce to an ordinary 3x3 conv (zero-padded)."""
    from romp_tpu.ops.pallas_deform import deform_conv2d_pallas

    rng = np.random.RandomState(1)
    B, H, W, C, G = 1, 8, 8, 8, 2
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.zeros((B, H, W, G * 2 * 9), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, 8).astype(np.float32) * 0.1)
    out = deform_conv2d_pallas(x, off, w, deform_groups=G, interpret=True)
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(conv),
                               rtol=1e-4, atol=1e-4)


def test_pallas_deform_fast_grad_matches_xla():
    """deform_conv2d_fast's custom VJP (XLA backward) == grad of the XLA
    forward."""
    from romp_tpu.ops.pallas_deform import deform_conv2d_fast

    rng = np.random.RandomState(2)
    B, H, W, C, G = 1, 4, 4, 8, 2
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray((rng.randn(B, H, W, G * 2 * 9) * 0.7
                       ).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, 4).astype(np.float32) * 0.1)

    f_fast = lambda x, o, w: jnp.sum(deform_conv2d_fast(x, o, w, G) ** 2)
    f_ref = lambda x, o, w: jnp.sum(deform_conv2d(x, o, w, G) ** 2)
    g_fast = jax.grad(f_fast, argnums=(0, 1, 2))(x, off, w)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, off, w)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
