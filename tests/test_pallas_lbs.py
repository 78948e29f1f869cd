"""Pallas fused skinning: interpret-mode parity vs the XLA path."""
import numpy as np

import jax
import jax.numpy as jnp

from romp_tpu.ops.pallas_lbs import skinning_pallas, skinning_xla


def test_pallas_skinning_matches_xla():
    rng = np.random.RandomState(0)
    B, J, V = 3, 24, 1000  # V not a tile multiple: exercises padding
    a16 = jnp.asarray(rng.randn(B, 16, J).astype(np.float32))
    w = jnp.asarray(np.abs(rng.randn(V, J)).astype(np.float32))
    vpos = jnp.asarray(rng.randn(B, 3, V).astype(np.float32))
    ref = skinning_xla(a16, w, vpos)
    out = skinning_pallas(a16, w, vpos, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_smpl_forward_uses_fused_skinning():
    """smpl_forward routed through fused_skinning keeps parity (CPU -> XLA
    fallback path; the TPU pallas path shares the interpret-verified kernel)."""
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel, smpl_forward

    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    rng = np.random.RandomState(1)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
    pose = jnp.asarray(rng.randn(2, 72).astype(np.float32) * 0.3)
    v, j = jax.jit(lambda b, p: smpl_forward(smpl, b, p))(betas, pose)
    assert np.isfinite(np.asarray(v)).all()


def test_fused_skinning_custom_vjp_matches_autodiff():
    from romp_tpu.ops.pallas_lbs import fused_skinning, skinning_xla

    rng = np.random.RandomState(2)
    B, J, V = 2, 24, 300
    a16 = jnp.asarray(rng.randn(B, 16, J).astype(np.float32))
    w = jnp.asarray(np.abs(rng.randn(V, J)).astype(np.float32))
    vpos = jnp.asarray(rng.randn(B, 3, V).astype(np.float32))

    def loss_fused(a, v):
        return jnp.sum(fused_skinning(a, w, v) ** 2)

    def loss_xla(a, v):
        return jnp.sum(skinning_xla(a, w, v) ** 2)

    ga1, gv1 = jax.grad(loss_fused, argnums=(0, 1))(a16, vpos)
    ga2, gv2 = jax.grad(loss_xla, argnums=(0, 1))(a16, vpos)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2), atol=1e-3)
