"""TRACE training step + video loss tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.train.video_losses import (
    motion_offset3d_loss, quaternion_angle_loss,
    temporal_shape_consistency_loss, world_trans_consistency_loss,
)


def test_world_trans_consistency_invariant_to_origin():
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    valid = jnp.ones((2, 5), bool)
    shifted = gt + jnp.asarray([10.0, -5.0, 3.0])  # global offset: no error
    assert float(world_trans_consistency_loss(shifted, gt, valid)) < 1e-5
    noisy = gt + jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    assert float(world_trans_consistency_loss(noisy, gt, valid)) > 0.1


def test_quaternion_angle_loss_zero_for_equal_rotations():
    rng = np.random.RandomState(1)
    aa = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    w = jnp.ones(4)
    assert float(quaternion_angle_loss(aa, aa, w)) < 1e-2
    assert float(quaternion_angle_loss(aa, -aa, w)) > 0.5


def test_temporal_shape_consistency():
    betas = jnp.tile(jnp.arange(11.0)[None, None], (1, 4, 1))
    valid = jnp.ones((1, 4), bool)
    assert float(temporal_shape_consistency_loss(betas, valid)) < 1e-5
    varying = betas.at[0, 2].add(1.0)
    assert float(temporal_shape_consistency_loss(varying, valid)) > 0.1


def test_motion_offset3d_loss_exact_offsets():
    rng = np.random.RandomState(2)
    traj = jnp.asarray(np.cumsum(rng.randn(2, 5, 3), axis=1)
                       .astype(np.float32))
    offsets = jnp.concatenate(
        [jnp.zeros((2, 1, 3)), traj[:, 1:] - traj[:, :-1]], axis=1)
    valid = jnp.ones((2, 5), bool)
    assert float(motion_offset3d_loss(offsets, traj, valid)) < 1e-6


@pytest.mark.slow
def test_trace_train_step_descends():
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.train.trace_train_step import (
        TraceTrainConfig, make_trace_synthetic_batch, trace_init_train_state,
        trace_train_step,
    )

    cfg = TraceTrainConfig()
    params = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
    state = trace_init_train_state(params, cfg)
    batch = make_trace_synthetic_batch(jax.random.PRNGKey(1))
    step = jax.jit(lambda s, b: trace_train_step(s, b, cfg))
    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["total"])), dict(m1)
    s = s1
    for _ in range(3):
        s, m = step(s, batch)
    assert float(m["total"]) < float(m1["total"])
