"""BEV training step: runs, descends, updates BN stats, finite grads."""
import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_bev_train_step_descends():
    from romp_tpu.models.bev import init_bev_params
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel
    from romp_tpu.train.bev_train_step import (
        BevTrainConfig, bev_init_train_state, bev_train_step,
        make_bev_synthetic_batch,
    )
    from romp_tpu.train.train_step import TrainConfig

    cfg = BevTrainConfig(base=TrainConfig(compute_dtype="float32"),
                         input_size=128)
    params = init_bev_params(jax.random.PRNGKey(0), input_size=128)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    state = bev_init_train_state(params, cfg)
    batch = make_bev_synthetic_batch(jax.random.PRNGKey(1), batch_size=2,
                                     num_person=2, input_size=128)
    step = jax.jit(lambda s, b: bev_train_step(s, b, adult, baby, cfg))
    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["total"]))
    assert float(m1["centermap3d"]) > 0
    assert float(m1["rdepth"]) >= 0
    s = s1
    # Descent is non-monotonic in the first few Adam steps (warmup noise on
    # a clamped objective; measured 3391 -> ~3500 -> 2460 over 12 steps), so
    # assert over a longer window and on the best-so-far.
    totals = []
    for _ in range(11):
        s, m = step(s, batch)
        totals.append(float(m["total"]))
    assert min(totals) < float(m1["total"])
    assert totals[-1] < float(m1["total"])
    k = next(k for k in state.bn_state if k.endswith("running_mean"))
    assert not np.allclose(np.asarray(state.bn_state[k]),
                           np.asarray(s.bn_state[k]))
