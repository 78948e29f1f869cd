"""Rematerialization-policy equivalence and 1-vs-N-device SPMD equivalence.

The remat policy only changes WHAT is stashed vs recomputed — every policy
must produce bit-comparable losses and gradients. Data-parallel SPMD over a
mesh computes the same global batch (global BN stats via psum, summed
grads) as a single device: loss and BN stats must agree tightly; gradients
agree statistically (reduction-order noise is depth-amplified).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow      # minutes of XLA compiles per test

from romp_tpu.models.romp import init_romp_params
from romp_tpu.smpl.assets import synthetic_assets
from romp_tpu.smpl.body_model import SmplModel
from romp_tpu.train.priors import GmmPrior
from romp_tpu.train.train_step import (
    TrainConfig, compute_losses, init_train_state, make_synthetic_batch,
    split_params, train_step,
)

SIZE = 64


@pytest.fixture(scope="module")
def setup():
    params = init_romp_params(jax.random.PRNGKey(0), input_size=SIZE)
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    prior = GmmPrior.synthetic(num_gaussians=2, seed=0)
    batch = make_synthetic_batch(jax.random.PRNGKey(1), batch_size=8,
                                 num_person=2, input_size=SIZE)
    return params, smpl, prior, batch


def _loss_and_grads(params, smpl, prior, batch, **kw):
    cfg = TrainConfig(compute_dtype="float32", **kw)
    trainable, bn_state = split_params(params)

    def loss_fn(tr):
        total, (_, metrics) = compute_losses(tr, bn_state, batch, smpl,
                                             cfg, prior)
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(trainable)
    return float(total), metrics, grads


def test_remat_policies_equivalent(setup):
    params, smpl, prior, batch = setup
    t_none, _, g_none = _loss_and_grads(params, smpl, prior, batch,
                                        remat="none")
    for policy in ("stage", "net"):
        t_p, _, g_p = _loss_and_grads(params, smpl, prior, batch,
                                      remat=policy)
        np.testing.assert_allclose(t_p, t_none, rtol=1e-5)
        for k in g_none:
            np.testing.assert_allclose(np.asarray(g_p[k]),
                                       np.asarray(g_none[k]),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{policy}: {k}")


def test_bf16_activations_train_step_finite(setup):
    params, smpl, prior, batch = setup
    cfg = TrainConfig(compute_dtype="bfloat16", act_dtype="bfloat16",
                      remat="stage")
    state = init_train_state(params, cfg)
    new_state, metrics = train_step(state, batch, smpl, cfg, prior)
    assert np.isfinite(float(metrics["total"]))
    assert float(metrics["grads_finite"]) == 1.0
    # parameters actually moved
    k = next(iter(new_state.trainable))
    assert not np.allclose(np.asarray(new_state.trainable[k]),
                           np.asarray(state.trainable[k]))


def test_train_step_single_vs_eight_devices(setup):
    """The SPMD loss/gradients on an 8-device mesh must match the 1-device
    result: same global BN batch stats (psum), same summed gradients.

    Compared at the loss/gradient level, not post-Adam params: a fresh Adam
    step maps any gradient to a +-lr-sized update (m/sqrt(v) is scale
    free), so benign reduction-order rounding on near-zero grads flips
    update signs and params are not a meaningful comparison target.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from romp_tpu.parallel.mesh import make_mesh, shard_batch

    params, smpl, prior, batch = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(compute_dtype="float32", remat="stage")
    trainable, bn_state = split_params(params)

    def loss_fn(tr, bn, bb):
        total, (bn_updates, metrics) = compute_losses(tr, bn, bb, smpl,
                                                      cfg, prior)
        return total, bn_updates

    results = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        with jax.set_mesh(mesh):
            repl = NamedSharding(mesh, P())
            tr = jax.device_put(trainable, repl)
            bn = jax.device_put(bn_state, repl)
            b = shard_batch(batch, mesh)
            fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
            (total, bn_upd), grads = fn(tr, bn, b)
            jax.block_until_ready(grads)
        results[n] = (float(total), jax.device_get(bn_upd),
                      jax.device_get(grads))

    t1, bn1, g1 = results[1]
    t8, bn8, g8 = results[8]
    np.testing.assert_allclose(t8, t1, rtol=2e-4)
    for k in bn1:
        np.testing.assert_allclose(bn8[k], bn1[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)
    # Gradients: reduction-order rounding (psum tree vs flat sum) injects
    # ~1e-7 noise that the ~100-layer graph amplifies exponentially (grads
    # traverse the whole depth twice), so gradient agreement is asserted
    # statistically, not elementwise.
    n1 = np.sqrt(sum(np.sum(np.square(np.asarray(v, np.float64)))
                     for v in g1.values()))
    n8 = np.sqrt(sum(np.sum(np.square(np.asarray(v, np.float64)))
                     for v in g8.values()))
    np.testing.assert_allclose(n8, n1, rtol=1e-2)
    # Per-tensor relative diffs, with the denominator floored by the global
    # gradient scale: tensors whose TRUE gradient is ~0 (a conv bias
    # immediately followed by BatchNorm gets exactly-cancelled gradients,
    # |g| ~ 1e-5 of pure float noise) would otherwise compare noise against
    # noise and report O(1) "differences".
    rels = {}
    for k in g1:
        a, b_ = np.asarray(g1[k], np.float64), np.asarray(g8[k], np.float64)
        rels[k] = np.linalg.norm(a - b_) / max(np.linalg.norm(a),
                                               1e-6 * n1)
    # No tensor class is immune to the chaos (even head-weight grads
    # depend on forward activations that traversed the full depth), so the
    # assertions are aggregate: median tensors track closely, the worst is
    # bounded, and the global norm matches tightly.
    assert np.median(list(rels.values())) < 5e-2, np.median(
        list(rels.values()))
    assert max(rels.values()) < 0.1, max(rels.items(), key=lambda kv: kv[1])
