"""Shared step builder for the single- vs multi-process mesh equivalence
test (tests/test_mesh_multiprocess.py). Lives in its own module so the
spawned children and the pytest parent run EXACTLY the same code."""
import hashlib

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

GLOBAL_BATCH = 8


def make_step_inputs():
    """Deterministic (state, global_batch, smpl, cfg, prior) — identical in
    every process (threefry keys + seeded numpy)."""
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel
    from romp_tpu.train.priors import GmmPrior
    from romp_tpu.train.train_step import (
        TrainConfig, init_train_state, make_synthetic_batch,
    )

    smpl = SmplModel.from_assets(synthetic_assets(seed=0, num_verts=256))
    cfg = TrainConfig(compute_dtype="float32", backbone="hrnet32_tiny")
    prior = GmmPrior.synthetic(num_gaussians=2, seed=0)
    state = init_train_state(
        init_romp_params(jax.random.PRNGKey(0), input_size=64,
                         backbone="hrnet32_tiny"), cfg)
    batch = make_synthetic_batch(jax.random.PRNGKey(1),
                                 batch_size=GLOBAL_BATCH, input_size=64)
    return state, batch, smpl, cfg, prior


def run_step(state, gbatch, smpl, cfg, prior, mesh):
    """One jitted train step over `mesh`; returns bit-level fingerprints of
    the loss and the updated state (replicated, so every process can read
    and hash them)."""
    from romp_tpu.train.train_step import train_step

    repl = NamedSharding(mesh, P())
    with jax.set_mesh(mesh):
        state = jax.device_put(state, repl)
        prior_r = jax.device_put(prior, repl)
        step = jax.jit(lambda s, b: train_step(s, b, smpl, cfg, prior_r))
        new_state, metrics = step(state, gbatch)
        jax.block_until_ready(new_state)

    loss = np.float32(metrics["total"])
    h = hashlib.sha256()
    pabs = np.float64(0.0)
    psumsq = np.float64(0.0)
    leaves, _ = jax.tree_util.tree_flatten(new_state)
    for leaf in leaves:
        a = np.ascontiguousarray(np.asarray(leaf))
        h.update(a.tobytes())
        a64 = a.astype(np.float64)
        # cancellation-free probes: a signed sum of ~1e6 entries turns
        # per-element ULP noise into 1e-6-level relative drift
        pabs += np.abs(a64).sum()
        psumsq += np.square(a64).sum()
    return {"loss_bits": hex(loss.view(np.uint32).item()),
            "loss": float(loss),
            "params_sha": h.hexdigest(),
            "probe_abssum": float(pabs),
            "probe_sumsq": float(psumsq)}
