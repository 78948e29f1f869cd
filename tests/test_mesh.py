"""Mesh helpers: single-host semantics + multi-host API single-process
reduction (true multi-process runs only on a real pod; these pin the
contracts the pod path relies on)."""
import numpy as np

import jax
import jax.numpy as jnp

from romp_tpu.parallel.mesh import (
    batch_sharding, initialize_distributed, make_global_mesh, make_mesh,
    replicate_tree, shard_batch, shard_batch_global,
)


def test_make_mesh_1d_and_2d():
    m1 = make_mesh(8)
    assert m1.devices.shape == (8,) and m1.axis_names == ("data",)
    m2 = make_mesh(None, ("dcn", "ici"), devices=jax.devices()[:4])
    assert m2.devices.shape == (2, 2)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == batch_sharding(mesh).spec
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_global_mesh_and_shard_batch_global_single_process():
    initialize_distributed(num_processes=1)     # no-op path
    mesh = make_global_mesh()
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.arange(mesh.devices.size * 2, dtype=np.float32)}
    out = shard_batch_global(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    # the sharded array is usable in a psum-producing jitted reduction
    total = jax.jit(lambda b: jnp.sum(b["x"]))(out)
    assert float(total) == float(batch["x"].sum())


def test_replicate_tree_is_fully_replicated():
    mesh = make_mesh(8)
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate_tree(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated
