"""Device mesh + sharding helpers — the SPMD replacement for the reference's
DataParallel/DDP stack (SURVEY.md §2.5).

One mesh, one jit: the batch axis is sharded over "data"; parameters are
replicated (this model family is ~30M params — far below per-chip HBM, so
data parallelism over ICI is the right decomposition; gradient reduction and
cross-replica BatchNorm statistics fall out of SPMD automatically — XLA
inserts the psums). The helpers also expose a "model" axis so wider layouts
(e.g. fsdp-style sharding of the optimizer state) can be layered on without
touching call sites.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """1D data-parallel mesh by default; pass axis_names=("data", "model")
    with a 2D device count split for hybrid layouts."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:int(n_devices)]
    if len(axis_names) == 1:
        arr = np.asarray(devs)
    else:
        per = int(round(len(devs) ** (1.0 / len(axis_names))))
        arr = np.asarray(devs).reshape((per,) * len(axis_names))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in a batch pytree with its leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# ------------------------------------------------------------ multi-host --

def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Join a multi-host SPMD job (the reference's torch.distributed init,
    `romp/base.py:48-55`, NCCL -> here: one jax.distributed runtime, DCN
    between hosts, ICI within a slice). On TPU pods the three arguments are
    auto-detected from the environment; pass them explicitly elsewhere.
    No-op when already initialized or single-process."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as exc:           # already initialized
        if "already" not in str(exc).lower():
            raise


def make_global_mesh(axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over ALL global devices (call after initialize_distributed).
    Device order keeps each process's devices contiguous, so a batch axis
    sharded over "data" puts each host's shard on its own local chips —
    batch parallelism rides ICI within a slice and only gradient psums
    cross DCN."""
    return make_mesh(None, axis_names, devices=jax.devices())


def shard_batch_global(batch, mesh: Mesh, axis: str = "data"):
    """Multi-host batch placement: each process supplies ITS OWN slice of
    the global batch (local arrays of size global_batch / num_processes);
    the result is a global jax.Array sharded over `axis`. Reduces to
    shard_batch in a single-process job."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
