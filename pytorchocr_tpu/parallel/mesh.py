"""Device mesh + sharding helpers.

The reference's entire distributed stack (NCCL process group, DDP gradient
hooks, DistributedSampler, SyncBatchNorm — tools/program.py:505-508,
tools/train.py:62-69) collapses on TPU to:

  * a jax.sharding.Mesh over the chips,
  * NamedSharding(P("data")) on the batch, replicated params,
  * one jitted train step — XLA inserts the gradient all-reduce, and
    BatchNorm statistics are computed over the GLOBAL batch by construction
    (jit semantics are global-view), i.e. SyncBN for free.

The mesh is 2-D ("data", "model") with model=1 by default so tensor
parallelism can be enabled later without an API change (SURVEY.md §2.10).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(model_parallel=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, "devices not divisible by model_parallel"
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_or_replicate(x, mesh):
    """Shard the batch axis when divisible by the data-axis size, otherwise
    replicate (det eval runs batch-size 1)."""
    n_data = mesh.shape["data"]
    if x.shape[0] % n_data == 0:
        return jax.device_put(x, batch_sharding(mesh))
    return jax.device_put(x, replicated_sharding(mesh))


def shard_batch(batch, mesh):
    """Device-put a pytree of host numpy arrays with the batch axis sharded
    over the data mesh axis.  On multi-host, each process contributes its
    local shard (jax.make_array_from_process_local_data)."""
    sharding = batch_sharding(mesh)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
