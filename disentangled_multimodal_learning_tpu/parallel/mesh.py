"""Device mesh + data-parallel sharding.

TPU-native replacement for the reference's distributed runtime
(reference main.py:27-29,111-125,183-207 and train_test.py:223-228):

| reference (torch/NCCL)                 | here (JAX/XLA)                      |
|----------------------------------------|-------------------------------------|
| mp.spawn, 1 process per GPU            | single controller                   |
| dist.init_process_group("nccl")        | jax.distributed.initialize (multi-  |
|                                        | host only) + Mesh('data')           |
| DistributedSampler per-rank shards     | global batch sharded on axis 'data' |
| DDP grad hooks + manual all_reduce     | XLA grad psum inserted by jit       |
| GatherLayer (activation all_gather)    | losses see the global batch already |
| SyncBatchNorm (threads/queues)         | BN stats over the global batch      |

The mesh is 1-D over all local devices.  Model parameters are replicated
(the models are ~1M params; pure data parallelism is the right point in the
sharding space — TP/PP hooks can extend the mesh later without API changes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(arrays: dict, mesh: Mesh, batch_axis: int = 0) -> dict:
    """device_put a dict of host arrays with the batch axis sharded.

    The global batch size must divide the mesh size (the loader guarantees
    batch_size % n_devices == 0 via drop_last/pad_final).  ``batch_axis=1``
    shards stacked multi-step batches ``[K, B, ...]`` (scan_steps > 1)."""
    spec = P(*([None] * batch_axis + ["data"]))
    sh = NamedSharding(mesh, spec)
    return {k: jax.device_put(v, sh) for k, v in arrays.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
