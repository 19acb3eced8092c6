"""Device mesh and sharding helpers.

The reference's only parallelism is Horovod ring-allreduce data parallelism
(`run_pretrain.py:295-301`). TPU-native mapping: a `jax.sharding.Mesh` with a
`data` axis over all chips; the train step is jitted with batch inputs sharded
on `data` and params replicated, so XLA inserts the gradient psum over ICI.
A second optional `model` axis is provisioned for tensor-parallel sharding of
the BERT matmuls (not required for parity — BERT-base + R50 fit on one chip —
but the mesh layout keeps the door open).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (pod slice) runtime init.

    Replaces the reference's `hvd.init()` + MPI launch (run_pretrain.py:484,
    docker OpenMPI stack). On Cloud TPU the arguments auto-detect; elsewhere
    pass coordinator/num_processes/process_id explicitly. Safe to skip on a
    single host.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    With ``model_parallel == 1`` this is pure data parallelism: every chip
    holds a full replica and grads are psum'd over the `data` axis.
    """
    # every runner (train AND inference) builds a mesh: latch the persistent
    # XLA compile cache here so repeat inference runs don't pay the
    # minutes-long full-model recompile (measured: it dominated the
    # end-to-end data-plane benchmark before this)
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_shard(mesh: Mesh) -> NamedSharding:
    """Sharding for batch tensors: leading axis split across `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with the leading axis sharded on `data`."""
    sharding = data_shard(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
