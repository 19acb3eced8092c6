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


_dist_initialized = False


def maybe_init_distributed(cfg=None) -> bool:
    """Runner-entry multi-host bootstrap — every task `main()` calls this
    right after parsing flags, the way the reference calls `hvd.init()` at
    every entry (run_pretrain.py:484).

    Initializes the distributed runtime iff launch topology is present:
    ``--coordinator_address/--num_processes/--process_id`` flags, their
    ``CLIPBERT_{COORDINATOR,NUM_PROCESSES,PROCESS_ID}`` env equivalents, or
    a Cloud TPU pod-slice environment (worker-hostnames metadata), so plain
    single-host runs stay zero-config. Idempotent; returns True when the
    runtime is (already) initialized. MUST run before the first device use
    (jax.devices() / make_mesh) — the backend latches at first touch.
    """
    global _dist_initialized
    if _dist_initialized:
        return True
    import os
    coord = (getattr(cfg, "coordinator_address", None)
             or os.environ.get("CLIPBERT_COORDINATOR") or None)
    nproc = int(getattr(cfg, "num_processes", -1) or -1)
    if nproc < 0:
        nproc = int(os.environ.get("CLIPBERT_NUM_PROCESSES", -1))
    pid = int(getattr(cfg, "process_id", -1)
              if getattr(cfg, "process_id", -1) is not None else -1)
    if pid < 0:
        pid = int(os.environ.get("CLIPBERT_PROCESS_ID", -1))
    # Cloud TPU pod slices publish worker topology in the environment and
    # jax.distributed.initialize() auto-detects everything from it. A
    # SINGLE-worker hostnames list (every TPU VM sets one — including this
    # dev box's sitecustomize, TPU_WORKER_HOSTNAMES=localhost) is not a pod.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    pod_env = (len([w for w in workers.split(",") if w.strip()]) > 1
               or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ)
    if coord is None and not pod_env:
        if nproc > 0 or pid >= 0:
            # partial topology must not silently degrade to N independent
            # single-process runs (duplicated training, every host passing
            # is_main_process()) — same fail-loudly rule as config.validate
            raise ValueError(
                "num_processes/process_id given without a coordinator "
                "address: set --coordinator_address or "
                "CLIPBERT_COORDINATOR (or unset the partial topology)")
        return False
    try:
        init_distributed(coord,
                         nproc if nproc > 0 else None,
                         pid if pid >= 0 else None)
    except Exception:
        if coord is not None:
            raise           # an explicit launch topology must not half-work
        from clipbert_tpu.utils.logger import LOGGER
        LOGGER.warning("pod-slice auto-detect failed; continuing "
                       "single-process", exc_info=True)
        return False
    _dist_initialized = True
    return True


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


def process_local_mesh(mesh: Mesh) -> Mesh:
    """This process's submesh (identity on a single host). Eval work is
    sharded per host by index striding and scored on local devices only —
    embarrassingly parallel, no cross-host collectives in the hot loop."""
    return mesh.local_mesh if jax.process_count() > 1 else mesh


def put_batch_sharded(mesh: Mesh, v):
    """Host batch array -> device array with the leading axis on `data`.

    Single process: plain device_put with the mesh sharding (tail batches
    that don't divide the axis replicate instead). Multi-host: ``v`` is THIS
    host's slice of the global batch — per-host loaders each contribute
    their own rows, the reference's DistributedSampler semantics
    (run_video_retrieval.py:109-121) — and the global array is assembled
    with make_array_from_process_local_data; XLA then inserts the gradient
    psum across hosts inside the jitted step.
    """
    if jax.process_count() == 1:
        if v.shape[0] % mesh.shape[DATA_AXIS] == 0:
            return jax.device_put(v, data_shard(mesh))
        return jax.device_put(v)
    local_rows = mesh.local_mesh.shape[DATA_AXIS]
    if v.shape[0] % local_rows != 0:
        raise ValueError(
            f"per-host batch of {v.shape[0]} rows must divide the "
            f"{local_rows} local devices on the data axis")
    return jax.make_array_from_process_local_data(
        data_shard(mesh), np.asarray(v))


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with the leading axis sharded on `data`.
    Multi-host: each host passes its local slice (see put_batch_sharded)."""
    return jax.tree.map(lambda x: put_batch_sharded(mesh, x), batch)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicate(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    # multi-host: route through host numpy — every host holds the full
    # value, so replication needs no cross-host transfer, but device_put
    # from a committed device array would try one
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), sharding), tree)


def localize_tree(mesh: Mesh, tree):
    """Fully-replicated global tree -> replicas on the local submesh
    (identity on a single host). Validation boundaries use this: each host
    scores its own shard with a local param copy and results merge via
    utils.distributed.all_gather_objects, so eval never mixes global- and
    local-mesh arrays in one jit. Goes via host memory — the arrays are
    fully replicated, so no bytes cross hosts."""
    if jax.process_count() == 1:
        return tree
    lrepl = NamedSharding(mesh.local_mesh, P())
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), lrepl), tree)
